"""Multi-host serving router: DP request forwarding across host engines.

The TPU-native multi-host topology (SURVEY §7 M5; ref: the reference has
no multi-node path — this is the part of the design the TPU pod makes
natural): every host runs its OWN engine loop + OpenAI frontend over its
local chips (TP/EP shard inside the host's ICI domain, so weight
collectives never cross DCN), and a thin stateless router spreads
requests host-major over the 'data' axis.

Scheduling stays per-host — there is no global lock-step scheduler to
stall on DCN latency; the router balances by live queue depth (each
worker's /health exposes running+waiting), which is exactly the
continuous-batching load signal.

Usage:
  # on each host:           ferrum serve <model> --port 8000
  # on the front (any box): ferrum route --workers http://h0:8000,http://h1:8000

The router forwards any /v1/* POST (chat, completions, embeddings) and
GETs for /v1/models; SSE streams pass through unbuffered. Worker
failures mark the worker unhealthy for a cooldown and retry the request
on the next one (at-most-once per worker).
"""

from __future__ import annotations

import asyncio
import json
import time
from typing import Dict, List, Optional

import aiohttp
from aiohttp import web


class WorkerState:
    def __init__(self, url: str):
        self.url = url.rstrip("/")
        self.inflight = 0
        self.queue_depth = 0
        self.healthy = True
        self.unhealthy_until = 0.0

    def usable(self) -> bool:
        return self.healthy or time.monotonic() >= self.unhealthy_until

    def mark_failed(self, cooldown: float = 5.0) -> None:
        self.healthy = False
        self.unhealthy_until = time.monotonic() + cooldown


class DpRouter:
    """Least-loaded request router over N worker engines."""

    def __init__(self, workers: List[str], health_interval: float = 2.0):
        if not workers:
            raise ValueError("at least one worker url required")
        self.workers = [WorkerState(u) for u in workers]
        self.health_interval = health_interval
        self._session: Optional[aiohttp.ClientSession] = None
        self._health_task = None

    # -- worker selection -------------------------------------------------
    def pick(self) -> List[WorkerState]:
        """Workers in preference order: healthy first, then by live
        load (in-flight through this router + last-seen queue depth)."""
        avail = [w for w in self.workers if w.usable()]
        if not avail:
            avail = list(self.workers)
        return sorted(avail, key=lambda w: (w.inflight + w.queue_depth,
                                            not w.healthy))

    async def _poll_health(self) -> None:
        while True:
            for w in self.workers:
                try:
                    async with self._session.get(
                            f"{w.url}/health",
                            timeout=aiohttp.ClientTimeout(total=2)) as r:
                        if r.status == 200:
                            d = await r.json()
                            w.queue_depth = int(d.get("running", 0)) \
                                + int(d.get("waiting", 0))
                            w.healthy = True
                        else:
                            w.mark_failed()
                except Exception:
                    w.mark_failed()
            await asyncio.sleep(self.health_interval)

    # -- http app ---------------------------------------------------------
    def make_app(self) -> web.Application:
        app = web.Application()
        app.router.add_route("*", "/{tail:v1/.*}", self.proxy)
        app.router.add_get("/health", self.health)
        app.router.add_get("/metrics", self.metrics)
        app.on_startup.append(self._startup)
        app.on_cleanup.append(self._cleanup)
        return app

    async def _startup(self, app) -> None:
        self._session = aiohttp.ClientSession()
        self._health_task = asyncio.create_task(self._poll_health())

    async def _cleanup(self, app) -> None:
        if self._health_task:
            self._health_task.cancel()
            try:
                await self._health_task
            except asyncio.CancelledError:
                pass
            self._health_task = None
        if self._session:
            await self._session.close()
            self._session = None

    async def health(self, request: web.Request) -> web.Response:
        return web.json_response({
            "status": "ok",
            "role": "router",
            "workers": [{
                "url": w.url, "healthy": w.healthy,
                "inflight": w.inflight, "queue_depth": w.queue_depth,
            } for w in self.workers],
        })

    async def metrics(self, request: web.Request) -> web.Response:
        """Aggregate workers' Prometheus expositions (prefixed)."""
        parts = []
        for i, w in enumerate(self.workers):
            try:
                async with self._session.get(
                        f"{w.url}/metrics",
                        timeout=aiohttp.ClientTimeout(total=5)) as r:
                    body = await r.text()
                parts.append(f"# worker {i} {w.url}\n{body}")
            except Exception as e:  # noqa: BLE001
                parts.append(f"# worker {i} {w.url} unreachable: {e!r}")
        return web.Response(text="\n".join(parts),
                            content_type="text/plain")

    async def proxy(self, request: web.Request) -> web.StreamResponse:
        body = await request.read()
        last_err = None
        for w in self.pick():
            w.inflight += 1
            try:
                return await self._forward(request, w, body)
            except (aiohttp.ClientError, asyncio.TimeoutError) as e:
                last_err = e
                w.mark_failed()
            finally:
                w.inflight -= 1
        return web.json_response(
            {"error": {"message": f"all workers unreachable: {last_err!r}",
                       "type": "service_unavailable", "param": None,
                       "code": None}},
            status=503)

    async def _forward(self, request: web.Request, w: WorkerState,
                       body: bytes) -> web.StreamResponse:
        url = f"{w.url}/{request.match_info['tail']}"
        headers = {k: v for k, v in request.headers.items()
                   if k.lower() not in ("host", "content-length")}
        async with self._session.request(
                request.method, url, data=body, headers=headers,
                timeout=aiohttp.ClientTimeout(total=None, sock_connect=5)
        ) as upstream:
            ctype = upstream.headers.get("Content-Type", "")
            if "text/event-stream" in ctype:
                resp = web.StreamResponse(status=upstream.status, headers={
                    "Content-Type": ctype, "Cache-Control": "no-cache"})
                await resp.prepare(request)
                async for chunk in upstream.content.iter_any():
                    await resp.write(chunk)
                await resp.write_eof()
                return resp
            data = await upstream.read()
            return web.Response(
                body=data, status=upstream.status,
                content_type=ctype.split(";")[0] or "application/json")


def run_router(workers: List[str], host: str = "0.0.0.0",
               port: int = 9000) -> None:
    router = DpRouter(workers)
    web.run_app(router.make_app(), host=host, port=port,
                print=lambda *a: None)
