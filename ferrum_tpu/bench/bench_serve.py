"""HTTP-level serving benchmark (vLLM `bench serve`-compatible workload).

TPU-native analog of the reference's bench-serve command
(crates/ferrum-cli/src/commands/bench_serve.rs): random prompts against
a live /v1/completions endpoint, closed-loop concurrency cells,
per-request TTFT/TPOT/ITL/E2E from SSE timing, aggregated with the
locked schema (mean/stddev/ci95 + env hash)."""

from __future__ import annotations

import asyncio
import json
import string
import time
from typing import Dict, List, Tuple

import aiohttp
import numpy as np

from .bench_engine import ScalarStats, _pct, env_hash


def _random_prompt(rng: np.random.Generator, approx_tokens: int) -> str:
    words = ["the", "alpha", "stream", "rock", "compute", "seven", "blue",
             "matrix", "quick", "delta", "cloud", "zero", "prime", "flux"]
    return " ".join(rng.choice(words) for _ in range(approx_tokens))


async def _one_request(session, base_url, model, prompt, output_len):
    t0 = time.monotonic()
    ttft = None
    last = None
    itls = []
    n_tokens = 0
    body = {"model": model, "prompt": prompt, "max_tokens": output_len,
            "stream": True, "temperature": 0.0, "ignore_eos": True}
    async with session.post(f"{base_url}/v1/completions", json=body) as resp:
        resp.raise_for_status()
        async for raw in resp.content:
            line = raw.decode().strip()
            if not line.startswith("data:"):
                continue
            payload = line[5:].strip()
            if payload == "[DONE]":
                break
            now = time.monotonic()
            obj = json.loads(payload)
            choices = obj.get("choices") or []
            if choices and choices[0].get("text"):
                n_tokens += 1
                if ttft is None:
                    ttft = now - t0
                elif last is not None:
                    itls.append(now - last)
                last = now
    return {"ttft": ttft or 0.0, "e2e": time.monotonic() - t0,
            "itls": itls, "tokens": n_tokens}


async def _run_cell(base_url, model, concurrency, num_requests, input_len,
                    output_len, seed=0):
    rng = np.random.default_rng(seed)
    prompts = [_random_prompt(rng, input_len) for _ in range(num_requests)]
    results: List[Dict] = []
    errors: List[str] = []
    idx = {"i": 0}
    t_start = time.monotonic()

    async with aiohttp.ClientSession(
            timeout=aiohttp.ClientTimeout(total=3600)) as session:
        async def worker():
            while True:
                i = idx["i"]
                if i >= num_requests:
                    return
                idx["i"] += 1
                try:
                    results.append(await _one_request(
                        session, base_url, model, prompts[i], output_len))
                except Exception as e:  # noqa: BLE001
                    errors.append(repr(e))

        await asyncio.gather(*[worker() for _ in range(concurrency)])
    wall = time.monotonic() - t_start
    total = sum(r["tokens"] for r in results)
    tpots = [(r["e2e"] - r["ttft"]) / max(r["tokens"] - 1, 1)
             for r in results]
    return {
        "concurrency": concurrency,
        "completed": len(results),
        "requested": num_requests,
        "errors": len(errors),
        "error_samples": errors[:3],
        "wall_s": wall,
        "output_tok_s": total / wall if wall else 0.0,
        "ttft_p50_ms": _pct([r["ttft"] for r in results], 50) * 1e3,
        "tpot_p50_ms": _pct(tpots, 50) * 1e3,
        "itl_p95_ms": _pct([x for r in results for x in r["itls"]], 95) * 1e3,
        "e2e_p50_ms": _pct([r["e2e"] for r in results], 50) * 1e3,
    }


def run_bench_serve(base_url: str, model: str,
                    concurrencies: Tuple[int, ...] = (1, 4, 16, 32),
                    num_requests: int = 64, input_len: int = 256,
                    output_len: int = 128, n_repeats: int = 1) -> Dict:
    cells = []
    for c in concurrencies:
        reps = [asyncio.run(_run_cell(base_url, model, c, num_requests,
                                      input_len, output_len, seed=r))
                for r in range(n_repeats)]
        tputs = [r["output_tok_s"] for r in reps]
        cell = dict(reps[-1])
        cell["output_tok_s_stats"] = ScalarStats.of(tputs).__dict__
        cells.append(cell)
    return {
        "schema": "ferrum-tpu-bench-serve/v1",
        "base_url": base_url,
        "model": model,
        "workload": {"input_len": input_len, "output_len": output_len,
                     "n_repeats": n_repeats, "mode": "closed-loop"},
        "env_hash": env_hash({"model": model, "lane": "bench-serve"}),
        "cells": cells,
    }
