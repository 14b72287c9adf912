"""OpenAI-compatible HTTP server (aiohttp).

TPU-native analog of the reference's axum server
(crates/ferrum-server/src/axum_server.rs:128-206): same endpoint set —
/v1/chat/completions, /v1/completions, /v1/models, /v1/embeddings,
/health, /metrics, / — same explicit-400 rejection contract, SSE
streaming with [DONE], stream_options.include_usage, tool-call parsing,
strict-json_schema buffered streaming (no invalid partial deltas), and
the opt-in X-Ferrum-Session in-memory session cache
(axum_server.rs:67-88,489-556).
"""

from __future__ import annotations

import asyncio
import collections
import json
import time
from typing import Any, Dict, List, Optional
from wave import Error as wave_error

from aiohttp import web

from ..engine.engine import ContinuousBatchEngine
from ..sampling.schema import validate_json_against_subset
from ..types import (
    FerrumError, FinishReason, GuidedOptions, InferenceRequest,
    InvalidRequestError, NotSupportedError, SamplingParams,
)
from .chat_template import ChatTemplateRenderer
from .openai_types import (
    ChatCompletionRequest, CompletionRequest, EmbeddingsRequest, chat_chunk,
    chat_response, completion_id, error_body, flatten_content,
    guided_from_chat, guided_from_completion, sampling_from_chat,
    validate_chat_request, validate_completion_request,
)
from .tool_calls import parse_tool_calls


class SessionCache:
    """Opt-in per-session message history with entry/token budgets
    (ref: axum_server.rs session cache)."""

    def __init__(self, max_entries: int = 64, max_tokens: int = 8192):
        self.max_entries = max_entries
        self.max_tokens = max_tokens
        self._store: "collections.OrderedDict[str, List[Dict]]" = \
            collections.OrderedDict()

    def get(self, sid: str) -> List[Dict]:
        msgs = self._store.get(sid, [])
        if sid in self._store:
            self._store.move_to_end(sid)
        return list(msgs)

    def extend(self, sid: str, msgs: List[Dict], approx_tokens_fn) -> None:
        hist = self._store.setdefault(sid, [])
        hist.extend(msgs)
        # Token budget: drop from the front (keep a leading system msg).
        while len(hist) > 2 and sum(
                approx_tokens_fn(m.get("content") or "")
                for m in hist) > self.max_tokens:
            drop_idx = 1 if hist and hist[0].get("role") == "system" else 0
            hist.pop(drop_idx)
        self._store.move_to_end(sid)
        while len(self._store) > self.max_entries:
            self._store.popitem(last=False)

    @property
    def sessions(self) -> int:
        return len(self._store)


class FerrumServer:
    def __init__(self, engine: ContinuousBatchEngine, model_name: str,
                 chat_template: Optional[str] = None,
                 api_key: Optional[str] = None,
                 embedding_engine=None, asr_engine=None,
                 tts_engine=None):
        self.engine = engine
        self.model_name = model_name
        self.api_key = api_key
        self.embedding_engine = embedding_engine
        self.asr_engine = asr_engine
        self.tts_engine = tts_engine
        family = engine.runner.model_cfg.family
        self.renderer = ChatTemplateRenderer(
            template=chat_template or engine.tokenizer.chat_template,
            family=family)
        cfg = engine.cfg
        self.sessions = SessionCache(cfg.session_cache_entries,
                                     cfg.session_cache_tokens)
        self.started_at = time.time()

    # ------------------------------------------------------------------
    def make_app(self) -> web.Application:
        app = web.Application(middlewares=[self._error_middleware,
                                           self._auth_middleware])
        app.router.add_post("/v1/chat/completions", self.chat_completions)
        app.router.add_post("/v1/completions", self.completions)
        app.router.add_post("/v1/embeddings", self.embeddings)
        app.router.add_post("/v1/audio/transcriptions",
                            self.transcriptions)
        app.router.add_post("/v1/audio/speech", self.speech)
        app.router.add_get("/v1/models", self.models)
        app.router.add_get("/health", self.health)
        app.router.add_get("/metrics", self.metrics)
        app.router.add_get("/", self.root)
        return app

    # ------------------------------------------------------------------
    @web.middleware
    async def _error_middleware(self, request, handler):
        try:
            return await handler(request)
        except InvalidRequestError as e:
            return web.json_response(
                error_body(e.message, "invalid_request_error", e.param),
                status=400)
        except NotSupportedError as e:
            return web.json_response(
                error_body(e.message, "invalid_request_error", e.param),
                status=400)
        except FerrumError as e:
            return web.json_response(
                error_body(e.message, e.code), status=500)

    @web.middleware
    async def _auth_middleware(self, request, handler):
        if self.api_key and request.path.startswith("/v1/"):
            auth = request.headers.get("Authorization", "")
            if auth != f"Bearer {self.api_key}":
                return web.json_response(
                    error_body("invalid API key", "authentication_error"),
                    status=401)
        return await handler(request)

    # ------------------------------------------------------------------
    async def _parse_json(self, request, model_cls):
        try:
            data = await request.json()
        except Exception:
            raise InvalidRequestError("request body is not valid JSON")
        try:
            return model_cls.model_validate(data)
        except Exception as e:
            raise InvalidRequestError(f"request validation failed: {e}")

    async def _collect(self, inf_req: InferenceRequest):
        loop = asyncio.get_running_loop()
        q = await loop.run_in_executor(None, self.engine.submit, inf_req)
        chunks = []
        while True:
            chunk = await loop.run_in_executor(None, q.get)
            chunks.append(chunk)
            if chunk.finished:
                return chunks

    # ------------------------------------------------------------------
    async def chat_completions(self, request: web.Request) -> web.StreamResponse:
        req = await self._parse_json(request, ChatCompletionRequest)
        validate_chat_request(req)

        session_id = request.headers.get("X-Ferrum-Session")
        messages = [
            {"role": m.role, "content": flatten_content(m.content),
             **({"tool_calls": m.tool_calls} if m.tool_calls else {}),
             **({"function_call": m.function_call} if m.function_call else {}),
             **({"name": m.name} if m.name else {})}
            for m in req.messages
        ]
        if session_id:
            messages = self.sessions.get(session_id) + messages

        tools = req.tools or (
            [{"type": "function", "function": f} for f in req.functions]
            if req.functions else None)
        prompt = self.renderer.render(
            messages, add_generation_prompt=True, tools=tools,
            chat_template_kwargs=req.chat_template_kwargs)

        sampling = sampling_from_chat(req)
        guided = guided_from_chat(req)
        strict_schema = None
        if guided is not None and guided.json_schema is not None:
            if guided.strict:
                # Fail fast on unsupported subsets (explicit 400).
                from ..sampling.schema import schema_to_regex
                try:
                    schema_to_regex(guided.json_schema)
                except NotSupportedError as e:
                    raise InvalidRequestError(
                        f"unsupported json_schema subset: {e.message}",
                        param="response_format.json_schema")
                strict_schema = guided.json_schema
            else:
                guided = None  # non-strict schema: best effort, no mask

        tool_choice = req.tool_choice
        if tool_choice == "none":
            declared_names = None
            parse_tools = False
        else:
            declared_names = [
                (t.get("function") or {}).get("name") for t in (tools or [])]
            parse_tools = bool(tools)
        required_tool = None
        if isinstance(tool_choice, dict):
            required_tool = (tool_choice.get("function") or {}).get("name")
        elif tool_choice == "required" and declared_names:
            required_tool = None  # any declared tool acceptable

        inf_req = InferenceRequest(
            prompt_token_ids=self.engine.tokenizer.encode(prompt),
            sampling=sampling, guided=guided)

        rid = completion_id()
        if req.stream:
            return await self._stream_chat(
                request, req, inf_req, rid, strict_schema, parse_tools,
                declared_names, required_tool, session_id, messages)

        chunks = await self._collect(inf_req)
        text = "".join(c.text for c in chunks)
        last = chunks[-1]
        finish = (last.finish_reason or FinishReason.STOP).value

        if strict_schema is not None and \
                not validate_json_against_subset(text, strict_schema):
            raise InvalidRequestError(
                "generated output failed strict schema validation",
                param="response_format.json_schema")

        tool_calls = []
        content = text
        if parse_tools:
            content, tool_calls = parse_tool_calls(
                text, declared_names, required_tool)
            if tool_choice == "required" and not tool_calls:
                raise InvalidRequestError(
                    "model did not produce a valid required tool call",
                    param="tool_choice")
        function_call = None
        if req.functions and tool_calls:
            function_call = dict(tool_calls[0]["function"])
            tool_calls = []

        if session_id:
            self.sessions.extend(
                session_id,
                messages[len(self.sessions.get(session_id)):] + [
                    {"role": "assistant", "content": text}],
                lambda s: max(1, len(s) // 4))

        return web.json_response(chat_response(
            self.model_name, content, finish, last.prompt_tokens,
            last.completion_tokens, tool_calls or None, function_call,
            rid=rid))

    async def _stream_chat(self, request, req, inf_req, rid, strict_schema,
                           parse_tools, declared_names, required_tool,
                           session_id, rendered_messages):
        resp = web.StreamResponse(headers={
            "Content-Type": "text/event-stream",
            "Cache-Control": "no-cache",
            "Connection": "keep-alive"})
        await resp.prepare(request)

        async def send(obj):
            await resp.write(f"data: {json.dumps(obj)}\n\n".encode())

        loop = asyncio.get_running_loop()
        q = await loop.run_in_executor(None, self.engine.submit, inf_req)
        await send(chat_chunk(rid, self.model_name,
                              {"role": "assistant", "content": ""}))

        # Buffered modes: strict schema / tool parsing can't stream raw
        # deltas (ref: buffered strict-schema streaming,
        # axum_server.rs:1968-2003).
        buffered = strict_schema is not None or parse_tools \
            or (inf_req.guided is not None and inf_req.guided.json_mode)
        full_text = []
        last = None
        think_buf = ""
        in_think = False
        while True:
            chunk = await loop.run_in_executor(None, q.get)
            last = chunk
            if chunk.text:
                full_text.append(chunk.text)
                if not buffered:
                    # <think> deltas stream as reasoning-style content
                    # after deferral of the opening tag.
                    await send(chat_chunk(rid, self.model_name,
                                          {"content": chunk.text}))
            if chunk.finished:
                break

        text = "".join(full_text)
        finish = (last.finish_reason or FinishReason.STOP).value
        if buffered:
            if strict_schema is not None and \
                    not validate_json_against_subset(text, strict_schema):
                await send(error_body(
                    "generated output failed strict schema validation",
                    param="response_format.json_schema"))
                await resp.write(b"data: [DONE]\n\n")
                return resp
            content, tool_calls = (text, [])
            if parse_tools:
                content, tool_calls = parse_tool_calls(
                    text, declared_names, required_tool)
                if req.tool_choice == "required" and not tool_calls:
                    await send(error_body(
                        "model did not produce a valid required tool call",
                        param="tool_choice"))
                    await resp.write(b"data: [DONE]\n\n")
                    return resp
            if tool_calls:
                if req.functions:
                    await send(chat_chunk(
                        rid, self.model_name,
                        {"function_call": tool_calls[0]["function"]}))
                else:
                    deltas = [{**tc, "index": i}
                              for i, tc in enumerate(tool_calls)]
                    await send(chat_chunk(rid, self.model_name,
                                          {"tool_calls": deltas}))
                finish = "tool_calls"
            elif content:
                await send(chat_chunk(rid, self.model_name,
                                      {"content": content}))

        await send(chat_chunk(rid, self.model_name, {}, finish_reason=finish))
        if req.stream_options and req.stream_options.include_usage:
            await send(chat_chunk(rid, self.model_name, {}, usage={
                "prompt_tokens": last.prompt_tokens,
                "completion_tokens": last.completion_tokens,
                "total_tokens": last.prompt_tokens + last.completion_tokens,
            }))
        await resp.write(b"data: [DONE]\n\n")

        if session_id:
            self.sessions.extend(
                session_id,
                rendered_messages[len(self.sessions.get(session_id)):] + [
                    {"role": "assistant", "content": text}],
                lambda s: max(1, len(s) // 4))
        return resp

    # ------------------------------------------------------------------
    async def completions(self, request: web.Request) -> web.StreamResponse:
        req = await self._parse_json(request, CompletionRequest)
        validate_completion_request(req)
        stop = req.stop if isinstance(req.stop, list) else (
            [req.stop] if req.stop else [])
        score = bool(req.echo and req.logprobs)
        sampling = SamplingParams(
            temperature=req.temperature if req.temperature is not None else 1.0,
            top_p=req.top_p if req.top_p is not None else 1.0,
            top_k=req.top_k or 0,
            max_tokens=0 if score else (req.max_tokens or 16),
            min_tokens=req.min_tokens or 0,
            logprobs=req.logprobs if score else None,
            stop=stop, seed=req.seed, ignore_eos=bool(req.ignore_eos))
        inf_req = InferenceRequest(prompt=req.prompt, sampling=sampling,
                                   echo=score,
                                   guided=guided_from_completion(req))
        rid = completion_id("cmpl")

        if score:
            # Prompt scoring (lm_eval local-completions loglikelihood):
            # one blocking round returns the OpenAI logprobs object for
            # the echoed prompt; no text is generated.
            chunks = await self._collect(inf_req)
            last = chunks[-1]
            entries = last.logprobs or []
            toks, tok_lps, top_lps, offs = [], [], [], []
            off = 0
            for e in entries:
                text_tok = self.engine.tokenizer.decode([e["token_id"]])
                toks.append(text_tok)
                offs.append(off)
                off += len(text_tok)
                tok_lps.append(e["logprob"])
                if e["logprob"] is None:
                    top_lps.append(None)
                else:
                    top = {self.engine.tokenizer.decode([e["argmax_id"]]):
                           e["argmax_logprob"]}
                    top.setdefault(text_tok, e["logprob"])
                    top_lps.append(top)
            return web.json_response({
                "id": rid, "object": "text_completion",
                "created": int(time.time()), "model": self.model_name,
                "choices": [{"index": 0, "text": req.prompt,
                             "logprobs": {
                                 "tokens": toks,
                                 "token_logprobs": tok_lps,
                                 "top_logprobs": top_lps,
                                 "text_offset": offs},
                             "finish_reason": "length"}],
                "usage": {"prompt_tokens": last.prompt_tokens,
                          "completion_tokens": 0,
                          "total_tokens": last.prompt_tokens}})

        if req.stream:
            resp = web.StreamResponse(headers={
                "Content-Type": "text/event-stream",
                "Cache-Control": "no-cache"})
            await resp.prepare(request)
            loop = asyncio.get_running_loop()
            q = await loop.run_in_executor(None, self.engine.submit, inf_req)
            last = None
            while True:
                chunk = await loop.run_in_executor(None, q.get)
                last = chunk
                if chunk.text:
                    await resp.write(f"data: {json.dumps({
                        'id': rid, 'object': 'text_completion',
                        'created': int(time.time()),
                        'model': self.model_name,
                        'choices': [{'index': 0, 'text': chunk.text,
                                     'finish_reason': None}]})}\n\n".encode())
                if chunk.finished:
                    break
            fin = (last.finish_reason or FinishReason.STOP).value
            await resp.write(f"data: {json.dumps({
                'id': rid, 'object': 'text_completion',
                'created': int(time.time()), 'model': self.model_name,
                'choices': [{'index': 0, 'text': '',
                             'finish_reason': fin}]})}\n\n".encode())
            if req.stream_options and req.stream_options.include_usage:
                await resp.write(f"data: {json.dumps({
                    'id': rid, 'object': 'text_completion',
                    'created': int(time.time()), 'model': self.model_name,
                    'choices': [],
                    'usage': {'prompt_tokens': last.prompt_tokens,
                              'completion_tokens': last.completion_tokens,
                              'total_tokens': last.prompt_tokens
                              + last.completion_tokens}})}\n\n".encode())
            await resp.write(b"data: [DONE]\n\n")
            return resp

        chunks = await self._collect(inf_req)
        text = "".join(c.text for c in chunks)
        last = chunks[-1]
        return web.json_response({
            "id": rid, "object": "text_completion",
            "created": int(time.time()), "model": self.model_name,
            "choices": [{"index": 0, "text": text, "logprobs": None,
                         "finish_reason":
                         (last.finish_reason or FinishReason.STOP).value}],
            "usage": {"prompt_tokens": last.prompt_tokens,
                      "completion_tokens": last.completion_tokens,
                      "total_tokens": last.prompt_tokens
                      + last.completion_tokens}})

    # ------------------------------------------------------------------
    async def transcriptions(self, request: web.Request) -> web.Response:
        """OpenAI-compatible /v1/audio/transcriptions (multipart form
        with a WAV `file`; response_format json/text). ref:
        axum_server.rs:200 transcriptions_handler."""
        if self.asr_engine is None:
            raise NotSupportedError(
                "this server is not running an ASR model "
                "(start with --asr-model <whisper checkpoint dir>)",
                param="model")
        data = None
        response_format = "json"
        ctype = request.headers.get("Content-Type", "")
        if "multipart" in ctype:
            reader = await request.multipart()
            async for part in reader:
                if part.name == "file":
                    data = await part.read(decode=False)
                elif part.name == "response_format":
                    response_format = (await part.text()).strip()
        else:
            data = await request.read()
        if not data:
            raise InvalidRequestError("missing audio `file`", param="file")
        if response_format not in ("json", "text", "verbose_json"):
            raise InvalidRequestError(
                f"unsupported response_format {response_format!r}",
                param="response_format")
        loop = asyncio.get_running_loop()
        try:
            result = await loop.run_in_executor(
                None, self.asr_engine.transcribe_bytes, bytes(data))
        except (ValueError, EOFError, wave_error) as e:
            raise InvalidRequestError(
                f"cannot decode audio (WAV-PCM supported): {e}",
                param="file")
        if response_format == "text":
            return web.Response(text=result["text"],
                                content_type="text/plain")
        body = {"text": result["text"]}
        if response_format == "verbose_json":
            body["token_ids"] = result["token_ids"]
        return web.json_response(body)

    async def speech(self, request: web.Request) -> web.Response:
        """OpenAI-compatible /v1/audio/speech: {model, input, voice,
        response_format} → audio bytes. ref: axum_server.rs:201
        speech_handler + the documented explicit-400 contract."""
        if self.tts_engine is None:
            raise NotSupportedError(
                "this server is not running a TTS model "
                "(start with --tts-model <checkpoint dir>)",
                param="model")
        try:
            body = await request.json()
        except Exception:
            raise InvalidRequestError("body must be JSON")
        text = body.get("input")
        if not isinstance(text, str) or not text:
            raise InvalidRequestError(
                "`input` must be a non-empty string", param="input")
        fmt = body.get("response_format", "wav")
        if fmt not in ("wav", "pcm"):
            raise InvalidRequestError(
                f"unsupported response_format {fmt!r} (wav|pcm)",
                param="response_format")
        voice = body.get("voice", "default")
        loop = asyncio.get_running_loop()
        audio = await loop.run_in_executor(
            None, lambda: self.tts_engine.synthesize(text, voice))
        if fmt == "pcm":
            import numpy as _np
            pcm = (_np.clip(audio, -1, 1) * 32767.0).astype("<i2")
            return web.Response(body=pcm.tobytes(),
                                content_type="application/octet-stream")
        from ..engine.tts import encode_wav
        return web.Response(
            body=encode_wav(audio, self.tts_engine.sample_rate),
            content_type="audio/wav")

    async def embeddings(self, request: web.Request) -> web.Response:
        req = await self._parse_json(request, EmbeddingsRequest)
        if req.encoding_format != "float":
            # base64 rejected with param=encoding_format per the contract
            # (docs/openai-api-compatibility.md modality table).
            raise InvalidRequestError(
                "only encoding_format=float is supported",
                param="encoding_format")
        if self.embedding_engine is None:
            raise NotSupportedError(
                "this server is not running an embedding model",
                param="model")
        # Accept: string | [string] | {"text": ...} | [{"text": ...}]
        # CLIP engines additionally take {"image": <base64>} items.
        raw = req.input
        items = raw if isinstance(raw, list) else [raw]
        clip = type(self.embedding_engine).__name__ == "ClipEmbeddingEngine"
        texts = []
        for i, it in enumerate(items):
            if isinstance(it, str):
                texts.append(it)
            elif isinstance(it, dict) and isinstance(it.get("text"), str):
                texts.append(it["text"])
            elif clip and isinstance(it, dict) and "image" in it:
                texts.append(it)
            else:
                raise InvalidRequestError(
                    f"unsupported embeddings input item {i}", param="input")
        loop = asyncio.get_running_loop()
        vecs, total = await loop.run_in_executor(
            None, self.embedding_engine.embed, texts)
        return web.json_response({
            "object": "list",
            "model": self.model_name,
            "data": [{"object": "embedding", "index": i,
                      "embedding": v.tolist()}
                     for i, v in enumerate(vecs)],
            "usage": {"prompt_tokens": total, "total_tokens": total},
        })

    async def models(self, request: web.Request) -> web.Response:
        return web.json_response({"object": "list", "data": [{
            "id": self.model_name, "object": "model",
            "created": int(self.started_at), "owned_by": "ferrum-tpu"}]})

    async def health(self, request: web.Request) -> web.Response:
        m = self.engine.metrics_snapshot()
        return web.json_response({
            "status": "ok",
            "model": self.model_name,
            "prefix_cache": "block_hash" if self.engine.prefix_cache.enabled
            else "off",
            "kv_real_reuse": self.engine.prefix_cache.enabled,
            "running": m.running_requests,
            "waiting": m.waiting_requests,
        })

    async def metrics(self, request: web.Request) -> web.Response:
        m = self.engine.metrics_snapshot()
        lines = ["# Prometheus exposition (subset)"]
        for k, v in m.to_dict().items():
            lines.append(f"ferrum_{k} {v}")
        lines.append(f"ferrum_session_cache_sessions {self.sessions.sessions}")
        return web.Response(text="\n".join(lines) + "\n",
                            content_type="text/plain")

    async def root(self, request: web.Request) -> web.Response:
        return web.json_response({
            "name": "ferrum-tpu", "model": self.model_name,
            "endpoints": ["/v1/chat/completions", "/v1/completions",
                          "/v1/embeddings", "/v1/models", "/health",
                          "/metrics"]})


def serve(engine: ContinuousBatchEngine, model_name: str,
          host: str = "127.0.0.1", port: int = 8000,
          chat_template: Optional[str] = None,
          api_key: Optional[str] = None,
          embedding_engine=None, asr_engine=None,
          tts_engine=None) -> None:
    server = FerrumServer(engine, model_name, chat_template, api_key,
                          embedding_engine=embedding_engine,
                          asr_engine=asr_engine, tts_engine=tts_engine)
    web.run_app(server.make_app(), host=host, port=port,
                print=lambda *a: None)
