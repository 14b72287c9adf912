"""HTTP contract tests: in-process server over a tiny real engine.

Models the reference's router_with_stub harness + server contract tests
(crates/ferrum-server tests, crates/ferrum-cli/tests/server_openai_compat.rs):
field-level 400 rejections, streaming SSE shape, usage accounting,
session cache, health/metrics/models.
"""

import asyncio
import json
import threading
import time

import pytest
import requests

from ferrum_tpu.server.app import FerrumServer
from tests.test_engine_e2e import tiny_engine


class ServerHandle:
    def __init__(self, engine, port=18231, **server_kw):
        self.engine = engine
        self._server_kw = server_kw
        self.port = port
        self.base = f"http://127.0.0.1:{port}"
        self._loop = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._started = threading.Event()
        self._thread.start()
        assert self._started.wait(timeout=30)

    def _run(self):
        from aiohttp import web

        self._loop = asyncio.new_event_loop()
        asyncio.set_event_loop(self._loop)
        server = FerrumServer(self.engine, model_name="tiny-test",
                              **self._server_kw)
        runner = web.AppRunner(server.make_app())
        self._loop.run_until_complete(runner.setup())
        site = web.TCPSite(runner, "127.0.0.1", self.port)
        self._loop.run_until_complete(site.start())
        self._started.set()
        self._loop.run_forever()

    def stop(self):
        if self._loop:
            self._loop.call_soon_threadsafe(self._loop.stop)
        self.engine.stop()


@pytest.fixture(scope="module")
def server():
    eng = tiny_engine(max_num_seqs=4)
    h = ServerHandle(eng)
    yield h
    h.stop()


def chat_body(**kw):
    body = {"model": "tiny-test",
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 6}
    body.update(kw)
    return body


class TestChatCompletions:
    def test_basic(self, server):
        r = requests.post(f"{server.base}/v1/chat/completions",
                          json=chat_body())
        assert r.status_code == 200, r.text
        data = r.json()
        assert data["object"] == "chat.completion"
        assert data["choices"][0]["message"]["role"] == "assistant"
        assert data["usage"]["prompt_tokens"] > 0
        assert data["usage"]["completion_tokens"] >= 1
        assert data["choices"][0]["finish_reason"] in ("stop", "length")

    def test_streaming_sse(self, server):
        r = requests.post(f"{server.base}/v1/chat/completions",
                          json=chat_body(stream=True,
                                         stream_options={"include_usage": True}),
                          stream=True)
        assert r.status_code == 200
        events = []
        for line in r.iter_lines():
            if line.startswith(b"data:"):
                payload = line[5:].strip()
                if payload == b"[DONE]":
                    events.append("DONE")
                else:
                    events.append(json.loads(payload))
        assert events[-1] == "DONE"
        chunks = [e for e in events if isinstance(e, dict)]
        assert chunks[0]["choices"][0]["delta"].get("role") == "assistant"
        finishes = [c for c in chunks
                    if c.get("choices") and c["choices"][0]["finish_reason"]]
        assert finishes, "no finish chunk"
        usage = [c for c in chunks if c.get("usage")]
        assert usage and usage[-1]["usage"]["completion_tokens"] >= 1

    def test_stream_equals_nonstream_text(self, server):
        body = chat_body(messages=[{"role": "user",
                                    "content": "determinism check"}],
                         temperature=0.0)
        r1 = requests.post(f"{server.base}/v1/chat/completions", json=body)
        text1 = r1.json()["choices"][0]["message"]["content"]
        r2 = requests.post(f"{server.base}/v1/chat/completions",
                           json={**body, "stream": True}, stream=True)
        text2 = ""
        for line in r2.iter_lines():
            if line.startswith(b"data:") and line[5:].strip() != b"[DONE]":
                c = json.loads(line[5:])
                if c.get("choices"):
                    text2 += c["choices"][0]["delta"].get("content") or ""
        assert text1 == text2

    # --- explicit 400 rejection table (docs/openai-api-compatibility.md) ---
    @pytest.mark.parametrize("field,value,param", [
        ("n", 2, "n"),
        ("logit_bias", {"5": 1.0}, "logit_bias"),
        ("logprobs", True, "logprobs"),
        ("top_logprobs", 3, "top_logprobs"),
        ("stream_options", {"include_usage": True}, "stream_options"),
        ("tools", [{"type": "retrieval"}], "tools"),
        ("tool_choice", "banana", "tool_choice"),
        ("response_format", {"type": "yaml"}, "response_format.type"),
        ("chat_template_kwargs", {"enable_thinking": "yes"},
         "chat_template_kwargs.enable_thinking"),
    ])
    def test_rejections(self, server, field, value, param):
        r = requests.post(f"{server.base}/v1/chat/completions",
                          json=chat_body(**{field: value}))
        assert r.status_code == 400, (field, r.text)
        err = r.json()["error"]
        assert err["param"] == param

    def test_multimodal_content_rejected(self, server):
        body = chat_body(messages=[{"role": "user", "content": [
            {"type": "image_url", "image_url": {"url": "http://x"}}]}])
        r = requests.post(f"{server.base}/v1/chat/completions", json=body)
        assert r.status_code == 400
        assert "content" in r.json()["error"]["param"]

    def test_undeclared_tool_choice_rejected(self, server):
        body = chat_body(
            tools=[{"type": "function",
                    "function": {"name": "weather", "parameters": {}}}],
            tool_choice={"type": "function", "function": {"name": "other"}})
        r = requests.post(f"{server.base}/v1/chat/completions", json=body)
        assert r.status_code == 400
        assert r.json()["error"]["param"] == "tool_choice"

    def test_unsupported_strict_schema_rejected(self, server):
        body = chat_body(response_format={
            "type": "json_schema",
            "json_schema": {"strict": True, "schema": {
                "type": "object",
                "properties": {"x": {"type": "object"}},  # no sub-properties
            }}})
        r = requests.post(f"{server.base}/v1/chat/completions", json=body)
        assert r.status_code == 400
        assert r.json()["error"]["param"] == "response_format.json_schema"

    def test_session_cache_header(self, server):
        sid = "sess-test-1"
        requests.post(f"{server.base}/v1/chat/completions",
                      json=chat_body(), headers={"X-Ferrum-Session": sid})
        m = requests.get(f"{server.base}/metrics").text
        assert "ferrum_session_cache_sessions" in m
        line = [ln for ln in m.splitlines()
                if ln.startswith("ferrum_session_cache_sessions")][0]
        assert int(line.split()[-1]) >= 1


class TestCompletions:
    def test_basic(self, server):
        r = requests.post(f"{server.base}/v1/completions",
                          json={"model": "t", "prompt": "hello",
                                "max_tokens": 4})
        assert r.status_code == 200
        data = r.json()
        assert data["object"] == "text_completion"
        assert data["usage"]["completion_tokens"] >= 1

    def test_prompt_array_rejected(self, server):
        r = requests.post(f"{server.base}/v1/completions",
                          json={"model": "t", "prompt": ["a", "b"],
                                "max_tokens": 4})
        assert r.status_code == 400
        assert r.json()["error"]["param"] == "prompt"

    def test_streaming(self, server):
        r = requests.post(f"{server.base}/v1/completions",
                          json={"model": "t", "prompt": "st", "max_tokens": 4,
                                "stream": True}, stream=True)
        lines = [l for l in r.iter_lines() if l.startswith(b"data:")]
        assert lines[-1][5:].strip() == b"[DONE]"

    def test_guided_regex(self, server):
        r = requests.post(f"{server.base}/v1/completions",
                          json={"model": "t", "prompt": "answer:",
                                "max_tokens": 8, "temperature": 0,
                                "guided_regex": "(yes|no)"})
        assert r.status_code == 200, r.text
        assert r.json()["choices"][0]["text"] in ("yes", "no")

    def test_guided_choice(self, server):
        r = requests.post(f"{server.base}/v1/completions",
                          json={"model": "t", "prompt": "pick:",
                                "max_tokens": 8, "temperature": 0,
                                "guided_choice": ["alpha", "beta"]})
        assert r.status_code == 200, r.text
        assert r.json()["choices"][0]["text"] in ("alpha", "beta")

    def test_guided_conflicting_fields_400(self, server):
        r = requests.post(f"{server.base}/v1/completions",
                          json={"model": "t", "prompt": "x", "max_tokens": 4,
                                "guided_regex": "a+",
                                "guided_choice": ["b"]})
        assert r.status_code == 400
        assert "guided" in r.json()["error"]["param"]


class TestMisc:
    def test_models(self, server):
        r = requests.get(f"{server.base}/v1/models")
        assert r.json()["data"][0]["id"] == "tiny-test"

    def test_health(self, server):
        r = requests.get(f"{server.base}/health")
        data = r.json()
        assert data["status"] == "ok"
        assert data["prefix_cache"] == "block_hash"

    def test_metrics(self, server):
        r = requests.get(f"{server.base}/metrics")
        assert "ferrum_requests_completed" in r.text

    def test_embeddings_on_llm_rejected(self, server):
        r = requests.post(f"{server.base}/v1/embeddings",
                          json={"model": "t", "input": "hi"})
        assert r.status_code == 400


class TestEmbeddings:
    @pytest.fixture(scope="class")
    def embed_server(self):
        from ferrum_tpu.engine.embedding import EmbeddingEngine

        eng = tiny_engine(max_num_seqs=2)
        emb = EmbeddingEngine(eng.runner.model_cfg, eng.runner.params,
                              eng.tokenizer)

        class H(ServerHandle):
            def _run(self):
                import asyncio as aio
                from aiohttp import web
                self._loop = aio.new_event_loop()
                aio.set_event_loop(self._loop)
                server = FerrumServer(self.engine, model_name="tiny-embed",
                                      embedding_engine=emb)
                runner = web.AppRunner(server.make_app())
                self._loop.run_until_complete(runner.setup())
                site = web.TCPSite(runner, "127.0.0.1", self.port)
                self._loop.run_until_complete(site.start())
                self._started.set()
                self._loop.run_forever()

        # NOT 18233: test_logprobs_server.py binds that one, and its
        # socket can still be held when this class fixture starts.
        h = H(eng, port=18236)
        yield h
        h.stop()

    def test_embed_string_and_list(self, embed_server):
        r = requests.post(f"{embed_server.base}/v1/embeddings",
                          json={"model": "e", "input": "hello world"})
        assert r.status_code == 200, r.text
        d = r.json()
        assert len(d["data"]) == 1
        v = d["data"][0]["embedding"]
        assert abs(sum(x * x for x in v) - 1.0) < 1e-3  # L2 normalized
        r2 = requests.post(f"{embed_server.base}/v1/embeddings",
                           json={"model": "e",
                                 "input": ["a b c", {"text": "d e"}]})
        assert len(r2.json()["data"]) == 2
        assert r2.json()["usage"]["prompt_tokens"] > 0

    def test_base64_rejected(self, embed_server):
        r = requests.post(f"{embed_server.base}/v1/embeddings",
                          json={"model": "e", "input": "x",
                                "encoding_format": "base64"})
        assert r.status_code == 400
        assert r.json()["error"]["param"] == "encoding_format"

    def test_embeddings_deterministic(self, embed_server):
        v1 = requests.post(f"{embed_server.base}/v1/embeddings",
                           json={"model": "e", "input": "same text"}
                           ).json()["data"][0]["embedding"]
        v2 = requests.post(f"{embed_server.base}/v1/embeddings",
                           json={"model": "e", "input": "same text"}
                           ).json()["data"][0]["embedding"]
        assert v1 == v2
