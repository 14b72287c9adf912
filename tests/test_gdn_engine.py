"""Engine e2e on the hybrid GDN family (tiny-gdn preset): recurrent
state pools thread through the fused decode windows and batched prefill
exactly like the KV cache (runner-owned, donated, reset in-program on
chunk-0 rows)."""

import threading

import numpy as np
import pytest

import jax.numpy as jnp

from ferrum_tpu.config import EngineConfig
from ferrum_tpu.engine.builder import EngineBuilder
from ferrum_tpu.models.configs import preset
from ferrum_tpu.models.llama_family import init_random_params
from ferrum_tpu.tokenizer import make_byte_tokenizer
from ferrum_tpu.types import (
    FinishReason, InferenceRequest, NotSupportedError, SamplingParams,
)


def gdn_engine(max_num_seqs=4, **kw):
    cfg = EngineConfig(
        model="test", max_num_seqs=max_num_seqs, kv_num_blocks=64,
        kv_block_size=8, max_model_len=256, max_num_batched_tokens=128,
        prefill_chunk_size=32, dtype="f32", kv_dtype="f32", seed=0, **kw)
    mc = preset("tiny-gdn")
    params = init_random_params(mc, seed=0, dtype=jnp.float32)
    tok = make_byte_tokenizer(vocab_extra=512 - 258)
    return EngineBuilder(cfg).with_model(mc, params).with_tokenizer(tok).build()


@pytest.fixture(scope="module")
def engine():
    eng = gdn_engine()
    yield eng
    eng.stop()


def req(prompt, max_tokens=8, **kw):
    return InferenceRequest(prompt=prompt, sampling=SamplingParams(
        max_tokens=max_tokens, temperature=0.0, **kw))


def test_basic_generation(engine):
    r = engine.infer(req("hello hybrid"))
    assert r.completion_tokens >= 1
    assert all(0 <= t < 512 for t in r.token_ids)


def test_determinism_and_state_isolation(engine):
    """Same prompt twice (slot reuse between them) must produce the
    same output — slot state fully resets at admission."""
    r1 = engine.infer(req("state check prompt", max_tokens=10))
    engine.infer(req("a different interleaved request", max_tokens=10))
    r2 = engine.infer(req("state check prompt", max_tokens=10))
    assert r1.token_ids == r2.token_ids


def test_concurrent_matches_sequential(engine):
    prompts = ["alpha", "bravo charlie", "delta echo foxtrot", "golf"]
    want = [engine.infer(req(p, max_tokens=8)).token_ids for p in prompts]
    results = [None] * len(prompts)

    def run(i, p):
        results[i] = engine.infer(req(p, max_tokens=8))

    ts = [threading.Thread(target=run, args=(i, p))
          for i, p in enumerate(prompts)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    for w, r, p in zip(want, results, prompts):
        assert r.token_ids == w, p


def test_long_prompt_multi_chunk(engine):
    """Prompt spanning multiple prefill chunks (state carried across
    chunk dispatches) matches itself when re-run."""
    long_prompt = "x" * 100
    r1 = engine.infer(req(long_prompt, max_tokens=6))
    r2 = engine.infer(req(long_prompt, max_tokens=6))
    assert r1.token_ids == r2.token_ids
    assert r1.prompt_tokens >= 100


def test_prefix_cache_disabled_for_hybrid(engine):
    assert engine.prefix_cache is None or not engine.cfg.enable_prefix_cache


def test_spec_decode_rejected_for_hybrid():
    with pytest.raises(NotSupportedError):
        gdn_engine(spec_draft_model="random:tiny-gdn")
