"""Linear-layout prefix cache: copy-based reuse over the store extent.

The linear fast path (the configuration behind every headline bench
number) historically rejected prefix sharing; kv/linear_prefix.py adds
copy-based reuse (VERDICT r2 missing #4, ref: crates/ferrum-kv/src/
cache/prefix.rs:113). These tests prove, on real tiny-model math:
  - a repeated prompt skips prefill tokens (saved_prefill_tokens)
  - restored KV is numerically right (greedy outputs match the
    uncached run bit-for-bit)
  - repetition-penalty counts include reused prompt tokens
  - the store extent evicts under pressure per policy
"""

import pytest

from ferrum_tpu.config import EngineConfig
from ferrum_tpu.engine.builder import EngineBuilder
from ferrum_tpu.models.configs import ModelConfig
from ferrum_tpu.models.llama_family import init_random_params
from ferrum_tpu.tokenizer import make_byte_tokenizer
from ferrum_tpu.types import InferenceRequest, SamplingParams


def linear_engine(prefix_cache=True, store_blocks=-1, seed=0,
                  policy="lru"):
    cfg = EngineConfig(
        model="test", max_num_seqs=4,
        kv_block_size=8, max_model_len=128,
        max_num_batched_tokens=128, prefill_chunk_size=32,
        kv_layout="linear", enable_prefix_cache=prefix_cache,
        prefix_cache_blocks=store_blocks, prefix_cache_policy=policy,
        dtype="f32", kv_dtype="f32", seed=seed)
    mc = ModelConfig(
        family="qwen3", vocab_size=512, hidden_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=16, intermediate_size=128,
        qk_norm=True, tie_word_embeddings=True, rope_theta=10000.0,
        eos_token_ids=(257,))
    import jax.numpy as jnp
    params = init_random_params(mc, seed=0, dtype=jnp.float32)
    tok = make_byte_tokenizer(vocab_extra=512 - 258)
    return EngineBuilder(cfg).with_model(mc, params).with_tokenizer(tok).build()


PROMPT = "the quick brown fox jumps over the lazy dog, twice over"


def req(prompt=PROMPT, max_tokens=8, **kw):
    return InferenceRequest(
        prompt=prompt, sampling=SamplingParams(max_tokens=max_tokens, **kw))


def wait_cached(eng, min_blocks=1, timeout=5.0):
    """Retirement (and the store insert) runs on the engine loop thread
    just after infer() returns — wait for it."""
    import time
    t0 = time.time()
    while time.time() - t0 < timeout:
        if eng.prefix_cache.stats.cached_blocks >= min_blocks:
            return
        time.sleep(0.01)
    raise AssertionError(
        f"store never reached {min_blocks} cached blocks "
        f"({eng.prefix_cache.stats})")


def test_repeat_prompt_saves_prefill_and_matches():
    eng = linear_engine()
    try:
        r1 = eng.infer(req())
        wait_cached(eng)
        stats = eng.prefix_cache.stats
        r2 = eng.infer(req())
        assert stats.saved_prefill_tokens > 0
        assert stats.hits >= 1
        # Bit-exact: the restored KV must reproduce the uncached run.
        assert r2.token_ids == r1.token_ids
    finally:
        eng.stop()


def test_matches_disabled_cache_run():
    eng_on = linear_engine(prefix_cache=True)
    eng_off = linear_engine(prefix_cache=False)
    try:
        base = eng_off.infer(req(max_tokens=10))
        eng_on.infer(req(max_tokens=10))        # populate
        wait_cached(eng_on)
        hit = eng_on.infer(req(max_tokens=10))  # reuse
        assert eng_on.prefix_cache.stats.saved_prefill_tokens > 0
        assert hit.token_ids == base.token_ids
    finally:
        eng_on.stop()
        eng_off.stop()


def test_repetition_penalty_counts_cover_reused_prefix():
    """Reused prompt tokens must still feed repetition-penalty counts:
    greedy + penalty output must match the uncached run exactly."""
    kw = dict(max_tokens=10, repetition_penalty=1.8, temperature=0.0)
    eng_off = linear_engine(prefix_cache=False)
    eng_on = linear_engine(prefix_cache=True)
    try:
        base = eng_off.infer(req(**kw))
        eng_on.infer(req(**kw))
        wait_cached(eng_on)
        hit = eng_on.infer(req(**kw))
        assert eng_on.prefix_cache.stats.saved_prefill_tokens > 0
        assert hit.token_ids == base.token_ids
    finally:
        eng_on.stop()
        eng_off.stop()


def test_partial_prefix_extension():
    """A prompt extending a cached prefix reuses the shared full blocks
    and prefills only the tail."""
    eng = linear_engine()
    try:
        eng.infer(req(prompt=PROMPT, max_tokens=4))
        wait_cached(eng)
        saved0 = eng.prefix_cache.stats.saved_prefill_tokens
        eng.infer(req(prompt=PROMPT + " and a new tail", max_tokens=4))
        assert eng.prefix_cache.stats.saved_prefill_tokens > saved0
    finally:
        eng.stop()


@pytest.mark.parametrize("policy", ["lru", "fifo", "clock"])
def test_store_eviction_under_pressure(policy):
    """A tiny store extent must evict (per policy) instead of failing."""
    eng = linear_engine(store_blocks=4, policy=policy)
    try:
        for i in range(6):
            eng.infer(req(prompt=f"distinct prompt number {i} padded out "
                                 f"to cross a block boundary", max_tokens=2))
        stats = eng.prefix_cache.stats
        assert stats.evictions > 0
        assert stats.cached_blocks <= 4
        # Still correct after evictions: repeated prompt matches fresh.
        r1 = eng.infer(req(max_tokens=6))
        import time; time.sleep(0.1)
        r2 = eng.infer(req(max_tokens=6))
        assert r1.token_ids == r2.token_ids
    finally:
        eng.stop()


def test_abort_does_not_cache_unprefilled_blocks():
    """finish() must not publish blocks of a never-completed prefill
    (the prefilled >= num_prompt_tokens guard)."""
    eng = linear_engine()
    try:
        from ferrum_tpu.kv.block_pool import SlotBlocks
        from ferrum_tpu.scheduler.sequence import Sequence
        ids = eng.tokenizer.encode("x" * 100)
        s = Sequence(InferenceRequest(
            prompt_token_ids=ids,
            sampling=SamplingParams(max_tokens=4)), ids)
        s.blocks = SlotBlocks(eng.pool, 0, eng.cfg.max_blocks_per_seq)
        s.blocks.ensure_capacity(16)
        s.prefilled = 16            # aborted mid-prefill
        before = eng.prefix_cache.stats.cached_blocks
        eng.scheduler.finish(s)
        assert eng.prefix_cache.stats.cached_blocks == before
    finally:
        eng.stop()
