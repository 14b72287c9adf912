"""Mixed prefill+decode windows (CPU, hardware-free).

One slot's prefill chunk rides each fused decode window's trunk
(engine/runner.py mixed path; ref: the reference's mixed decode+prefill
iteration batches, continuous_engine/inner/batch.rs). Greedy outputs
must be bit-identical to the standalone-prefill engine, and the op-level
window attention must equal the one-shot chunked-prefill oracle.
"""

import dataclasses
import threading

import numpy as np
import pytest

from ferrum_tpu.config import EngineConfig
from ferrum_tpu.engine.builder import EngineBuilder
from ferrum_tpu.models.configs import ModelConfig
from ferrum_tpu.types import InferenceRequest, SamplingParams


def _engine(mixed: bool, *, kv_dtype="f32", chunk=32, max_model_len=256,
            family_kw=None, seed=0):
    import jax.numpy as jnp

    from ferrum_tpu.models.llama_family import init_random_params
    from ferrum_tpu.tokenizer import make_byte_tokenizer

    cfg = EngineConfig(
        model="test", max_num_seqs=4, kv_layout="linear",
        kv_block_size=8, max_model_len=max_model_len,
        max_num_batched_tokens=128, prefill_chunk_size=chunk,
        enable_prefix_cache=False, dtype="f32", kv_dtype=kv_dtype,
        decode_multi_step=4, mixed_prefill=mixed, seed=seed)
    mc = ModelConfig(
        family="qwen3", vocab_size=512, hidden_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=16, intermediate_size=128,
        qk_norm=True, tie_word_embeddings=True, rope_theta=10000.0,
        eos_token_ids=(257,), **(family_kw or {}))
    params = init_random_params(mc, seed=0, dtype=jnp.float32)
    tok = make_byte_tokenizer(vocab_extra=512 - 258)
    return EngineBuilder(cfg).with_model(mc, params).with_tokenizer(
        tok).build()


def _run_concurrent(eng, prompts, max_tokens=10):
    results = {}

    def worker(i, p):
        results[i] = eng.infer(InferenceRequest(
            prompt=p, sampling=SamplingParams(max_tokens=max_tokens,
                                              temperature=0.0)))

    ts = [threading.Thread(target=worker, args=(i, p))
          for i, p in enumerate(prompts)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=300)
    assert len(results) == len(prompts)
    return [results[i].token_ids for i in range(len(prompts))]


@pytest.mark.slow  # suite governance: <10 min default lane
def test_mixed_greedy_parity_concurrent():
    """Concurrent load (admissions while lanes decode → chunks ride
    windows): greedy outputs must match the standalone-prefill engine
    token for token."""
    prompts = [f"prompt number {i} with some text payload" * (i + 1)
               for i in range(6)]
    e_mixed = _engine(True)
    e_plain = _engine(False)
    try:
        assert e_mixed.cfg.mixed_prefill and not e_plain.cfg.mixed_prefill
        got = _run_concurrent(e_mixed, prompts)
        want = _run_concurrent(e_plain, prompts)
        assert got == want
        # The mixed engine must actually have exercised the mixed path
        # under this load (decode lanes busy while admissions arrive).
        assert any(
            k[-1] > 0 for k in e_mixed.runner._decode_multi_fns), \
            "no mixed-prefill window variant was ever compiled"
    finally:
        e_mixed.stop()
        e_plain.stop()


@pytest.mark.slow  # suite governance: <10 min default lane
def test_mixed_multichunk_long_prompt():
    """Prompts longer than prefill_chunk_size: chunks 2..n ride windows
    with a non-zero pool prefix (ctx_len = chunk_start)."""
    prompts = ["short one", "x" * 200, "y" * 150, "z" * 90]
    e_mixed = _engine(True, chunk=64)
    e_plain = _engine(False, chunk=64)
    try:
        got = _run_concurrent(e_mixed, prompts, max_tokens=6)
        want = _run_concurrent(e_plain, prompts, max_tokens=6)
        assert got == want
    finally:
        e_mixed.stop()
        e_plain.stop()


@pytest.mark.slow  # suite governance: <10 min default lane
def test_mixed_int8_kv_parity():
    """INT8 KV pool: the chunk's K/V quantizes through the window's
    single append; the pool prefix dequantizes inside the window
    attention."""
    prompts = ["alpha beta gamma", "delta epsilon" * 8, "zeta eta theta"]
    e_mixed = _engine(True, kv_dtype="int8")
    e_plain = _engine(False, kv_dtype="int8")
    try:
        got = _run_concurrent(e_mixed, prompts, max_tokens=6)
        want = _run_concurrent(e_plain, prompts, max_tokens=6)
        assert got == want
    finally:
        e_mixed.stop()
        e_plain.stop()


@pytest.mark.slow  # suite governance: <10 min default lane
def test_mixed_sliding_window_family():
    """Layer-local sliding windows (gemma3-style 5:1 pattern) apply the
    same window mask to prefill block rows."""
    kw = dict(sliding_window=32, sliding_window_pattern=2)
    prompts = ["w" * 120, "sliding attention parity", "v" * 60]
    e_mixed = _engine(True, family_kw=kw, chunk=64)
    e_plain = _engine(False, family_kw=kw, chunk=64)
    try:
        got = _run_concurrent(e_mixed, prompts, max_tokens=6)
        want = _run_concurrent(e_plain, prompts, max_tokens=6)
        assert got == want
    finally:
        e_mixed.stop()
        e_plain.stop()


def test_window_attention_oracle():
    """flat_prefill_window_attention, applied step-block by step-block
    with its in-window K/V accumulator, must reproduce the one-shot
    flat_prefill_attention over the whole chunk."""
    import jax.numpy as jnp

    from ferrum_tpu.ops.attention import (
        flat_prefill_attention, flat_prefill_window_attention,
    )

    rng = np.random.default_rng(0)
    hq, hkv, d = 4, 2, 16
    f = hkv * d
    ctx_pad, ctx_len = 32, 19          # pool prefix (19 real tokens)
    t_steps, p = 3, 8                  # 3 window steps x 8 rows
    n = 21                             # real chunk rows (last step padded)
    start = ctx_len

    k_ctx = jnp.asarray(rng.normal(0, 1, (ctx_pad, f)), jnp.float32)
    v_ctx = jnp.asarray(rng.normal(0, 1, (ctx_pad, f)), jnp.float32)
    q = jnp.asarray(rng.normal(0, 1, (t_steps * p, hq, d)), jnp.float32)
    k_new = jnp.asarray(rng.normal(0, 1, (t_steps * p, hkv, d)),
                        jnp.float32)
    v_new = jnp.asarray(rng.normal(0, 1, (t_steps * p, hkv, d)),
                        jnp.float32)
    pos = np.full(t_steps * p, 10_000, np.int32)
    pos[:n] = np.arange(start, start + n)

    # Oracle: one-shot chunked prefill over the n real rows. Its k_flat
    # prefix must be ONLY the real pool tokens (it masks by count).
    want = flat_prefill_attention(
        q[:n], k_ctx[:ctx_len], v_ctx[:ctx_len],
        jnp.asarray(pos[:n]), jnp.asarray(start + n),
        k_new[:n], v_new[:n], hkv=hkv, scale=0.25)

    win_k = jnp.zeros((t_steps, p, hkv, d), jnp.float32)
    win_v = jnp.zeros_like(win_k)
    outs = []
    for t in range(t_steps):
        sl = slice(t * p, (t + 1) * p)
        win_k = win_k.at[t].set(k_new[sl])
        win_v = win_v.at[t].set(v_new[sl])
        out = flat_prefill_window_attention(
            q[sl], k_ctx, v_ctx, jnp.asarray(ctx_len),
            win_k, win_v, jnp.asarray(t), jnp.asarray(start),
            jnp.asarray(n), k_new[sl], v_new[sl],
            jnp.asarray(pos[sl]), hkv=hkv, scale=0.25)
        outs.append(np.asarray(out))
    got = np.concatenate(outs, axis=0)[:n]
    np.testing.assert_allclose(got, np.asarray(want), rtol=2e-5,
                               atol=2e-5)


def test_window_attention_sliding_oracle():
    import jax.numpy as jnp

    from ferrum_tpu.ops.attention import (
        flat_prefill_attention, flat_prefill_window_attention,
    )

    rng = np.random.default_rng(1)
    hq, hkv, d = 2, 1, 8
    f = hkv * d
    ctx_pad, ctx_len = 16, 11
    t_steps, p, n = 2, 8, 16
    start, sw = ctx_len, 7

    k_ctx = jnp.asarray(rng.normal(0, 1, (ctx_pad, f)), jnp.float32)
    v_ctx = jnp.asarray(rng.normal(0, 1, (ctx_pad, f)), jnp.float32)
    q = jnp.asarray(rng.normal(0, 1, (n, hq, d)), jnp.float32)
    k_new = jnp.asarray(rng.normal(0, 1, (n, hkv, d)), jnp.float32)
    v_new = jnp.asarray(rng.normal(0, 1, (n, hkv, d)), jnp.float32)
    pos = np.arange(start, start + n, dtype=np.int32)

    want = flat_prefill_attention(
        q, k_ctx[:ctx_len], v_ctx[:ctx_len], jnp.asarray(pos),
        jnp.asarray(start + n), k_new, v_new, hkv=hkv, scale=0.3,
        sliding_window=sw)

    win_k = jnp.zeros((t_steps, p, hkv, d), jnp.float32)
    win_v = jnp.zeros_like(win_k)
    outs = []
    for t in range(t_steps):
        sl = slice(t * p, (t + 1) * p)
        win_k = win_k.at[t].set(k_new[sl])
        win_v = win_v.at[t].set(v_new[sl])
        out = flat_prefill_window_attention(
            q[sl], k_ctx, v_ctx, jnp.asarray(ctx_len),
            win_k, win_v, jnp.asarray(t), jnp.asarray(start),
            jnp.asarray(n), k_new[sl], v_new[sl],
            jnp.asarray(pos[sl]), hkv=hkv, scale=0.3, sliding_window=sw)
        outs.append(np.asarray(out))
    got = np.concatenate(outs, axis=0)
    np.testing.assert_allclose(got, np.asarray(want), rtol=2e-5,
                               atol=2e-5)
