"""Pallas kernel parity vs jnp reference implementations (`_eq` pattern).

Kernels run in interpreter mode on CPU so CI stays hardware-free; the
same parity asserts run compiled on TPU via tools/tpu_kernel_check.py.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ferrum_tpu.ops.attention import paged_decode_attention_ref


def make_case(s=4, hq=8, hkv=4, d=128, page=16, nb=32, max_pages=8,
              lens=(5, 37, 1, 100), dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(0, 1, (s, hq, d)).astype(np.float32)
    kc = rng.normal(0, 1, (nb, page, hkv, d)).astype(np.float32)
    vc = rng.normal(0, 1, (nb, page, hkv, d)).astype(np.float32)
    tables = np.zeros((s, max_pages), np.int32)
    used = 1  # block 0 reserved as garbage
    for i in range(s):
        n = -(-lens[i] // page)
        tables[i, :n] = np.arange(used, used + n)
        used += n
    assert used <= nb
    return (jnp.asarray(q, dtype), jnp.asarray(kc, dtype),
            jnp.asarray(vc, dtype), jnp.asarray(tables),
            jnp.asarray(np.asarray(lens, np.int32)))


def run_both(q, kc, vc, tables, lens, scale=0.125, sliding_window=None,
             softcap=None, ctx_pad=128):
    from ferrum_tpu.ops.pallas import paged_attention as pa

    want = paged_decode_attention_ref(
        q, kc, vc, tables, lens, ctx_pad=ctx_pad, scale=scale,
        sliding_window=sliding_window, softcap=softcap)

    # Interpreter-mode pallas (CPU-safe).
    with jax.disable_jit():  # avoid jit wrapper around pallas interpret
        import jax.experimental.pallas as pl  # noqa: F401
        got = _interpret_call(pa, q, kc, vc, tables, lens, scale,
                              sliding_window, softcap)
    return np.asarray(got), np.asarray(want)


def _interpret_call(pa, q, kc, vc, tables, lens, scale, sliding_window,
                    softcap):
    """Invoke the kernel with interpret=True by monkeypatching
    pallas_call within the module call."""
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    pa.pl.pallas_call = patched
    try:
        return pa.paged_decode_attention(
            q, kc, vc, tables, lens, scale=scale,
            sliding_window=sliding_window, softcap=softcap)
    finally:
        pa.pl.pallas_call = orig


@pytest.mark.parametrize("lens", [(5, 37, 1, 100), (16, 32, 64, 128),
                                  (1, 1, 1, 1), (128, 3, 77, 50)])
def test_paged_decode_attention_eq(lens):
    q, kc, vc, tables, lensa = make_case(lens=lens)
    got, want = run_both(q, kc, vc, tables, lensa)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_paged_decode_attention_sliding_window_eq():
    q, kc, vc, tables, lens = make_case(lens=(40, 100, 7, 64), seed=1)
    got, want = run_both(q, kc, vc, tables, lens, sliding_window=24)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_paged_decode_attention_softcap_eq():
    q, kc, vc, tables, lens = make_case(lens=(12, 60, 33, 90), seed=2)
    got, want = run_both(q, kc, vc, tables, lens, softcap=30.0)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_paged_decode_attention_gqa_grouping():
    """rep=4 grouping: query head g must read kv head g // rep."""
    q, kc, vc, tables, lens = make_case(hq=8, hkv=2, seed=3,
                                        lens=(20, 44, 9, 70))
    got, want = run_both(q, kc, vc, tables, lens)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
