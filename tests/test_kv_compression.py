"""KV compression strategy family (kv/compression.py) — ref:
crates/ferrum-kv/src/cache/compression.rs Int4/Fp8 prototypes."""

import numpy as np
import pytest

from ferrum_tpu.kv.compression import make_strategy


def block(seed=0, t=16, h=4, d=32, dtype=np.float32):
    rng = np.random.default_rng(seed)
    return (rng.normal(0, 1.5, (t, h, d)) * rng.uniform(
        0.1, 4.0, (t, h, 1))).astype(dtype)


def test_none_roundtrip_exact():
    s = make_strategy("none")
    b = block()
    c = s.compress(b)
    np.testing.assert_array_equal(s.decompress(c), b)
    assert c.nbytes == b.nbytes


@pytest.mark.parametrize("name,ratio,tol", [
    ("int8", 2.0, 0.012),    # 1/127 per-row relative
    ("int4", 4.0, 0.16),     # 1/7
    ("fp8", 2.0, 0.08),      # e4m3 ~2^-3 relative
])
def test_quant_roundtrip_error_bounds(name, ratio, tol):
    s = make_strategy(name)
    b = block(seed=1)
    c = s.compress(b)
    got = s.decompress(c)
    assert got.shape == b.shape and got.dtype == b.dtype
    # per-(token, head) relative error vs that row's max magnitude
    amax = np.abs(b).max(axis=-1, keepdims=True)
    rel = np.abs(got - b) / amax
    assert rel.max() < tol, rel.max()
    # real size ratio ≥ claimed ratio minus scale overhead
    assert b.nbytes / c.nbytes > ratio * 0.8
    assert s.compression_ratio() == ratio


def test_int8_matches_wired_kv_layout():
    """The int8 strategy's payload equals the production int8-KV
    quantization (models/llama_family.quantize_kv), so offloaded
    blocks re-upload without requantization."""
    import jax.numpy as jnp
    from ferrum_tpu.models.llama_family import quantize_kv

    b = block(seed=2)
    c = make_strategy("int8").compress(b)
    q, scale = quantize_kv(jnp.asarray(b))
    np.testing.assert_array_equal(np.asarray(q), c.data)
    np.testing.assert_allclose(np.asarray(scale), c.scale, rtol=1e-6)


def test_unknown_strategy_rejected():
    with pytest.raises(ValueError):
        make_strategy("zstd")
