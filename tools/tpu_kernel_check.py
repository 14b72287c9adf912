#!/usr/bin/env python
"""Compiled-on-TPU kernel parity + microbench (run manually on hardware).

CI runs the same parity asserts in interpreter mode
(tests/test_pallas_kernels.py); this script is the hardware leg:
compiled Mosaic kernels vs jnp reference, plus bandwidth accounting
against speed-of-light.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


def check_decode_attention():
    from ferrum_tpu.ops.attention import paged_decode_attention_ref
    from ferrum_tpu.ops.pallas.paged_attention import paged_decode_attention

    rng = np.random.default_rng(0)
    s, hq, hkv, d, page, nb, maxp = 32, 32, 8, 128, 32, 512, 32
    lens = rng.integers(1, maxp * page, s).astype(np.int32)
    q = jnp.asarray(rng.normal(0, 1, (s, hq, d)), jnp.bfloat16)
    kc = jnp.asarray(rng.normal(0, 1, (nb, page, hkv, d)), jnp.bfloat16)
    vc = jnp.asarray(rng.normal(0, 1, (nb, page, hkv, d)), jnp.bfloat16)
    tables = np.zeros((s, maxp), np.int32)
    used = 1
    for i in range(s):
        n = -(-int(lens[i]) // page)
        blocks = (np.arange(used, used + n) % (nb - 1)) + 1
        tables[i, :n] = blocks
        used += n
    tables = jnp.asarray(tables)
    lensj = jnp.asarray(lens)

    got = paged_decode_attention(q, kc, vc, tables, lensj, scale=0.088)
    want = paged_decode_attention_ref(
        q.astype(jnp.float32), kc.astype(jnp.float32),
        vc.astype(jnp.float32), tables, lensj,
        ctx_pad=maxp * page, scale=0.088)
    err = np.abs(np.asarray(got, np.float32) - np.asarray(want)).max()
    rel = err / max(np.abs(np.asarray(want)).max(), 1e-9)
    print(f"decode attention parity: max abs err {err:.4f} rel {rel:.4f}")
    assert rel < 2e-2, "bf16 parity failure"

    # Microbench: tokens read = sum(lens) pages
    f = jax.jit(lambda *a: paged_decode_attention(*a, scale=0.088))
    f(q, kc, vc, tables, lensj).block_until_ready()
    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(q, kc, vc, tables, lensj)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    pages_read = sum(-(-int(x) // page) for x in lens)
    bytes_moved = pages_read * page * hkv * d * 2 * 2  # K+V bf16
    print(f"decode attention: {dt*1e3:.3f} ms, "
          f"{bytes_moved/1e6:.1f} MB -> {bytes_moved/dt/1e9:.0f} GB/s")
    return dt


def check_hbm_roofline():
    """Reference: achievable HBM bandwidth via big-array reduction."""
    x = jnp.ones((1024, 1024, 512), jnp.bfloat16)  # 1 GiB
    f = jax.jit(lambda x: jnp.sum(x, axis=(0, 1)))
    f(x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(10):
        y = f(x)
    y.block_until_ready()
    dt = (time.perf_counter() - t0) / 10
    print(f"HBM roofline (1GiB sum): {dt*1e3:.2f} ms -> "
          f"{x.nbytes/dt/1e9:.0f} GB/s")


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices())
    check_hbm_roofline()
    check_decode_attention()
