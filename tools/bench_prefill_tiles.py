#!/usr/bin/env python
"""Prefill-size tile sweep for the two-level w4a8 kernel.

Hypothesis: at batched-prefill sizes (m = B*T up to 2048) the grid
(m/bm, n/bn, K) with bm=256 re-executes the in-kernel integer weight
prep once PER M-TILE — 8x redundant VPU work at m=2048, which is why
prefill sits near 27% of the int8 MXU peak. Larger bm amortizes the
prep (1 m-tile => prep exactly once per weight block).

Chained-scan slope methodology per tools/bench_w4a8.py.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

_cache = os.path.expanduser("~/.cache/ferrum-tpu/xla-cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from ferrum_tpu.ops.quant import make_quant_linear, requantize_two_level
from ferrum_tpu.ops.pallas import quant_matmul as qmm

RNG = np.random.default_rng(0)


def slope_time(fn, m, in_f, n1=4, n2=16):
    def total(iters):
        @jax.jit
        def chain(x):
            def body(x, _):
                y = fn(x)
                return x * jnp.bfloat16(0.99) + (
                    y[:, :in_f] if y.shape[1] >= in_f
                    else jnp.pad(y, ((0, 0), (0, in_f - y.shape[1])))
                ) * jnp.bfloat16(1e-3), ()
            x, _ = jax.lax.scan(body, x, None, length=iters)
            return x
        xs = [jnp.asarray(RNG.normal(0, 1, (m, in_f)), jnp.bfloat16)
              for _ in range(3)]
        np.asarray(chain(xs[0]))
        ts = []
        for x in xs[1:]:
            t0 = time.perf_counter()
            np.asarray(chain(x))
            ts.append(time.perf_counter() - t0)
        return min(ts)
    t1, t2 = total(n1), total(n2)
    return (t2 - t1) / (n2 - n1)


def main():
    print("backend:", jax.default_backend(), flush=True)
    m = int(os.environ.get("M", "2048"))
    shapes = [(4096, 4096), (4096, 14336), (14336, 4096)]
    for in_f, out_f in shapes:
        w = RNG.normal(0, 0.05, (in_f, out_f)).astype(np.float32)
        p = requantize_two_level(
            make_quant_linear(w, group_size=128, dtype=jnp.bfloat16))
        flops = 2 * m * in_f * out_f
        for bm, bn in [(256, 512), (512, 512), (1024, 512), (2048, 256),
                       (2048, 512), (1024, 1024)]:
            if bm > m or out_f % bn or bn > out_f:
                continue
            try:
                dt = slope_time(lambda x: _call(x, p, bm, bn), m, in_f)
                print(f"m={m} {in_f}x{out_f} bm={bm} bn={bn}: "
                      f"{dt*1e6:.0f} us  {flops/dt/1e12:.1f} TOP/s  "
                      f"({flops/dt/394e12*100:.0f}% int8 peak)", flush=True)
            except Exception as e:
                print(f"m={m} {in_f}x{out_f} bm={bm} bn={bn}: FAIL "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)


def _call(x, p, bm, bn):
    xq, xs = qmm.quantize_activation_rows(x)
    out = _2d_with_bm(xq, xs, p, jnp.bfloat16, None, bn, bm)
    assert out is not None
    return out


def _2d_with_bm(xq, xs, p, out_dtype, bkb, bn, bm):
    """Copy of _quant_matmul_w4a8tl_2d with an explicit bm."""
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    GROUP = qmm.GROUP
    m, k = xq.shape
    n = p.out_features
    if bkb is None:
        bkb = 512
        while bkb >= GROUP and (k // 2) % bkb:
            bkb //= 2
    if bn is None:
        bn = 512
        while bn > 128 and n % bn:
            bn //= 2
    n_k = (k // 2) // bkb
    half_groups = (k // 2) // GROUP
    qs3 = p.scales2.reshape(-1, 1, n)
    z3 = p.zeros.reshape(-1, 1, n)
    chan = p.chan_scale.astype(jnp.float32).reshape(1, n)
    kernel = functools.partial(
        qmm._qmm_w4a8tl_kernel, n_k_steps=n_k, half_groups=half_groups,
        bn=bn, gpt=bkb // GROUP, out_dtype=out_dtype)
    return pl.pallas_call(
        kernel,
        grid=(m // bm, n // bn, n_k),
        in_specs=[
            pl.BlockSpec((bm, bkb), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bkb),
                         lambda i, j, kk, nk=n_k: (i, nk + kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j, kk: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bkb, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=p.qweight.nbytes + xq.nbytes + 2 * m * n,
            transcendentals=0),
    )(xq, xq, xs, p.qweight, qs3, z3, chan)


if __name__ == "__main__":
    main()
