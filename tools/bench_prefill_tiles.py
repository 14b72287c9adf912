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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
    out = qmm._quant_matmul_w4a8tl_2d(xq, xs, p, jnp.bfloat16,
                                      bn=bn, bm=bm)
    assert out is not None
    return out


if __name__ == "__main__":
    main()
