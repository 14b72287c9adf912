#!/usr/bin/env python
"""Tile sweep for the MXU-assisted-unpack decode kernel at the fused
Llama-8B decode shapes (m=32): the kernel is DMA/grid-bound, so tile
geometry IS the efficiency knob. Methodology per NOTES_ROUND4: fresh
inputs per timed call, chained scan, two-length slope (RTT cancels).

Shapes (fused projections, the per-layer decode hot set):
  qkv      4096 ->  6144
  o        4096 ->  4096
  gate_up  4096 -> 28672
  down    14336 ->  4096

Prints GB/s of packed-weight stream per (shape, bkb, bn) and the best
config per shape. Run on the chip: python tools/bench_mxu_tiles.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

_cache = os.path.expanduser("~/.cache/ferrum-tpu/xla-cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from ferrum_tpu.ops.pallas.quant_matmul import (  # noqa: E402
    _quant_matmul_w4a8tl_mxu, quantize_activation_rows,
)
from ferrum_tpu.ops.quant import (  # noqa: E402
    make_quant_linear, requantize_two_level,
)

RNG = np.random.default_rng(0)
SHAPES = [("qkv", 4096, 6144), ("o", 4096, 4096),
          ("gate_up", 4096, 28672), ("down", 14336, 4096)]


def slope_time(p, m, in_f, bkb, bn, n1=8, n2=64):
    def impl(x):
        xq, xs = quantize_activation_rows(x)
        out = _quant_matmul_w4a8tl_mxu(xq, xs, p, jnp.bfloat16,
                                       bkb=bkb, bn=bn)
        if out is None:
            raise ValueError("shape does not tile")
        return out

    out_f = p.out_features

    def total(iters):
        @jax.jit
        def chain(x):
            def body(x, _):
                y = impl(x)
                return x * jnp.bfloat16(0.99) + (
                    y[:, :in_f] if out_f >= in_f
                    else jnp.pad(y, ((0, 0), (0, in_f - out_f)))
                ) * jnp.bfloat16(1e-3), ()
            x, _ = jax.lax.scan(body, x, None, length=iters)
            return x

        xs_in = [jnp.asarray(RNG.normal(0, 1, (m, in_f)), jnp.bfloat16)
                 for _ in range(3)]
        np.asarray(chain(xs_in[0]))
        ts = []
        for x in xs_in[1:]:
            t0 = time.perf_counter()
            np.asarray(chain(x))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1, t2 = total(n1), total(n2)
    return (t2 - t1) / (n2 - n1)


def main():
    print("backend:", jax.default_backend(), flush=True)
    m = int(os.environ.get("M", "32"))
    bkbs = [int(v) for v in os.environ.get(
        "BKB", "512,1024,2048").split(",")]
    bns = [int(v) for v in os.environ.get(
        "BN", "1024,2048,4096").split(",")]
    best = {}
    for name, in_f, out_f in SHAPES:
        w = RNG.normal(0, 0.05, (in_f, out_f)).astype(np.float32)
        p = requantize_two_level(
            make_quant_linear(w, group_size=128, dtype=jnp.bfloat16))
        packed = in_f * out_f // 2
        for bkb in bkbs:
            if (in_f // 2) % bkb:
                continue
            for bn in bns:
                if out_f % bn:
                    continue
                try:
                    dt = slope_time(p, m, in_f, bkb, bn)
                except Exception as e:
                    print(f"{name} bkb={bkb} bn={bn}: "
                          f"{type(e).__name__}: {e}", flush=True)
                    continue
                gbs = packed / dt / 1e9
                print(f"{name:8s} m={m} bkb={bkb:5d} bn={bn:5d}: "
                      f"{dt*1e6:7.1f} us  {gbs:6.0f} GB/s", flush=True)
                if name not in best or dt < best[name][0]:
                    best[name] = (dt, bkb, bn, gbs)
        del p
    print("--- best per shape ---")
    tot = 0.0
    for name, in_f, out_f in SHAPES:
        if name in best:
            dt, bkb, bn, gbs = best[name]
            tot += dt
            print(f"{name:8s}: bkb={bkb} bn={bn}  {dt*1e6:.1f} us  "
                  f"{gbs:.0f} GB/s")
    print(f"layer total (1x each): {tot*1e6:.1f} us -> "
          f"32 layers = {tot*32*1e3:.2f} ms/step")


if __name__ == "__main__":
    main()
