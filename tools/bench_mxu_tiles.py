#!/usr/bin/env python
"""Tile sweep for the MXU-assisted-unpack decode kernel at the fused
Llama-8B decode shapes (m=32): the kernel is DMA/grid-bound, so tile
geometry IS the efficiency knob.

Measurement methodology (NOTES_ROUND4 + this round):
  * A single sub-128 MiB weight gets PINNED in VMEM across scan
    iterations — fake TB/s. Production streams 32 DIFFERENT layers'
    weights per step, so the probe chains calls over N_W=24 distinct
    weight tensors (1.4 GiB for gate_up: nothing can pin).
  * The transport dedupes identical dispatches and has ~30 ms RTT:
    per-call time is the SLOPE between a 1-pass and 3-pass program
    (python-unrolled inside one jit; fresh x per timed call).

Prints GB/s of packed-weight stream per (shape, bkb, bn).
Run on the chip: python tools/bench_mxu_tiles.py
Env: SHAPES=gate_up,down  CONFIGS=1024:2048,2048:2048,2048:4096  M=32
"""

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
from ferrum_tpu.ops.quant import QuantLinearParams  # noqa: E402

RNG = np.random.default_rng(0)
ALL_SHAPES = {"qkv": (4096, 6144), "o": (4096, 4096),
              "gate_up": (4096, 28672), "down": (14336, 4096)}
# 6 distinct weights x 58 MB (gate_up) = 350 MB streamed per pass —
# above the ~224 MB VMEM-pinning threshold, while keeping the traced
# program small (the 24-weight variant ground >25 min in host tracing).
N_W = int(os.environ.get("NW", "6"))


def rand_params(in_f, out_f, key):
    # Direct packed random init (content irrelevant for bandwidth).
    k1, k2 = jax.random.split(key)
    packed = jax.random.bits(k1, (in_f // 2, out_f), dtype=jnp.uint8)
    g = in_f // 128
    return QuantLinearParams(
        qweight=packed,
        scales=jnp.full((g, out_f), 0.01, jnp.bfloat16),
        zeros=jnp.full((g, out_f), 8, jnp.int8),
        bias=None, in_features=in_f, out_features=out_f, group_size=128,
        scales2=jnp.full((g, out_f), 15, jnp.int8),
        chan_scale=jnp.full((1, out_f), 0.01 / 15.0, jnp.float32))


def measure(in_f, out_f, m, bkb, bn):
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, N_W)
    ps = [rand_params(in_f, out_f, k) for k in keys]

    def one(x, p):
        xq, xs = quantize_activation_rows(x)
        out = _quant_matmul_w4a8tl_mxu(xq, xs, p, jnp.bfloat16,
                                       bkb=bkb, bn=bn)
        if out is None:
            raise ValueError("does not tile")
        return out

    def make_chain(n_pass):
        # Weights as ARGUMENTS, not closures: a closed-over device
        # array becomes an HLO constant and the remote-compile request
        # ships it (observed HTTP 413 at 350 MB of constants).
        @jax.jit
        def chain(x, ws):
            for _ in range(n_pass):
                for p in ws:
                    y = one(x, p)
                    x = x * jnp.bfloat16(0.99) + (
                        y[:, :in_f] if out_f >= in_f
                        else jnp.pad(y, ((0, 0), (0, in_f - out_f)))
                    ) * jnp.bfloat16(1e-3)
            return x
        return chain

    def total(chain):
        xs_in = [jnp.asarray(RNG.normal(0, 1, (m, in_f)), jnp.bfloat16)
                 for _ in range(3)]
        np.asarray(chain(xs_in[0], ps))              # compile + warm
        ts = []
        for x in xs_in[1:]:
            t0 = time.perf_counter()
            np.asarray(chain(x, ps))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1 = total(make_chain(1))
    t3 = total(make_chain(3))
    per_call = (t3 - t1) / (2 * N_W)
    del ps
    return per_call


def main():
    print("backend:", jax.default_backend(), flush=True)
    m = int(os.environ.get("M", "32"))
    names = os.environ.get("SHAPES", "gate_up,down").split(",")
    configs = [tuple(int(v) for v in c.split(":")) for c in os.environ.get(
        "CONFIGS", "1024:2048,2048:2048,2048:4096").split(",")]
    best = {}
    for name in names:
        in_f, out_f = ALL_SHAPES[name]
        packed = in_f * out_f // 2
        for bkb, bn in configs:
            if (in_f // 2) % bkb or out_f % bn:
                print(f"{name} bkb={bkb} bn={bn}: skip (tiling)",
                      flush=True)
                continue
            try:
                dt = measure(in_f, out_f, m, bkb, bn)
            except Exception as e:
                print(f"{name} bkb={bkb} bn={bn}: {type(e).__name__}: {e}",
                      flush=True)
                continue
            gbs = packed / dt / 1e9
            print(f"{name:8s} m={m} bkb={bkb:5d} bn={bn:5d}: "
                  f"{dt*1e6:7.1f} us  {gbs:6.0f} GB/s", flush=True)
            if name not in best or dt < best[name][0]:
                best[name] = (dt, bkb, bn, gbs)
    print("--- best ---")
    for name, (dt, bkb, bn, gbs) in best.items():
        print(f"{name:8s}: bkb={bkb} bn={bn}  {dt*1e6:.1f} us  "
              f"{gbs:.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
