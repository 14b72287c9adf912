#!/usr/bin/env python
"""Per-call cost of the decode-m (m=32) quant matmul at the fused
llama-8B shapes, against each shape's pure weight-stream bound.

The step decomposition (gates/perf/*-step-decomposition.json) shows
the decode step is 100% trunk matmuls at ~35% of the stream bound;
this probe splits that 35% into per-call fixed overhead vs streaming.
Methodology: on-device inputs from scalar seeds, weights as jit args,
2-vs-16-pass slope over 4 distinct weights per shape.
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

cache = os.path.expanduser("~/.cache/ferrum-tpu/xla-cache")
os.makedirs(cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from ferrum_tpu.ops.pallas import quant_matmul as qm  # noqa: E402
from ferrum_tpu.ops.quant import QuantLinearParams  # noqa: E402

N_W = 4
SHAPES = [("qkv", 4096, 6144), ("o", 4096, 4096),
          ("gate_up", 4096, 28672), ("down", 14336, 4096)]


def rand_tl(in_f, out_f, key):
    g = in_f // 128
    return QuantLinearParams(
        qweight=jax.random.bits(key, (in_f // 2, out_f), dtype=jnp.uint8),
        scales=jnp.full((g, out_f), 0.01, jnp.bfloat16),
        zeros=jnp.full((g, out_f), 8, jnp.int8), bias=None,
        in_features=in_f, out_features=out_f, group_size=128,
        scales2=jnp.full((g, out_f), 15, jnp.int8),
        chan_scale=jnp.full((1, out_f), 0.01 / 15.0, jnp.float32))


def measure(m, in_f, out_f, n1=2, n2=16):
    keys = jax.random.split(jax.random.PRNGKey(0), N_W)
    ws = [rand_tl(in_f, out_f, k) for k in keys]

    def one(x, p):
        xq, xs = qm.quantize_activation_rows(x)
        out = qm._quant_matmul_w4a8tl_mxu(xq, xs, p, jnp.bfloat16)
        assert out is not None
        return out

    def make(n_pass):
        @jax.jit
        def chain(seed, ws_):
            x = jax.random.normal(jax.random.PRNGKey(seed), (m, in_f),
                                  jnp.bfloat16)
            for _ in range(n_pass):
                for p in ws_:
                    y = one(x, p)
                    x = x * jnp.bfloat16(0.99) + (
                        y[:, :in_f] if out_f >= in_f
                        else jnp.pad(y, ((0, 0), (0, in_f - out_f)))
                    ) * jnp.bfloat16(1e-3)
            return x[0, :8]
        return chain

    def total(chain):
        np.asarray(chain(0, ws))
        ts = []
        for s in (1, 2, 3):
            t0 = time.perf_counter()
            np.asarray(chain(s, ws))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1, t2 = total(make(n1)), total(make(n2))
    return (t2 - t1) / ((n2 - n1) * N_W)


def main():
    print("backend:", jax.default_backend(), flush=True)
    m = int(os.environ.get("M", "32"))
    qm.set_w4a8(True)
    qm.set_w4a8_gd("mxu")
    tot = tot_bound = 0.0
    for name, in_f, out_f in SHAPES:
        packed_mb = in_f * out_f / 2 / 2**20
        bound_us = packed_mb * 2**20 / 819e9 * 1e6
        try:
            dt = measure(m, in_f, out_f)
        except Exception as e:
            print(f"{name}: {type(e).__name__}: {str(e)[:140]}", flush=True)
            continue
        tot += dt
        tot_bound += bound_us * 1e-6
        print(f"{name:8s} m={m}: {dt*1e6:7.1f} us/call  "
              f"stream-bound {bound_us:6.1f} us  "
              f"overhead {dt*1e6 - bound_us:6.1f} us  "
              f"({packed_mb/dt/1024*1e-0:6.0f} MB/ms = "
              f"{packed_mb*2**20/dt/1e9:4.0f} GB/s)", flush=True)
    if tot:
        print(f"layer total: {tot*1e6:.0f} us vs bound {tot_bound*1e6:.0f}"
              f" -> 32 layers {32*tot*1e3:.1f} ms/step vs bound "
              f"{32*tot_bound*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
