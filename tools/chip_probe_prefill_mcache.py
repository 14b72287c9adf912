#!/usr/bin/env python
"""Chip A/B: prep-cached m-innermost prefill kernel (tl2d_mcache) vs
the base tl2d kernel at batched-prefill sizes (m=2048, llama-8B
shapes). Methodology per this round's postmortem: weights passed as
jit ARGUMENTS (closures embed as HLO constants → HTTP 413), several
distinct weights, and enough chained passes that the per-call delta
clears the ~±5 ms transport noise.
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


def rand_tl(in_f, out_f, key):
    g = in_f // 128
    return QuantLinearParams(
        qweight=jax.random.bits(key, (in_f // 2, out_f), dtype=jnp.uint8),
        scales=jnp.full((g, out_f), 0.01, jnp.bfloat16),
        zeros=jnp.full((g, out_f), 8, jnp.int8), bias=None,
        in_features=in_f, out_features=out_f, group_size=128,
        scales2=jnp.full((g, out_f), 15, jnp.int8),
        chan_scale=jnp.full((1, out_f), 0.01 / 15.0, jnp.float32))


def measure(impl, m, in_f, out_f, n1=1, n2=4):
    keys = jax.random.split(jax.random.PRNGKey(0), N_W)
    ws = [rand_tl(in_f, out_f, k) for k in keys]

    def one(x, p):
        xq, xs = qm.quantize_activation_rows(x)
        out = impl(xq, xs, p, jnp.bfloat16)
        assert out is not None
        return out

    def make(n_pass):
        # Input built ON DEVICE from a scalar seed: a fresh 16 MB host
        # x per timed call costs 100s of ms of tunnel upload — the
        # very delta being measured drowns in it (observed negative
        # slopes). The seed arg defeats the transport dedupe; the
        # single final row readback keeps sync cost flat.
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
    m = int(os.environ.get("M", "2048"))
    shapes = [(4096, 14336), (14336, 4096)]
    for in_f, out_f in shapes:
        flops = 2 * m * in_f * out_f
        res = {}
        for name, impl in (("base", qm._quant_matmul_w4a8tl_2d),
                           ("mcache", qm._quant_matmul_w4a8tl_2d_mcache)):
            try:
                dt = measure(impl, m, in_f, out_f)
            except Exception as e:
                print(f"{name} {in_f}x{out_f}: {type(e).__name__}: "
                      f"{str(e)[:140]}", flush=True)
                continue
            res[name] = dt
            print(f"{name:6s} m={m} {in_f}x{out_f}: {dt*1e6:7.0f} us  "
                  f"{flops/dt/1e12:5.1f} TOP/s "
                  f"({flops/dt/394e12*100:4.0f}% int8 peak)", flush=True)
        if len(res) == 2:
            print(f"  -> mcache speedup {res['base']/res['mcache']:.2f}x",
                  flush=True)


if __name__ == "__main__":
    main()
