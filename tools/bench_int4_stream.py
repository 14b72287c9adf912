#!/usr/bin/env python
"""Decode-m int4 weight-stream shootout (VERDICT r3 #2).

Question: what dequant+matmul structure streams int4 weights fastest
at decode m on v5e? The 2d TL kernel measures ~330 GB/s effective —
VPU-unpack-bound, not HBM-bound (BASELINE target: speed of light).

Variants measured with the chained-scan slope method (fresh input per
iteration via data dependence; weights intentionally loop-INVARIANT —
that IS the decode pattern; >16 MB tensors stay in HBM so the stream
is re-paid each step):

  tl2d     current production kernel (integer dequant per weight elem)
  gd       group-dot kernel (raw nibbles to MXU, output-side rescale)
  xla_i4   jnp.int4 storage, XLA dot: x8 @ w4.astype(int8) — measures
           Mosaic/XLA's native int4 handling as a possible unpack-free
           path (scales folded per-channel on the output for the
           bandwidth bound; NOT group-exact)
  xla_i8   int8 weights straight dot (2x bytes; VPU-free reference)
  bf16     plain bf16 dot (4x bytes reference)

Prints GB/s of int4-equivalent weight bytes per variant.
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
try:
    jax.config.update("jax_compilation_cache_dir", _cache)
except Exception:
    pass

from ferrum_tpu.ops.quant import make_quant_linear, requantize_two_level
from ferrum_tpu.ops.pallas.quant_matmul import (
    quant_matmul_w4a8tl, quantize_activation_rows,
)

RNG = np.random.default_rng(0)


def chain_time(fn, x0, n_iters: int):
    """Seconds per iteration via two chain lengths (RTT cancels)."""

    def chained(x, n):
        def body(c, _):
            y = fn(c)
            # Fold output back into an input-shaped carry: data
            # dependence defeats transport dedupe + hoisting of fn.
            c2 = (c + y[:, : x.shape[1]].astype(c.dtype)
                  if y.shape[1] >= x.shape[1]
                  else c.at[:, : y.shape[1]].add(y.astype(c.dtype)))
            return c2, ()
        out, _ = jax.lax.scan(body, x, None, length=n)
        return out

    f_short = jax.jit(functools.partial(chained, n=n_iters // 4))
    f_long = jax.jit(functools.partial(chained, n=n_iters))
    for f in (f_short, f_long):
        np.asarray(f(x0))                      # compile + warm
    t0 = time.perf_counter()
    np.asarray(f_short(x0))
    t_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(f_long(x0))
    t_l = time.perf_counter() - t0
    return (t_l - t_s) / (n_iters - n_iters // 4)


def main() -> None:
    m = int(os.environ.get("M", "64"))
    k = int(os.environ.get("K", "4096"))
    n = int(os.environ.get("N", "14336"))
    iters = int(os.environ.get("ITERS", "64"))
    int4_bytes = k * n // 2

    w = RNG.normal(0, 0.05, (k, n)).astype(np.float32)
    p = requantize_two_level(
        make_quant_linear(w, group_size=128, dtype=jnp.bfloat16))
    x_bf = jnp.asarray(RNG.normal(0, 1, (m, k)), jnp.bfloat16)

    results = {}

    # -- production TL kernel (and gd variant) -------------------------
    def run_tl(gd):
        def f(x):
            return quant_matmul_w4a8tl(x, p, gd=gd)
        return chain_time(f, x_bf, iters)

    results["tl2d"] = run_tl(False)
    results["gd"] = run_tl(True)

    # -- XLA native int4 ----------------------------------------------
    w8 = np.clip(np.round(w / np.abs(w).max() * 7), -8, 7).astype(np.int8)
    try:
        w4 = jnp.asarray(w8, jnp.int4)
        chan = jnp.asarray(np.abs(w).max() / 7, jnp.float32)

        def f_i4(x):
            xq, xs = quantize_activation_rows(x)
            acc = jax.lax.dot(xq, w4.astype(jnp.int8),
                              preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * xs * chan).astype(jnp.bfloat16)

        results["xla_i4"] = chain_time(f_i4, x_bf, iters)
    except Exception as e:  # int4 unsupported on this stack
        print(f"# xla_i4 unavailable: {e!r}", flush=True)

    # -- int8 / bf16 references ---------------------------------------
    w8j = jnp.asarray(w8)

    def f_i8(x):
        xq, xs = quantize_activation_rows(x)
        acc = jax.lax.dot(xq, w8j, preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * xs).astype(jnp.bfloat16)

    results["xla_i8"] = chain_time(f_i8, x_bf, iters)

    wb = jnp.asarray(w, jnp.bfloat16)
    results["bf16"] = chain_time(lambda x: x @ wb, x_bf, iters)

    print(f"m={m} k={k} n={n} int4_bytes={int4_bytes / 2**20:.1f} MiB")
    for name, t in results.items():
        print(f"  {name:8s} {t * 1e3:7.3f} ms/call  "
              f"{int4_bytes / t / 2**30:7.1f} GiB/s (int4-equivalent)",
              flush=True)


if __name__ == "__main__":
    main()
