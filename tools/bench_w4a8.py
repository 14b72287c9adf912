#!/usr/bin/env python
"""w4a8 vs w4a16 quant-matmul on real TPU: compiled parity + chained
microbench.

Measurement methodology for the axon transport (see NOTES_ROUND1.md):
the transport dedupes whole executions with identical args AND has a
~32 ms dispatch/readback RTT. So every timed call uses a FRESH input
and a host readback, iterations are chained inside one program
(lax.scan with data dependence), and the per-iteration cost is the
SLOPE between two chain lengths — the fixed RTT cancels.

Shapes are the Llama-8B decode hot set at c=32.
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

from ferrum_tpu.ops.quant import (
    make_quant_linear, quant_matmul_w4a8_ref, quant_matmul_w4a8tl_ref,
    requantize_two_level,
)
from ferrum_tpu.ops.pallas.quant_matmul import (
    quant_matmul_w4a16, quant_matmul_w4a8, quant_matmul_w4a8tl,
)

RNG = np.random.default_rng(0)


def parity(m=32, in_f=1024, out_f=512):
    w = RNG.normal(0, 0.05, (in_f, out_f)).astype(np.float32)
    x = jnp.asarray(RNG.normal(0, 1, (m, in_f)), jnp.bfloat16)
    p = make_quant_linear(w, group_size=128, dtype=jnp.bfloat16)
    got = np.asarray(jax.jit(quant_matmul_w4a8)(x, p), np.float32)
    want = np.asarray(quant_matmul_w4a8_ref(x, p), np.float32)
    scale = np.abs(want).max()
    err = np.abs(got - want).max() / scale
    print(f"w4a8 compiled parity (m={m} {in_f}x{out_f}): rel err {err:.5f}")
    assert err < 2e-2, err


def parity_tl(m=48, in_f=1024, out_f=512):
    w = RNG.normal(0, 0.05, (in_f, out_f)).astype(np.float32)
    x = jnp.asarray(RNG.normal(0, 1, (m, in_f)), jnp.bfloat16)
    p = requantize_two_level(
        make_quant_linear(w, group_size=128, dtype=jnp.bfloat16))
    got = np.asarray(jax.jit(quant_matmul_w4a8tl)(x, p), np.float32)
    want = np.asarray(quant_matmul_w4a8tl_ref(x, p), np.float32)
    scale = np.abs(want).max()
    err = np.abs(got - want).max() / scale
    print(f"w4a8tl compiled parity (m={m} {in_f}x{out_f}): rel err {err:.5f}")
    assert err < 2e-2, err


def slope_time(fn, m, in_f, out_f, n1=16, n2=128, two_level=False):
    """Per-iteration seconds via two-length chained scan slope."""
    w = RNG.normal(0, 0.05, (in_f, out_f)).astype(np.float32)
    p = make_quant_linear(w, group_size=128, dtype=jnp.bfloat16)
    if two_level:
        p = requantize_two_level(p)

    def total(iters):
        @jax.jit
        def chain(x):
            def body(x, _):
                y = fn(x, p)
                # fold y back into a fresh x (data dependence, stable
                # magnitude) — n-dependent slice keeps shapes equal
                return x * jnp.bfloat16(0.99) + (
                    y[:, :in_f] if out_f >= in_f
                    else jnp.pad(y, ((0, 0), (0, in_f - out_f)))
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


def bench(fn, name, m, in_f, out_f, two_level=False):
    n1, n2 = (16, 128) if m <= 256 else (4, 24)
    dt = slope_time(fn, m, in_f, out_f, n1=n1, n2=n2, two_level=two_level)
    packed = in_f * out_f // 2
    flops = 2 * m * in_f * out_f
    print(f"{name} m={m} {in_f}x{out_f}: {dt*1e6:.1f} us  "
          f"packed-stream {packed/dt/1e9:.0f} GB/s  "
          f"{flops/dt/1e12:.1f} TFLOP/s")
    return dt


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices())
    parity()
    parity_tl()
    ms = [int(v) for v in (sys.argv[1].split(",") if len(sys.argv) > 1
                           else ["32", "256", "2048"])]
    shapes = [(4096, 4096), (4096, 14336), (14336, 4096),
              (4096, 2 * 14336)]
    for m in ms:
        tot16 = tot8 = tottl = 0.0
        for in_f, out_f in shapes:
            tot16 += bench(quant_matmul_w4a16, "w4a16 ", m, in_f, out_f)
            tot8 += bench(quant_matmul_w4a8, "w4a8  ", m, in_f, out_f)
            tottl += bench(quant_matmul_w4a8tl, "w4a8tl", m, in_f, out_f,
                           two_level=True)
        print(f"m={m}: w4a16 {tot16*1e3:.3f} ms, w4a8 {tot8*1e3:.3f} ms, "
              f"w4a8tl {tottl*1e3:.3f} ms "
              f"(tl vs w4a16 {tot16/tottl:.2f}x)")
