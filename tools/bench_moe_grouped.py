#!/usr/bin/env python
"""Grouped (MoE expert) int4 GEMM on real TPU: w4a16 vs two-level w4a8.

Shape = Qwen3-30B-A3B decode hot set at c=32: 64 experts, hidden 2048,
moe_intermediate 768, A = 32 tokens x top-8 = 256 assignments. Chained
two-length scan slope (see tools/bench_w4a8.py for the methodology —
the axon transport dedupes identical executions and has ~32 ms RTT).
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

from ferrum_tpu.ops.quant import QuantLinearParams, quantize_weight_np, \
    requantize_two_level
from ferrum_tpu.ops.pallas.quant_matmul import (
    _quant_grouped_2d, _quant_grouped_w4a8tl_2d, quantize_activation_rows,
)

RNG = np.random.default_rng(0)


def make_stack(e, in_f, out_f):
    qws, scs, zs = [], [], []
    for _ in range(e):
        w = RNG.normal(0, 0.05, (in_f, out_f)).astype(np.float32)
        qw, sc, z = quantize_weight_np(w, group_size=128, symmetric=True)
        qws.append(qw)
        scs.append(sc)
        zs.append(z)
    return QuantLinearParams(
        qweight=jnp.asarray(np.stack(qws)),
        scales=jnp.asarray(np.stack(scs), jnp.bfloat16),
        zeros=jnp.asarray(np.stack(zs)), bias=None,
        in_features=in_f, out_features=out_f, group_size=128)


def rand_group_sizes(e, a):
    ids = RNG.integers(0, e, a)
    return jnp.asarray(np.bincount(ids, minlength=e).astype(np.int32))


def slope(fn, make_x, n1=16, n2=96, tries=5):
    def total(iters):
        @jax.jit
        def chain(x):
            def body(x, _):
                y = fn(x)
                return x * jnp.bfloat16(0.999) + y * jnp.bfloat16(1e-3), ()
            x, _ = jax.lax.scan(body, x, None, length=iters)
            return x
        xs = [make_x() for _ in range(tries + 1)]
        chain(xs[0]).block_until_ready()
        ts = []
        for x in xs[1:]:
            t0 = time.perf_counter()
            chain(x).block_until_ready()
            ts.append(time.perf_counter() - t0)
        return min(ts)
    t1, t2 = total(n1), total(n2)
    print(f"  totals: n={n1} {t1*1e3:.1f} ms, n={n2} {t2*1e3:.1f} ms")
    return (t2 - t1) / (n2 - n1)


def main():
    print("backend:", jax.default_backend(), jax.devices())
    e, h, inter, a = 64, 2048, 768, 256
    gate = make_stack(e, h, inter)
    gate_tl = requantize_two_level(gate)
    gs = rand_group_sizes(e, a)
    n_active = int(np.count_nonzero(np.asarray(gs)))
    packed = gate.qweight.nbytes * n_active / e  # streamed bytes/call
    print(f"experts touched: {n_active}/{e}; "
          f"streamed packed {packed/1e6:.1f} MB/call")

    def mk():
        return jnp.asarray(RNG.normal(0, 1, (a, h)), jnp.bfloat16)

    def fold(y):
        return jnp.pad(y.astype(jnp.bfloat16), ((0, 0), (0, h - inter)))

    def w4a16(x):
        return fold(_quant_grouped_2d(x, gate, gs))

    def w4a8tl(x):
        xq, xs = quantize_activation_rows(x)
        return fold(_quant_grouped_w4a8tl_2d(
            xq, xs, gate_tl, gs, jnp.bfloat16))

    for name, fn in (("w4a16 ", w4a16), ("w4a8tl", w4a8tl)):
        dt = slope(fn, mk)
        print(f"{name} grouped E={e} {h}x{inter} A={a}: {dt*1e6:.1f} us "
              f"  stream {packed/dt/1e9:.0f} GB/s")


if __name__ == "__main__" and not os.environ.get("FULL_LAYER"):
    main()


def bench_full_layer():
    """Full moe_mlp layer (router + sort + gathers + 3 grouped kernels
    + combine) chained — captures the per-layer overhead the isolated
    kernel bench hides (metadata, sort, scatters)."""
    import jax
    import jax.numpy as jnp
    from ferrum_tpu.models.configs import preset
    from ferrum_tpu.models.llama_family import MoeLayerParams
    from ferrum_tpu.ops.linear import DenseLinearParams
    from ferrum_tpu.ops.moe import moe_mlp
    from ferrum_tpu.ops.pallas.quant_matmul import set_w4a8

    set_w4a8(True)
    cfg = preset("qwen3-15b-a3b")
    m = cfg.moe
    h = cfg.hidden_size
    inter = m.moe_intermediate_size
    e = m.num_experts
    print(f"full layer: E={e} h={h} inter={inter} top{m.num_experts_per_tok}")

    gate = requantize_two_level(make_stack(e, h, inter))
    up = requantize_two_level(make_stack(e, h, inter))
    down = requantize_two_level(make_stack(e, inter, h))
    router = DenseLinearParams(
        w=jnp.asarray(RNG.normal(0, 0.5, (h, e)), jnp.bfloat16), bias=None)
    p = MoeLayerParams(router=router, gate=gate, up=up, down=down)

    def mk():
        return jnp.asarray(RNG.normal(0, 1, (32, h)), jnp.bfloat16)

    def layer(x):
        return moe_mlp(x, p, cfg)

    dt = slope(layer, mk, n1=8, n2=48)
    print(f"moe_mlp layer (t=32): {dt*1e6:.1f} us "
          f"-> x48 layers = {dt*48*1e3:.2f} ms/step")


if __name__ == "__main__" and os.environ.get("FULL_LAYER"):
    bench_full_layer()
