#!/usr/bin/env python
"""Decompose the MoE layer cost at decode (t=32) and prefill (t=256)
shapes: full moe_mlp vs routing-only vs grouped-kernels-only.

Chained two-length scan slope (see tools/bench_w4a8.py): the axon
transport dedupes identical executions and has ~32 ms RTT, so per-call
timing must come from chain-length differences.
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

from ferrum_tpu.models.configs import preset
from ferrum_tpu.models.llama_family import MoeLayerParams
from ferrum_tpu.ops.linear import DenseLinearParams, apply_linear
from ferrum_tpu.ops.moe import moe_mlp, route_topk
from ferrum_tpu.ops.pallas.quant_matmul import (
    _quant_grouped_w4a8tl_2d, quantize_activation_rows, set_w4a8,
)
from ferrum_tpu.ops.quant import (
    QuantLinearParams, quantize_weight_np, requantize_two_level,
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


def slope(fn, make_x, n1=8, n2=40, tries=4):
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
    return (t2 - t1) / (n2 - n1)


def main():
    set_w4a8(True)
    print("backend:", jax.default_backend(), jax.devices())
    cfg = preset("qwen3-15b-a3b")
    m = cfg.moe
    h, inter, e, k = (cfg.hidden_size, m.moe_intermediate_size,
                      m.num_experts, m.num_experts_per_tok)
    print(f"E={e} h={h} inter={inter} top{k}")

    gate = requantize_two_level(make_stack(e, h, inter))
    up = requantize_two_level(make_stack(e, h, inter))
    down = requantize_two_level(make_stack(e, inter, h))
    router = DenseLinearParams(
        w=jnp.asarray(RNG.normal(0, 0.5, (h, e)), jnp.bfloat16), bias=None)
    p = MoeLayerParams(router=router, gate=gate, up=up, down=down)

    for t in (32, 256):
        a = t * k
        a_pad = ((a + 127) // 128) * 128

        def mk(t=t):
            return jnp.asarray(RNG.normal(0, 1, (t, h)), jnp.bfloat16)

        # (1) full layer
        dt_full = slope(lambda x: moe_mlp(x, p, cfg), mk)

        # (2) routing-only: router + topk + argsort + gather + combine
        #     metadata, but expert GEMMs replaced by a copy.
        def routing_only(x):
            logits = apply_linear(p.router, x)
            weights, ids = route_topk(logits, k, m.norm_topk_prob)
            flat_ids = ids.reshape(-1)
            order = jnp.argsort(flat_ids)
            token_of = order // k
            group_sizes = jnp.bincount(
                flat_ids[order], length=e).astype(jnp.int32)
            xs = x[token_of]
            y = xs * group_sizes[0].astype(jnp.bfloat16)  # stand-in GEMM
            yw = y.astype(jnp.float32) * weights.reshape(-1)[order][:, None]
            out = jnp.zeros((t, h), jnp.float32).at[token_of].add(yw)
            return out.astype(x.dtype)

        dt_rt = slope(routing_only, mk)

        # (3) kernels only (fixed dispatch): 2x gate/up-shape + 1x down
        ids_np = RNG.integers(0, e, a)
        gs = jnp.asarray(np.bincount(np.sort(ids_np), minlength=e)
                         .astype(np.int32))

        def mk_pad(t=t):
            return jnp.asarray(RNG.normal(0, 1, (a_pad, h)), jnp.bfloat16)

        def kernels_only(x):
            xq, xs_ = quantize_activation_rows(x)
            g = _quant_grouped_w4a8tl_2d(xq, xs_, gate, gs, jnp.bfloat16)
            u = _quant_grouped_w4a8tl_2d(xq, xs_, up, gs, jnp.bfloat16)
            act = (jax.nn.silu(g.astype(jnp.float32))
                   * u.astype(jnp.float32)).astype(jnp.bfloat16)
            aq2, as2 = quantize_activation_rows(act)
            y = _quant_grouped_w4a8tl_2d(aq2, as2, down, gs, jnp.bfloat16)
            return jnp.pad(y, ((0, 0), (0, 0)))[:, :h]

        dt_k = slope(kernels_only, mk_pad)

        print(f"t={t}: full={dt_full*1e6:.0f}us  routing={dt_rt*1e6:.0f}us "
              f" kernels={dt_k*1e6:.0f}us  "
              f"unexplained={(dt_full-dt_rt-dt_k)*1e6:.0f}us")
        print(f"  x48 layers: full={dt_full*48*1e3:.1f}ms "
              f"routing={dt_rt*48*1e3:.1f}ms kernels={dt_k*48*1e3:.1f}ms")


if __name__ == "__main__":
    main()
