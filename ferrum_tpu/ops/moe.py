"""Sparse MoE MLP: top-k routing + expert dispatch.

TPU-native analog of the reference's fused-MoE stack: router
(kernels/moe_router.cu: softmax top-k + renorm), block-aligned dispatch
(kernels/moe_align_block_size.cu), Marlin expert-stack GEMMs
(kernels/vllm_marlin_moe/) and weighted combine (kernels/moe_combine.cu).

Design: instead of translating the CUDA bucketing machinery, dispatch is
sort-based over static shapes — the XLA-friendly form of
"moe_align_block_size": sort the T*k (token, expert) assignments by
expert, run grouped matmuls with `jax.lax.ragged_dot` (MXU-tiled grouped
GEMM), and segment-sum back. A one-hot einsum reference (`moe_mlp_ref`)
is the parity oracle for tests.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Tuple

import jax
import jax.numpy as jnp

if TYPE_CHECKING:
    from ..models.configs import ModelConfig
    from ..models.llama_family import MoeLayerParams


def route_topk(router_logits: jnp.ndarray, k: int,
               renorm: bool) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Softmax routing → (weights [T,k] f32, expert_ids [T,k] int32).

    ref: moe_router.cu — softmax over experts, top-k, optional renorm.
    """
    probs = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
    weights, ids = jax.lax.top_k(probs, k)
    if renorm:
        weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    return weights, ids.astype(jnp.int32)


def moe_mlp_ref(x: jnp.ndarray, p: "MoeLayerParams",
                cfg: "ModelConfig") -> jnp.ndarray:
    """One-hot reference: computes every expert for every token. O(T·E·…),
    test-sized configs only — the correctness oracle."""
    from ..ops.linear import apply_linear

    m = cfg.moe
    logits = apply_linear(p.router, x)
    weights, ids = route_topk(logits, m.num_experts_per_tok, m.norm_topk_prob)
    # combine[t, e] = routing weight of expert e for token t (0 if unrouted)
    combine = jnp.zeros((x.shape[0], m.num_experts), jnp.float32).at[
        jnp.arange(x.shape[0])[:, None], ids].add(weights)

    xf = x.astype(jnp.float32)
    g = jnp.einsum("th,ehi->tei", xf, p.gate.astype(jnp.float32))
    u = jnp.einsum("th,ehi->tei", xf, p.up.astype(jnp.float32))
    act = jax.nn.silu(g) * u
    y = jnp.einsum("tei,eih->teh", act, p.down.astype(jnp.float32))
    out = jnp.einsum("te,teh->th", combine, y)
    return out.astype(x.dtype)


def moe_mlp_dense_decode(x: jnp.ndarray, p: "MoeLayerParams",
                         cfg: "ModelConfig"):
    """All-experts decode path: compute EVERY expert for every token.

    At decode batch sizes t·topk ≳ E, so the sort/gather dispatch reads
    the whole packed expert stack from HBM anyway — the memory traffic
    (which sets decode speed) is identical whether we compute 8 experts
    per token or all E. Computing all of them deletes the per-layer
    argsort + bincount + token gather + scatter-add combine and the
    grouped kernel's metadata/masking entirely: three dense batched
    kernels (gate|up, down) and one [t,E]×[E,t,H] combine einsum. The
    extra MXU flops are free at m ≤ 64 (memory-bound regime).
    ref: the bucketed Marlin MoE GEMM + align/combine machinery this
    collapses (crates/ferrum-kernels/kernels/vllm_marlin_moe/ops.cu,
    moe_align_block_size.cu, moe_combine.cu).

    Returns None when the Pallas kernel doesn't support the shapes /
    params (caller falls back to the sort path)."""
    from ..ops.linear import apply_linear
    from .pallas.quant_matmul import (
        quant_bmm_all_experts, quantize_activation_rows,
    )

    m = cfg.moe
    t = x.shape[0]
    e = m.num_experts

    first = p.gate_up if p.gate_up is not None else p.gate
    logits = apply_linear(p.router, x)
    weights, ids = route_topk(logits, m.num_experts_per_tok,
                              m.norm_topk_prob)
    combine = jnp.zeros((t, e), jnp.float32).at[
        jnp.arange(t)[:, None], ids].add(weights)          # [t, E]

    t_pad = ((t + 31) // 32) * 32
    xp = jnp.pad(x, ((0, t_pad - t), (0, 0))) if t_pad != t else x
    xq, xs = quantize_activation_rows(xp)
    if p.gate_up is not None:
        gu = quant_bmm_all_experts(xq[None], xs[None], p.gate_up,
                                   jnp.bfloat16)            # [E, tp, 2I]
        if gu is None:
            return None
        g, u = jnp.split(gu, 2, axis=-1)
    else:
        g = quant_bmm_all_experts(xq[None], xs[None], p.gate,
                                  jnp.bfloat16)
        u = quant_bmm_all_experts(xq[None], xs[None], p.up, jnp.bfloat16)
        if g is None or u is None:
            return None
    act = (jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)
           ).astype(jnp.bfloat16)                           # [E, tp, I]
    inter = act.shape[-1]
    aq, a_s = quantize_activation_rows(act.reshape(e * t_pad, inter))
    y = quant_bmm_all_experts(aq.reshape(e, t_pad, inter),
                              a_s.reshape(e, t_pad, 1), p.down,
                              jnp.bfloat16)                 # [E, tp, H]
    if y is None:
        return None
    out = jnp.einsum("te,eth->th", combine,
                     y[:, :t].astype(jnp.float32))
    return out.astype(x.dtype)


def moe_mlp_gather_decode(x: jnp.ndarray, p: "MoeLayerParams",
                          cfg: "ModelConfig"):
    """Routed-experts-only decode path for t·topk < E (single-stream /
    tiny-batch decode): gather the k routed experts' packed int4 stacks
    and reuse the all-experts bmm kernel at E' = t·k.

    Why: at t·k >= E every expert is touched, so streaming the whole
    stack is optimal (moe_mlp_dense_decode). At c=1 the sort/grouped
    path still walks the full expert grid — measured 20.6 ms/token on
    the 15B proxy (~ the full 7.75 GiB stream) where the 8 routed
    experts are ~0.97 GiB. The gather pays one extra copy of the
    routed stacks (read + write + kernel read ≈ 3x routed bytes —
    still ~2.7x less HBM traffic than the full stream at E=64, better
    at E=128). Shapes are static (gather of [A, in/2, out] by the
    routing ids inside the fused window scan).

    MEASURED NEGATIVE RESULT (round 5, real chip, true 30B-A3B
    per-layer shapes, E=64, t=1): 0.614 ms/layer vs 0.451 for the
    all-experts bmm — 0.73x. The gather copy (XLA materializes the
    routed stacks) plus the E'=8 bmm's 32-row activation padding cost
    more than the 8x stream reduction; the all-experts path already
    streams at ~667 GB/s. NOT wired into moe_mlp — retained with its
    parity test (tests/test_moe_grouped.py) and chip probe
    (tools/chip_probe_moe_gather.py) as the documented evidence for
    why single-stream MoE decode stays on the all-experts path.
    """
    import dataclasses

    from ..ops.linear import apply_linear
    from .pallas.quant_matmul import (
        quant_bmm_all_experts, quantize_activation_rows,
    )

    m = cfg.moe
    t = x.shape[0]
    k = m.num_experts_per_tok
    a = t * k
    if p.gate_up is None:
        return None                      # fused stacks only (builder pass)

    logits = apply_linear(p.router, x)
    weights, ids = route_topk(logits, k, m.norm_topk_prob)     # [t, k]
    flat_ids = ids.reshape(-1)                                 # [A]
    token_of = jnp.repeat(jnp.arange(t, dtype=jnp.int32), k)   # [A]

    def gather(q):
        return dataclasses.replace(
            q, qweight=q.qweight[flat_ids], scales=q.scales[flat_ids],
            zeros=q.zeros[flat_ids],
            scales2=None if q.scales2 is None else q.scales2[flat_ids],
            chan_scale=None if q.chan_scale is None
            else q.chan_scale[flat_ids])

    gu_p = gather(p.gate_up)
    dn_p = gather(p.down)

    # One activation row per assignment, padded to the kernel's 32-row
    # floor (int8 sublane tile) — rows 1..31 are zeros.
    xq, xs = quantize_activation_rows(x)                       # [t, H]
    xq3 = jnp.zeros((a, 32, xq.shape[-1]), jnp.int8
                    ).at[:, 0, :].set(xq[token_of])
    xs3 = jnp.ones((a, 32, 1), jnp.float32
                   ).at[:, 0, :].set(xs[token_of])
    gu = quant_bmm_all_experts(xq3, xs3, gu_p, jnp.bfloat16)   # [A, 32, 2I]
    if gu is None:
        return None
    g, u = jnp.split(gu, 2, axis=-1)
    act = (jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)
           ).astype(jnp.bfloat16)                              # [A, 32, I]
    inter = act.shape[-1]
    aq, a_s = quantize_activation_rows(act.reshape(a * 32, inter))
    y = quant_bmm_all_experts(aq.reshape(a, 32, inter),
                              a_s.reshape(a, 32, 1), dn_p,
                              jnp.bfloat16)                    # [A, 32, H]
    if y is None:
        return None
    rows = y[:, 0, :].astype(jnp.float32) \
        * weights.reshape(-1)[:, None]                         # [A, H]
    out = jnp.zeros((t, x.shape[-1]), jnp.float32
                    ).at[token_of].add(rows)
    return out.astype(x.dtype)


def moe_mlp(x: jnp.ndarray, p: "MoeLayerParams",
            cfg: "ModelConfig") -> jnp.ndarray:
    """Sort + ragged_dot dispatch (production path).

    T*k assignments are sorted by expert id; `group_sizes[e]` counts
    tokens routed to expert e; ragged_dot runs the grouped GEMMs without
    materializing per-token expert weights.

    Decode batch sizes (t·topk >= E, t <= 64) with two-level w4a8
    expert stacks take the all-experts dense path instead — same HBM
    traffic, zero dispatch overhead (moe_mlp_dense_decode)."""
    from ..ops.linear import apply_linear
    from ..ops.quant import QuantLinearParams

    m = cfg.moe
    t = x.shape[0]
    k = m.num_experts_per_tok
    e = m.num_experts

    if isinstance(p.down, QuantLinearParams):
        from .pallas.quant_matmul import on_tpu as _on_tpu
        from .pallas.quant_matmul import w4a8_enabled as _w4a8
        _first = p.gate_up if p.gate_up is not None else p.gate
        if (_on_tpu() and _w4a8() and _first.scales2 is not None
                and p.down.scales2 is not None
                and t * k >= e and t <= 64):
            out = moe_mlp_dense_decode(x, p, cfg)
            if out is not None:
                return out
        # NOT wired: moe_mlp_gather_decode (routed-experts-only decode)
        # measured 0.73x vs the all-experts bmm at t=1/E=64 on chip —
        # the gather materialization + the E'=8 bmm's 32-row padding
        # cost more than the stream saving (chip_probe_moe_gather.py).

    logits = apply_linear(p.router, x)
    weights, ids = route_topk(logits, k, m.norm_topk_prob)   # [T,k]

    flat_ids = ids.reshape(-1)                               # [A], A = T*k
    flat_w = weights.reshape(-1)
    order = jnp.argsort(flat_ids)                            # stable enough
    sorted_ids = flat_ids[order]
    token_of = order // k                                    # source token
    group_sizes = jnp.bincount(sorted_ids, length=e).astype(jnp.int32)

    xs = x[token_of]                                         # [A, hidden]

    if isinstance(p.down, QuantLinearParams):
        from .pallas.quant_matmul import (
            on_tpu, quant_grouped_matmul, quantize_activation_rows,
            w4a8_enabled,
        )
        # Pad the assignment axis to the grouped kernel's m-tile
        # multiple; padded rows sit beyond offsets[E] and are masked
        # inside the kernel.
        a = xs.shape[0]
        a_pad = ((a + 31) // 32) * 32 if a < 128 \
            else ((a + 127) // 128) * 128
        if a_pad != a:
            xs = jnp.pad(xs, ((0, a_pad - a), (0, 0)))
        # gate and up consume the same rows: quantize once.
        first = p.gate_up if p.gate_up is not None else p.gate
        aq = quantize_activation_rows(xs) \
            if (on_tpu() and w4a8_enabled()
                and first.scales2 is not None) else None
        if p.gate_up is not None:
            # fused gate|up expert stack: ONE grouped kernel pass
            gu = quant_grouped_matmul(xs, p.gate_up, sorted_ids,
                                      group_sizes, act_quant=aq)
            g, u = jnp.split(gu, 2, axis=-1)
        else:
            g = quant_grouped_matmul(xs, p.gate, sorted_ids, group_sizes,
                                     act_quant=aq)
            u = quant_grouped_matmul(xs, p.up, sorted_ids, group_sizes,
                                     act_quant=aq)
        act = (jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)
               ).astype(x.dtype)
        y = quant_grouped_matmul(act, p.down, sorted_ids, group_sizes)[:a]
    else:
        if p.gate_up is not None:
            gu = jax.lax.ragged_dot(xs, p.gate_up, group_sizes,
                                    preferred_element_type=jnp.float32)
            g, u = jnp.split(gu, 2, axis=-1)
        else:
            g = jax.lax.ragged_dot(xs, p.gate, group_sizes,
                                   preferred_element_type=jnp.float32)
            u = jax.lax.ragged_dot(xs, p.up, group_sizes,
                                   preferred_element_type=jnp.float32)
        act = (jax.nn.silu(g) * u).astype(x.dtype)
        y = jax.lax.ragged_dot(act, p.down, group_sizes,
                               preferred_element_type=jnp.float32)

    # Weighted combine back to token order (moe_combine.cu analog).
    yw = y.astype(jnp.float32) * flat_w[order][:, None]
    out = jnp.zeros((t, x.shape[1]), jnp.float32).at[token_of].add(yw)
    return out.astype(x.dtype)
