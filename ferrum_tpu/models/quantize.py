"""Quantize a loaded ModelParams to packed int4 (RTN, group-wise).

The from-scratch quantization path (when no GPTQ checkpoint exists):
round-to-nearest symmetric int4 with per-group scales — the same device
layout GPTQ checkpoints repack into (ops/quant.py), so the serving path
is identical. ref: the reference's w4a16 dequant lane and
quantize-on-load flows (crates/ferrum-quantization).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..ops.linear import DenseLinearParams
from ..ops.quant import QuantLinearParams, make_quant_linear, quantize_weight_np
from .llama_family import (LayerParams, ModelParams, MoeLayerParams,
                           QuantEmbedding)


def quantize_embedding(embed) -> QuantEmbedding:
    """bf16 [vocab, h] -> per-row symmetric int8 (docs/fit_30b_v5e.md:
    the embedding half of the 0.72 GiB single-chip squeeze)."""
    if isinstance(embed, QuantEmbedding):
        return embed
    w = np.asarray(embed, np.float32)
    amax = np.maximum(np.abs(w).max(axis=1, keepdims=True), 1e-8)
    scale = amax / 127.0
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return QuantEmbedding(q=jnp.asarray(q),
                          scale=jnp.asarray(scale, jnp.float32))


def _quant_dense(lin: Optional[DenseLinearParams], group_size: int,
                 dtype=jnp.bfloat16):
    if lin is None:
        return None
    if not isinstance(lin, DenseLinearParams):
        return lin  # already quantized
    w = np.asarray(lin.w, dtype=np.float32)
    if w.shape[0] % group_size:
        return lin  # oddly-shaped linear stays dense
    b = None if lin.bias is None else np.asarray(lin.bias, np.float32)
    return make_quant_linear(w, group_size=group_size, bias=b, dtype=dtype)


def _quant_expert_stack(w: jnp.ndarray, group_size: int,
                        dtype=jnp.bfloat16) -> QuantLinearParams:
    """Stack [E, in, out] → stacked QuantLinearParams with leading E dim."""
    wn = np.asarray(w, dtype=np.float32)
    e, in_f, out_f = wn.shape
    packs, scales, zeros = [], [], []
    for i in range(e):
        p, s, z = quantize_weight_np(wn[i], group_size)
        packs.append(p)
        scales.append(s)
        zeros.append(z)
    return QuantLinearParams(
        qweight=jnp.asarray(np.stack(packs)),
        scales=jnp.asarray(np.stack(scales), dtype=dtype),
        zeros=jnp.asarray(np.stack(zeros)),
        bias=None, in_features=in_f, out_features=out_f,
        group_size=group_size)


def init_random_quant_params(cfg, seed: int = 0, group_size: int = 128,
                             dtype=jnp.bfloat16,
                             squeeze_embeddings: bool = False
                             ) -> ModelParams:
    """Architecture-true random INT4 model, generated directly in packed
    form ON DEVICE — for benches, where throughput is weight-value
    independent. Host-side RNG + upload for an 8B model costs minutes
    over a tunneled transport (~4 GB); device-side jax.random generation
    is a handful of tiny dispatches. Embeddings/norms/lm_head are bf16
    as in real GPTQ checkpoints."""
    import jax

    key = jax.random.PRNGKey(seed)

    def next_key():
        nonlocal key
        key, sub = jax.random.split(key)
        return sub

    def qlin(in_f, out_f):
        # Uniform scales make the two-level factorization exact
        # (qs == 15, chan == scale/15, weights unchanged) — emit the TL
        # fields directly so the builder's requantize pass is a no-op
        # and never double-buffers the 4 GB weight tree.
        packed = jax.random.bits(next_key(), (in_f // 2, out_f),
                                 dtype=jnp.uint8)
        scales = jnp.full((in_f // group_size, out_f), 0.01, dtype)
        zeros = jnp.full((in_f // group_size, out_f), 8, jnp.int8)
        return QuantLinearParams(
            qweight=packed, scales=scales, zeros=zeros, bias=None,
            in_features=in_f, out_features=out_f, group_size=group_size,
            scales2=jnp.full((in_f // group_size, out_f), 15, jnp.int8),
            chan_scale=jnp.full((1, out_f), 0.01 / 15.0, jnp.float32))

    def qstack(e, in_f, out_f):
        packed = jax.random.bits(next_key(), (e, in_f // 2, out_f),
                                 dtype=jnp.uint8)
        scales = jnp.full((e, in_f // group_size, out_f), 0.01, dtype)
        zeros = jnp.full((e, in_f // group_size, out_f), 8, jnp.int8)
        return QuantLinearParams(
            qweight=packed, scales=scales, zeros=zeros, bias=None,
            in_features=in_f, out_features=out_f, group_size=group_size,
            scales2=jnp.full((e, in_f // group_size, out_f), 15, jnp.int8),
            chan_scale=jnp.full((e, 1, out_f), 0.01 / 15.0, jnp.float32))

    def normal(shape):
        return (0.02 * jax.random.normal(next_key(), shape, dtype=dtype)
                ).astype(dtype)

    h, qs, kvs, inter = (cfg.hidden_size, cfg.q_size, cfg.kv_size,
                         cfg.intermediate_size)
    layers = []
    for li in range(cfg.num_layers):
        moe = None
        gate = up = down = None
        if cfg.layer_is_moe(li):
            m = cfg.moe
            moe = MoeLayerParams(
                router=DenseLinearParams(w=normal((h, m.num_experts)),
                                         bias=None),
                gate=qstack(m.num_experts, h, m.moe_intermediate_size),
                up=qstack(m.num_experts, h, m.moe_intermediate_size),
                down=qstack(m.num_experts, m.moe_intermediate_size, h))
        else:
            gate, up, down = qlin(h, inter), qlin(h, inter), qlin(inter, h)
        layers.append(LayerParams(
            input_norm=jnp.ones(h, dtype=dtype),
            q=qlin(h, qs), k=qlin(h, kvs), v=qlin(h, kvs), o=qlin(qs, h),
            q_norm=jnp.ones(cfg.head_dim, dtype=dtype) if cfg.qk_norm else None,
            k_norm=jnp.ones(cfg.head_dim, dtype=dtype) if cfg.qk_norm else None,
            post_attn_norm=None, pre_mlp_norm=jnp.ones(h, dtype=dtype),
            post_mlp_norm=None, gate=gate, up=up, down=down, moe=moe))
    if squeeze_embeddings:
        # Generate the squeezed forms directly on device (int8 table,
        # int4 lm_head) — a bf16 intermediate would transiently need
        # the very HBM the squeeze exists to free.
        embed = QuantEmbedding(
            q=jax.random.randint(next_key(), (cfg.vocab_size, h),
                                 -127, 128, jnp.int8),
            scale=jnp.full((cfg.vocab_size, 1), 0.02 / 127.0, jnp.float32))
        lm_head = None if cfg.tie_word_embeddings else qlin(h, cfg.vocab_size)
    else:
        embed = normal((cfg.vocab_size, h))
        lm_head = None if cfg.tie_word_embeddings else DenseLinearParams(
            w=normal((h, cfg.vocab_size)), bias=None)
    return ModelParams(embed=embed, layers=layers,
                       final_norm=jnp.ones(h, dtype=dtype), lm_head=lm_head)


def quantize_model_params(params: ModelParams, group_size: int = 128,
                          dtype=jnp.bfloat16,
                          quantize_experts: bool = True,
                          squeeze_embeddings: bool = False) -> ModelParams:
    """Quantize all transformer linears (q/k/v/o, gate/up/down, expert
    stacks) to int4; embeddings, norms and lm_head stay high-precision
    (matching GPTQ checkpoint conventions). squeeze_embeddings=True
    additionally drops the table to int8 and the (untied) lm_head to
    int4 — the single-chip 30B-A3B fit posture (docs/fit_30b_v5e.md)."""
    layers = []
    for lp in params.layers:
        moe = None
        if lp.moe is not None:
            m = lp.moe
            if quantize_experts and not isinstance(m.gate, QuantLinearParams):
                moe = MoeLayerParams(
                    router=m.router,
                    gate=_quant_expert_stack(m.gate, group_size, dtype),
                    up=_quant_expert_stack(m.up, group_size, dtype),
                    down=_quant_expert_stack(m.down, group_size, dtype))
            else:
                moe = m
        layers.append(LayerParams(
            input_norm=lp.input_norm,
            q=_quant_dense(lp.q, group_size, dtype),
            k=_quant_dense(lp.k, group_size, dtype),
            v=_quant_dense(lp.v, group_size, dtype),
            o=_quant_dense(lp.o, group_size, dtype),
            q_norm=lp.q_norm, k_norm=lp.k_norm,
            post_attn_norm=lp.post_attn_norm,
            pre_mlp_norm=lp.pre_mlp_norm,
            post_mlp_norm=lp.post_mlp_norm,
            gate=_quant_dense(lp.gate, group_size, dtype),
            up=_quant_dense(lp.up, group_size, dtype),
            down=_quant_dense(lp.down, group_size, dtype),
            moe=moe))
    embed, lm_head = params.embed, params.lm_head
    if squeeze_embeddings:
        embed = quantize_embedding(embed)
        lm_head = _quant_dense(lm_head, group_size, dtype)
    return ModelParams(embed=embed, layers=layers,
                       final_norm=params.final_norm,
                       lm_head=lm_head)
