"""LlamaFamilyModel — GQA + SwiGLU + RoPE decoder as pure JAX functions.

TPU-native analog of the reference's hand-written family model
(crates/ferrum-models/src/models/llama_family.rs:1-6091) covering
Llama-3.x / TinyLlama / Mistral / Qwen2 / Qwen3 (QK-norm) / Gemma3
(5:1 local-global attention, dual RoPE, GeGLU, sandwich norms) — and,
via MoeLayerParams, the Qwen3-MoE family's attention trunk.

Design (TPU-first, not a translation):
  - The model is a pure function over an explicit params pytree; there
    is no module framework. Each serving phase (prefill chunk, batched
    decode) is traced into ONE XLA program with static shapes; XLA
    fusion + compilation replace the reference's per-op kernel launches
    and CUDA-Graph capture.
  - KV cache is paged: [L, num_blocks, page, kv_heads*head_dim] arrays,
    updated functionally with donated buffers (in-place under XLA).
  - Quantized weights flow through the same code path via the
    LinearParams dispatch (ops/linear.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import (
    kv_cache_append,
    paged_decode_attention_ref,
    paged_prefill_attention_ref,
)
from ..ops.linear import DenseLinearParams, LinearParams, apply_linear
from ..ops.norms import fused_add_rms_norm, rms_norm
from ..ops.rope import apply_rope, rope_cos_sin, rope_inv_freq
from .configs import ModelConfig


# ---------------------------------------------------------------------------
# Param pytrees
# ---------------------------------------------------------------------------

@partial(jax.tree_util.register_dataclass,
         data_fields=["router", "gate", "up", "down", "gate_up"],
         meta_fields=[])
@dataclass
class MoeLayerParams:
    """Sparse-MoE MLP params (Qwen3-30B-A3B style).

    router: DenseLinearParams [hidden, E]
    gate/up: stacked expert weights — dense [E, hidden, I] arrays or a
             stacked QuantLinearParams batch (leading expert dim).
    down:    [E, I, hidden] likewise.
    gate_up: build-time fusion of gate|up along the out dim (engine/
             builder.fuse_projections); one grouped kernel per layer
             instead of two when set.
    """

    router: LinearParams
    gate: Any
    up: Any
    down: Any
    gate_up: Any = None


@partial(jax.tree_util.register_dataclass,
         data_fields=["input_norm", "q", "k", "v", "o", "q_norm", "k_norm",
                      "post_attn_norm", "pre_mlp_norm", "post_mlp_norm",
                      "gate", "up", "down", "moe", "gdn", "shared_expert",
                      "qkv", "gate_up"],
         meta_fields=[])
@dataclass
class LayerParams:
    input_norm: jnp.ndarray
    q: LinearParams
    k: LinearParams
    v: LinearParams
    o: LinearParams
    q_norm: Optional[jnp.ndarray]          # qwen3/gemma3 per-head RMS [head_dim]
    k_norm: Optional[jnp.ndarray]
    post_attn_norm: Optional[jnp.ndarray]  # gemma3 sandwich: norm(attn_out)
    pre_mlp_norm: jnp.ndarray              # post_attention_layernorm (HF name)
    post_mlp_norm: Optional[jnp.ndarray]   # gemma3 sandwich: norm(mlp_out)
    gate: Optional[LinearParams]
    up: Optional[LinearParams]
    down: Optional[LinearParams]
    moe: Optional[MoeLayerParams]
    # qwen3.5/qwen3-next hybrid extras (None on classic families):
    # gdn: GdnLayerParams — this layer is a linear-attention mixer and
    # q/k/v/o/q_norm/k_norm are None. shared_expert: (MLP params gate/
    # up/down as a LayerParams-like tuple, gate_proj LinearParams).
    gdn: Optional[object] = None
    shared_expert: Optional[object] = None
    # Build-time fusions (engine/builder.fuse_projections): one kernel
    # call for q|k|v and for gate|up. None = split path.
    qkv: Optional[LinearParams] = None
    gate_up: Optional[LinearParams] = None


@partial(jax.tree_util.register_dataclass,
         data_fields=["q", "scale"], meta_fields=[])
@dataclass
class QuantEmbedding:
    """int8 per-row symmetric embedding table — the "bf16-free
    embeddings" squeeze that makes true 30B-A3B arithmetic on one 16 GiB
    chip (docs/fit_30b_v5e.md): 151936x2048 drops 0.58 -> 0.29 GiB.
    Lookup dequantizes the gathered rows only; the tied-logits path
    contracts against the int8 table and rescales per column (exact:
    the row scale commutes out of the dot)."""

    q: jnp.ndarray                         # int8 [vocab, hidden]
    scale: jnp.ndarray                     # f32 [vocab, 1]


@partial(jax.tree_util.register_dataclass,
         data_fields=["embed", "layers", "final_norm", "lm_head"],
         meta_fields=[])
@dataclass
class ModelParams:
    embed: jnp.ndarray                     # [vocab, hidden] | QuantEmbedding
    layers: List[LayerParams]
    final_norm: jnp.ndarray
    lm_head: Optional[LinearParams]        # None = tied to embed


def embed_lookup(embed, tokens: jnp.ndarray, dtype=jnp.bfloat16
                 ) -> jnp.ndarray:
    """Gather embedding rows; dequantize if the table is int8."""
    if isinstance(embed, QuantEmbedding):
        rows = embed.q[tokens].astype(jnp.float32) * embed.scale[tokens]
        return rows.astype(dtype)
    return embed[tokens]


# ---------------------------------------------------------------------------
# KV cache pytree
# ---------------------------------------------------------------------------

@partial(jax.tree_util.register_dataclass,
         data_fields=["k", "v", "k_scale", "v_scale"],
         meta_fields=["page", "kv_heads", "head_dim"])
@dataclass
class PagedKvCache:
    """Device KV pool: k/v [L, num_blocks, page, kv_heads*head_dim].

    INT8 mode (ref: int8_paged_decode_attention.cu, kv_dtype.rs:23-45):
    k/v hold symmetric per-(token, kv-head) int8 values with f32 scales
    [L, num_blocks, page, kv_heads]; attention dequantizes POST-matmul
    (the scale is constant within one head's F segment, so it commutes
    out of the contraction — bandwidth halves, math is exact)."""

    k: jnp.ndarray
    v: jnp.ndarray
    page: int
    kv_heads: int
    head_dim: int
    k_scale: Optional[jnp.ndarray] = None
    v_scale: Optional[jnp.ndarray] = None

    @property
    def num_blocks(self) -> int:
        return self.k.shape[1]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @classmethod
    def create(cls, cfg: ModelConfig, num_blocks: int, page: int,
               dtype=jnp.bfloat16, sharding=None) -> "PagedKvCache":
        # Hybrid (qwen3.5): only full-attention layers own KV slices.
        shape = (cfg.num_kv_layers, num_blocks, page, cfg.kv_size)
        if sharding is not None:
            zeros = partial(jax.jit, out_shardings=sharding, static_argnums=(0, 1))(
                lambda s, d: jnp.zeros(s, d))
        else:
            zeros = jnp.zeros
        k, v = zeros(shape, dtype), zeros(shape, dtype)
        ks = vs = None
        if dtype == jnp.int8:
            sshape = (cfg.num_kv_layers, num_blocks, page,
                      cfg.num_kv_heads)
            ks, vs = zeros(sshape, jnp.float32), zeros(sshape, jnp.float32)
        return cls(k=k, v=v, page=page, kv_heads=cfg.num_kv_heads,
                   head_dim=cfg.head_dim, k_scale=ks, v_scale=vs)


# ---------------------------------------------------------------------------
# MoE forward (jnp reference — one-hot dispatch; production path added in
# ops/pallas/moe.py uses sort + ragged_dot)
# ---------------------------------------------------------------------------

def moe_forward(x: jnp.ndarray, p: MoeLayerParams, cfg: ModelConfig) -> jnp.ndarray:
    from ..ops.moe import moe_mlp
    return moe_mlp(x, p, cfg)


# ---------------------------------------------------------------------------
# Transformer blocks (shared by prefill and decode)
# ---------------------------------------------------------------------------

def _activation(x: jnp.ndarray, kind: str) -> jnp.ndarray:
    if kind == "silu":
        return jax.nn.silu(x)
    if kind == "gelu_tanh":
        return jax.nn.gelu(x, approximate=True)
    raise ValueError(kind)


def _mlp(x: jnp.ndarray, lp: LayerParams, cfg: ModelConfig,
         layer_idx: int) -> jnp.ndarray:
    if lp.moe is not None and cfg.layer_is_moe(layer_idx):
        y = moe_forward(x, lp.moe, cfg)
        if lp.shared_expert is not None:
            # qwen3-next: always-on shared expert, sigmoid-gated per
            # token (Qwen3NextSparseMoeBlock.shared_expert_gate).
            se = lp.shared_expert
            sg = apply_linear(se.gate, x)
            su = apply_linear(se.up, x)
            so = apply_linear(se.down, _activation(sg, cfg.activation) * su)
            gate = jax.nn.sigmoid(
                apply_linear(se.gate_proj, x).astype(jnp.float32))
            y = y + (gate * so.astype(jnp.float32)).astype(y.dtype)
        return y
    if lp.gate_up is not None:
        gu = apply_linear(lp.gate_up, x)
        g, u = jnp.split(gu, 2, axis=-1)
    else:
        g = apply_linear(lp.gate, x)
        u = apply_linear(lp.up, x)
    return apply_linear(lp.down, _activation(g, cfg.activation) * u)


AttnFn = Callable[[int, jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]
# attn_fn(layer_idx, q[N,Hq,D], k_new[N,Hkv,D], v_new[N,Hkv,D]) -> [N,Hq,D]
# The closure owns cache write + paged attention for its phase.


def forward_hidden(
    params: ModelParams,
    cfg: ModelConfig,
    tokens: jnp.ndarray,          # int32 [N]
    positions: jnp.ndarray,       # int32 [N]
    attn_fn: AttnFn,
    *,
    inv_freq_global: jnp.ndarray,
    inv_freq_local: Optional[jnp.ndarray] = None,
    mixer_fn=None,                # (gdn_idx, lp, x [N,H]) -> [N,H]
) -> jnp.ndarray:
    """Token ids → final-norm hidden states [N, hidden].

    Shared trunk for prefill and decode; the phase-specific paged
    attention (including the KV append) is injected via `attn_fn`
    (the reference's unified_forward shape, qwen3_moe_forward_unified.rs).
    Hybrid (qwen3.5/qwen3-next) layers with `lp.gdn` set call
    `mixer_fn` instead — the caller injects the recurrent-state update
    (gdn.py), the analog of the reference's Qwen35LinearAttention path.
    """
    # Zero-centered RMSNorm weights, applied as (1 + w): gemma3 AND
    # qwen3-next (Qwen3NextRMSNorm stores zeros-init weights).
    gemma = cfg.family in ("gemma3", "qwen3_next")
    h = embed_lookup(params.embed, tokens)
    if cfg.embedding_multiplier is not None:
        h = (h.astype(jnp.float32) * cfg.embedding_multiplier).astype(h.dtype)

    cos_g, sin_g = rope_cos_sin(positions, inv_freq_global)
    if inv_freq_local is not None:
        cos_l, sin_l = rope_cos_sin(positions, inv_freq_local)
    rot = int(cfg.head_dim * cfg.partial_rotary_factor)

    residual = h
    gdn_idx = 0
    for li, lp in enumerate(params.layers):
        x = rms_norm(residual, lp.input_norm, cfg.rms_norm_eps, gemma_style=gemma)

        if lp.gdn is not None:
            attn = mixer_fn(gdn_idx, lp, x)
            gdn_idx += 1
        else:
            gate_out = None
            kv_sz = cfg.num_kv_heads * cfg.head_dim
            if lp.qkv is not None:
                # fused q|k|v projection: ONE kernel call per layer
                qkv = apply_linear(lp.qkv, x)
                q_sz = qkv.shape[-1] - 2 * kv_sz
                q_flat = qkv[..., :q_sz]
                k = qkv[..., q_sz:q_sz + kv_sz]
                v = qkv[..., q_sz + kv_sz:]
            else:
                q_flat = apply_linear(lp.q, x)
                k = apply_linear(lp.k, x)
                v = apply_linear(lp.v, x)
            if cfg.attn_output_gate:
                # q_proj emits [q, gate] interleaved per head
                # (qwen3-next): split before q_norm.
                qg = q_flat.reshape(-1, cfg.num_heads, 2 * cfg.head_dim)
                q, gate_out = qg[..., :cfg.head_dim], qg[..., cfg.head_dim:]
            else:
                q = q_flat.reshape(-1, cfg.num_heads, cfg.head_dim)
            k = k.reshape(-1, cfg.num_kv_heads, cfg.head_dim)
            v = v.reshape(-1, cfg.num_kv_heads, cfg.head_dim)

            if lp.q_norm is not None:  # qwen3/gemma3 per-head qk-norm before rope
                q = rms_norm(q, lp.q_norm, cfg.rms_norm_eps, gemma_style=gemma)
                k = rms_norm(k, lp.k_norm, cfg.rms_norm_eps, gemma_style=gemma)

            local = gemma and cfg.layer_sliding_window(li) is not None \
                and inv_freq_local is not None
            cos, sin = (cos_l, sin_l) if local else (cos_g, sin_g)
            if rot < cfg.head_dim:   # partial rotary (qwen3-next 0.25)
                q = jnp.concatenate(
                    [apply_rope(q[..., :rot], cos, sin), q[..., rot:]],
                    axis=-1)
                k = jnp.concatenate(
                    [apply_rope(k[..., :rot], cos, sin), k[..., rot:]],
                    axis=-1)
            else:
                q = apply_rope(q, cos, sin)
                k = apply_rope(k, cos, sin)

            attn = attn_fn(li, q, k, v)
            attn = attn.reshape(attn.shape[0], cfg.q_size)
            if gate_out is not None:
                attn = attn * jax.nn.sigmoid(
                    gate_out.reshape(attn.shape).astype(jnp.float32)
                ).astype(attn.dtype)
            attn = apply_linear(lp.o, attn)
            if lp.post_attn_norm is not None:  # gemma3 sandwich
                attn = rms_norm(attn, lp.post_attn_norm, cfg.rms_norm_eps,
                                gemma_style=gemma)

        x, residual = fused_add_rms_norm(
            attn, residual, lp.pre_mlp_norm, cfg.rms_norm_eps, gemma_style=gemma)

        mlp = _mlp(x, lp, cfg, li)
        if lp.post_mlp_norm is not None:
            mlp = rms_norm(mlp, lp.post_mlp_norm, cfg.rms_norm_eps,
                           gemma_style=gemma)
        residual = (residual.astype(jnp.float32)
                    + mlp.astype(jnp.float32)).astype(residual.dtype)

    return rms_norm(residual, params.final_norm, cfg.rms_norm_eps,
                    gemma_style=gemma)


def logits_from_hidden(params: ModelParams, cfg: ModelConfig,
                       h: jnp.ndarray) -> jnp.ndarray:
    """hidden [N, H] → logits f32 [N, vocab]."""
    if params.lm_head is not None:
        logits = apply_linear(params.lm_head, h).astype(jnp.float32)
    elif isinstance(params.embed, QuantEmbedding):
        # tied weights, int8 table: s_v (h . q_v) == h . (s_v q_v)
        logits = jnp.dot(h, params.embed.q.T.astype(h.dtype),
                         preferred_element_type=jnp.float32) \
            * params.embed.scale.T
    else:
        logits = jnp.dot(h, params.embed.T,
                         preferred_element_type=jnp.float32)
    if cfg.final_logit_softcap:
        logits = cfg.final_logit_softcap * jnp.tanh(
            logits / cfg.final_logit_softcap)
    return logits


# ---------------------------------------------------------------------------
# Phase entry points (jnp-reference attention; the engine swaps in Pallas)
# ---------------------------------------------------------------------------

def make_rope_tables(cfg: ModelConfig):
    rot = int(cfg.head_dim * cfg.partial_rotary_factor)
    inv_g = jnp.asarray(rope_inv_freq(rot, cfg.rope_theta,
                                      cfg.rope_scaling))
    inv_l = None
    if cfg.family == "gemma3":
        inv_l = jnp.asarray(rope_inv_freq(cfg.head_dim, cfg.rope_local_theta))
    return inv_g, inv_l


# Flat-slot sentinel for "drop this write": must stay out of range even
# after the per-layer base offset is added (layer-merged cache indexing).
OOB_SENTINEL = 1 << 30


def quantize_kv(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-(row, kv-head) int8 quantization for KV appends.
    x [..., Hkv, D] -> (int8 [..., Hkv, D], f32 scale [..., Hkv])."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127)
    return q.astype(jnp.int8), scale


def decode_forward(
    params: ModelParams, cfg: ModelConfig, kv: PagedKvCache,
    tokens: jnp.ndarray,         # int32 [S]
    positions: jnp.ndarray,      # int32 [S] (== context_lens - 1; pad slots OOB)
    block_tables: jnp.ndarray,   # int32 [S, max_pages]
    context_lens: jnp.ndarray,   # int32 [S] incl. the new token
    flat_slots: jnp.ndarray,     # int32 [S]; OOB_SENTINEL = drop
    *, ctx_pad: int,
    attn_impl: str = "ref",
    rec: Optional[dict] = None,  # hybrid: {"conv": [Lg,S,C,K-1],
                                 #          "delta": [Lg,S,Hv,dk,dv]}
    win: Optional[dict] = None,  # KV-out-of-carry window accumulator:
                                 # {"k"/"v": [L, W, S, Hkv, D],
                                 #  "step": int32 scalar,
                                 #  "valid": bool [S, W],
                                 #  optional mixed-prefill block:
                                 #  "pk"/"pv": [L, W, P, Hkv, D],
                                 #  "pf": {"chunk_start", "valid_len",
                                 #         "positions" [P], and the
                                 #         slot's pre-hoisted ctx rows
                                 #         "k_ctx"/"v_ctx"[li] [C, F]
                                 #         (+"ks_ctx"/"vs_ctx" int8 KV)}}
):
    """One batched decode step → (hidden [S, H], updated kv[, rec]).

    Mixed prefill+decode (win mode only): when win["pf"] is set, tokens/
    positions carry P EXTRA rows after the S decode lanes — one chunk
    block of a single prefilling slot. The trunk (embeddings, matmuls,
    MoE) runs once over S+P rows, so the chunk rides the decode steps'
    already-paid weight stream; attention splits per phase (the TPU
    answer to the reference's mixed decode+prefill iteration batches,
    crates/ferrum-engine/src/continuous_engine/inner/batch.rs).

    `win` mode (the fused-window hot path): the cache is READ-ONLY —
    this step's K/V goes into the win accumulator at index `step`, and
    attention covers earlier in-window tokens via the masked win terms.
    The caller appends the whole window to the cache ONCE after its
    scan; keeping the multi-GB pool out of the scan carry removes a
    full pool copy per step (measured ~16 ms/step at 4.3 GB on v5e).
    Returns (h, win2) — kv is untouched.

    Layout discipline (profiler-driven, v5e):
      - the cache keeps its flat [L*NB, page, F=Hkv*D] layout end to end;
        splitting F re-tiles and copies the whole pool (~6.5 ms/2.2 GB);
      - appends are deferred and written page-granularly by a Pallas
        kernel (XLA scatter serializes ~14 us/row);
      - the current token joins attention via an explicit self-term.

    Hybrid (qwen3.5): linear-attention layers update the per-slot
    recurrent state in `rec` (returned as a third element); the KV pool
    covers only the full-attention layers (cfg.kv_layer_index maps).
    """
    inv_g, inv_l = make_rope_tables(cfg)
    nb, page = kv.num_blocks, kv.page
    hkv, d = kv.kv_heads, kv.head_dim
    f = hkv * d
    L = kv.k.shape[0]
    s_slots = block_tables.shape[0]
    # Merge layer dim into the block dim (leading merge — layout-free).
    state = {"k": kv.k.reshape(L * nb, page, f),
             "v": kv.v.reshape(L * nb, page, f)}
    quant = kv.quantized
    if quant:
        state["ks"] = kv.k_scale.reshape(L * nb, page, hkv)
        state["vs"] = kv.v_scale.reshape(L * nb, page, hkv)
    deferred = attn_impl in ("linear", "ref")
    if quant and not deferred:
        raise NotImplementedError(
            f"int8 KV requires the deferred-append paths, not "
            f"attn_impl={attn_impl!r}")
    new_ks: List[jnp.ndarray] = []
    new_vs: List[jnp.ndarray] = []

    def attn(li, q, k_new, v_new):
        if attn_impl == "skip":  # diagnostic: no append, no attention
            return q
        sw = cfg.layer_sliding_window(li)
        kli = cfg.kv_layer_index(li)
        if win is not None:
            from ..ops.attention import flat_decode_attention
            if "k_lins" in win:
                # Pre-sliced per-layer ctx windows (hoisted OUT of the
                # caller's scan: the [:, :ctx_pad] slice materializes a
                # copy on TPU — per-WINDOW here instead of per step,
                # measured ~8 ms/step at 4.3 GB pool / ctx 512).
                k_lin = win["k_lins"][kli]
                v_lin = win["v_lins"][kli]
                ks_lin = win["ks_lins"][kli] if quant else None
                vs_lin = win["vs_lins"][kli] if quant else None
            else:
                kc = state["k"][kli * nb:(kli + 1) * nb]
                vc = state["v"][kli * nb:(kli + 1) * nb]
                k_lin = kc.reshape(s_slots, -1, f)[:, :ctx_pad]
                v_lin = vc.reshape(s_slots, -1, f)[:, :ctx_pad]
                ks_lin = vs_lin = None
                if quant:
                    ks_lin = state["ks"][kli * nb:(kli + 1) * nb].reshape(
                        s_slots, -1, hkv)[:, :ctx_pad]
                    vs_lin = state["vs"][kli * nb:(kli + 1) * nb].reshape(
                        s_slots, -1, hkv)[:, :ctx_pad]
            pf = win.get("pf")
            if pf is not None:
                q_d, q_p = q[:s_slots], q[s_slots:]
                kn_d, kn_p = k_new[:s_slots], k_new[s_slots:]
                vn_d, vn_p = v_new[:s_slots], v_new[s_slots:]
            else:
                q_d, kn_d, vn_d = q, k_new, v_new
            # Record this step's K/V into the window accumulator; the
            # cache itself is never written inside the window.
            win["k"] = jax.lax.dynamic_update_slice(
                win["k"], kn_d[None, None].astype(win["k"].dtype),
                (li, win["step"], 0, 0, 0))
            win["v"] = jax.lax.dynamic_update_slice(
                win["v"], vn_d[None, None].astype(win["v"].dtype),
                (li, win["step"], 0, 0, 0))
            out_d = flat_decode_attention(
                q_d, k_lin, v_lin, context_lens, kn_d, vn_d,
                hkv=hkv, scale=cfg.attn_scale, sliding_window=sw,
                softcap=cfg.attn_logit_softcap,
                k_scale=ks_lin, v_scale=vs_lin,
                k_win=win["k"][li], v_win=win["v"][li],
                win_valid=win["valid"], cache_len=win["cache_len"])
            if pf is None:
                return out_d
            from ..ops.attention import flat_prefill_window_attention
            win["pk"] = jax.lax.dynamic_update_slice(
                win["pk"], kn_p[None, None].astype(win["pk"].dtype),
                (li, win["step"], 0, 0, 0))
            win["pv"] = jax.lax.dynamic_update_slice(
                win["pv"], vn_p[None, None].astype(win["pv"].dtype),
                (li, win["step"], 0, 0, 0))
            # The prefilling slot is not a decode lane: its ctx rows are
            # pre-hoisted by the runner (pf["k_ctx"][li] etc.), one
            # [ctx_pad, F] row per layer gathered outside the scan.
            k_ctx = pf["k_ctx"][kli]
            v_ctx = pf["v_ctx"][kli]
            ks_ctx = vs_ctx = None
            if quant:
                ks_ctx = pf["ks_ctx"][kli]
                vs_ctx = pf["vs_ctx"][kli]
            out_p = flat_prefill_window_attention(
                q_p, k_ctx, v_ctx, pf["chunk_start"],
                win["pk"][li], win["pv"][li], win["step"],
                pf["chunk_start"], pf["valid_len"], kn_p, vn_p,
                pf["positions"],
                hkv=hkv, scale=cfg.attn_scale, sliding_window=sw,
                softcap=cfg.attn_logit_softcap,
                k_scale=ks_ctx, v_scale=vs_ctx)
            return jnp.concatenate([out_d, out_p], axis=0)
        if deferred:
            new_ks.append(k_new)
            new_vs.append(v_new)
            kc = state["k"][kli * nb:(kli + 1) * nb]
            vc = state["v"][kli * nb:(kli + 1) * nb]
            if attn_impl == "linear":
                from ..ops.attention import flat_decode_attention
                k_lin = kc.reshape(s_slots, -1, f)[:, :ctx_pad]
                v_lin = vc.reshape(s_slots, -1, f)[:, :ctx_pad]
                ks_lin = vs_lin = None
                if quant:
                    ks_lin = state["ks"][kli * nb:(kli + 1) * nb].reshape(
                        s_slots, -1, hkv)[:, :ctx_pad]
                    vs_lin = state["vs"][kli * nb:(kli + 1) * nb].reshape(
                        s_slots, -1, hkv)[:, :ctx_pad]
                return flat_decode_attention(
                    q, k_lin, v_lin, context_lens, k_new, v_new,
                    hkv=hkv, scale=cfg.attn_scale, sliding_window=sw,
                    softcap=cfg.attn_logit_softcap,
                    k_scale=ks_lin, v_scale=vs_lin)
            # paged reference (CPU oracle): gather via block tables.
            kr = kc.reshape(nb, page, hkv, d)
            vr = vc.reshape(nb, page, hkv, d)
            if quant:
                kr = (kr.astype(jnp.float32) * state["ks"][
                    kli * nb:(kli + 1) * nb][..., None]).astype(q.dtype)
                vr = (vr.astype(jnp.float32) * state["vs"][
                    kli * nb:(kli + 1) * nb][..., None]).astype(q.dtype)
            return paged_decode_attention_ref(
                q, kr, vr,
                block_tables, context_lens, ctx_pad=ctx_pad,
                scale=cfg.attn_scale, sliding_window=sw,
                softcap=cfg.attn_logit_softcap,
                k_self=k_new, v_self=v_new)
        # Diagnostic write-then-attend ladder (profile_decode.py); pays
        # the re-tiling copy — opt-in only.
        flat_l = flat_slots + kli * nb * page
        k4 = state["k"].reshape(L * nb, page, hkv, d)
        v4 = state["v"].reshape(L * nb, page, hkv, d)
        if attn_impl != "read_only":
            k4, v4 = kv_cache_append(k4, v4, k_new, v_new, flat_l)
            state["k"] = k4.reshape(L * nb, page, f)
            state["v"] = v4.reshape(L * nb, page, f)
        if attn_impl == "append_only":
            return q
        if attn_impl == "read_only":
            from ..ops.attention import dense_decode_attention_ref
            k_lin = state["k"][li * nb:(li + 1) * nb].reshape(
                s_slots, -1, hkv, d)[:, :ctx_pad]
            v_lin = state["v"][li * nb:(li + 1) * nb].reshape(
                s_slots, -1, hkv, d)[:, :ctx_pad]
            return dense_decode_attention_ref(
                q, k_lin, v_lin, context_lens, scale=cfg.attn_scale,
                sliding_window=sw, softcap=cfg.attn_logit_softcap)
        # "pallas" (the DMA-ring ragged kernel) was REMOVED after its
        # own on-chip bar failed decisively: in-engine A/B at ctx 2048
        # measured 1238 ms/window vs 160 for this XLA path (7.7x,
        # gates/perf r5 attn-ab artifact). The (S,) per-sequence grid
        # serializes on the v5e's single TensorCore; XLA's gather +
        # flash composition wins at every context measured.
        from ..types import NotSupportedError
        raise NotSupportedError(f"unknown attn_impl {attn_impl!r}")

    mixer = None
    if rec is not None:
        from .gdn import gdn_decode_step
        active = flat_slots < OOB_SENTINEL

        def mixer(gi, lp, x):
            y, c2, d2 = gdn_decode_step(
                cfg, lp.gdn, x, rec["conv"][gi], rec["delta"][gi], active)
            rec["conv"] = rec["conv"].at[gi].set(c2)
            rec["delta"] = rec["delta"].at[gi].set(d2)
            return y

    h = forward_hidden(params, cfg, tokens, positions, attn,
                       inv_freq_global=inv_g, inv_freq_local=inv_l,
                       mixer_fn=mixer)

    if win is not None:
        if rec is not None:
            return h, win, rec
        return h, win

    if deferred and new_ks:
        from ..ops.pallas.kv_append import append_rows
        # [L, S, hkv, d] → [L*S, F]; per-layer block bases on indices.
        k_stack = jnp.stack(new_ks).reshape(L * s_slots, hkv, d)
        v_stack = jnp.stack(new_vs).reshape(L * s_slots, hkv, d)
        blk = flat_slots // page                         # [S]
        off = flat_slots % page
        bases = (jnp.arange(L, dtype=jnp.int32) * nb)[:, None]
        blk_all = (bases + blk[None, :]).reshape(-1)
        blk_all = jnp.where(jnp.tile(flat_slots, L) >= OOB_SENTINEL,
                            OOB_SENTINEL, blk_all)
        off_all = jnp.tile(off, L)
        if quant:
            k_stack, k_sc = quantize_kv(k_stack)
            v_stack, v_sc = quantize_kv(v_stack)
            state["ks"] = append_rows(state["ks"], k_sc, blk_all, off_all)
            state["vs"] = append_rows(state["vs"], v_sc, blk_all, off_all)
        state["k"] = append_rows(state["k"], k_stack.reshape(-1, f),
                                 blk_all, off_all)
        state["v"] = append_rows(state["v"], v_stack.reshape(-1, f),
                                 blk_all, off_all)

    kv2 = PagedKvCache(
        k=state["k"].reshape(L, nb, page, f),
        v=state["v"].reshape(L, nb, page, f),
        page=page, kv_heads=hkv, head_dim=d,
        k_scale=state["ks"].reshape(L, nb, page, hkv) if quant else None,
        v_scale=state["vs"].reshape(L, nb, page, hkv) if quant else None)
    if rec is not None:
        return h, kv2, rec
    return h, kv2


def append_window_kv(
    kv: PagedKvCache,
    win_k: jnp.ndarray,          # [L, W, S, Hkv, D] window accumulator
    win_v: jnp.ndarray,
    flat_mat: jnp.ndarray,       # int32 [W, S]; OOB_SENTINEL = drop
) -> PagedKvCache:
    """Write a whole decode window's K/V into the cache in ONE pass
    (the KV-out-of-scan-carry design's single append)."""
    from ..ops.pallas.kv_append import append_rows
    L, W, s_slots = win_k.shape[:3]
    nb, page = kv.num_blocks, kv.page
    hkv, d = kv.kv_heads, kv.head_dim
    f = hkv * d
    quant = kv.quantized
    state_k = kv.k.reshape(L * nb, page, f)
    state_v = kv.v.reshape(L * nb, page, f)
    n_rows = W * s_slots
    k_stack = win_k.reshape(L * n_rows, hkv, d)
    v_stack = win_v.reshape(L * n_rows, hkv, d)
    fl = flat_mat.reshape(-1)                    # [W*S]
    blk = fl // page
    off = fl % page
    bases = (jnp.arange(L, dtype=jnp.int32) * nb)[:, None]
    blk_all = jnp.where(jnp.tile(fl, L).reshape(L, n_rows)
                        >= OOB_SENTINEL, OOB_SENTINEL,
                        bases + blk[None, :]).reshape(-1)
    off_all = jnp.tile(off, L)
    k_sc = v_sc = None
    if quant:
        k_stack, k_sc = quantize_kv(k_stack)
        v_stack, v_sc = quantize_kv(v_stack)
        ks = append_rows(kv.k_scale.reshape(L * nb, page, hkv),
                         k_sc, blk_all, off_all)
        vs = append_rows(kv.v_scale.reshape(L * nb, page, hkv),
                         v_sc, blk_all, off_all)
    state_k = append_rows(state_k, k_stack.reshape(-1, f).astype(
        kv.k.dtype) if quant else k_stack.reshape(-1, f),
        blk_all, off_all)
    state_v = append_rows(state_v, v_stack.reshape(-1, f).astype(
        kv.v.dtype) if quant else v_stack.reshape(-1, f),
        blk_all, off_all)
    return PagedKvCache(
        k=state_k.reshape(L, nb, page, f),
        v=state_v.reshape(L, nb, page, f),
        page=page, kv_heads=hkv, head_dim=d,
        k_scale=ks.reshape(L, nb, page, hkv) if quant else None,
        v_scale=vs.reshape(L, nb, page, hkv) if quant else None)


def prefill_forward(
    params: ModelParams, cfg: ModelConfig, kv: PagedKvCache,
    tokens: jnp.ndarray,         # int32 [T] — one sequence's chunk (padded)
    positions: jnp.ndarray,      # int32 [T] absolute; pads point past total_len
    block_table: jnp.ndarray,    # int32 [max_pages]
    total_len: jnp.ndarray,      # int32 scalar: prefix + real chunk tokens
    flat_slots: jnp.ndarray,     # int32 [T] (OOB = drop for pads)
    *, ctx_pad: int,
    attn_impl: str = "ref",
) -> Tuple[jnp.ndarray, PagedKvCache]:
    """One chunked-prefill step for one sequence → (hidden [T,H], kv).

    Same layout discipline as decode_forward: flat [.., page, F] cache,
    deferred append via whole-page Pallas writes (chunk starts are
    page-aligned by the scheduler), chunk K/V joins attention
    in-activation.
    """
    if kv.quantized:
        raise NotImplementedError(
            "single-sequence prefill_forward does not support int8 KV; "
            "the engine path (prefill_forward_batched) does")
    inv_g, inv_l = make_rope_tables(cfg)
    nb, page = kv.num_blocks, kv.page
    hkv, d = kv.kv_heads, kv.head_dim
    f = hkv * d
    L = cfg.num_layers
    t_pad = tokens.shape[0]
    maxp = block_table.shape[0]
    state = {"k": kv.k.reshape(L * nb, page, f),
             "v": kv.v.reshape(L * nb, page, f)}
    new_ks: List[jnp.ndarray] = []
    new_vs: List[jnp.ndarray] = []
    from ..ops.attention import flat_prefill_attention

    def attn(li, q, k_new, v_new):
        new_ks.append(k_new)
        new_vs.append(v_new)
        kc = state["k"][li * nb:(li + 1) * nb]          # [nb, page, F]
        vc = state["v"][li * nb:(li + 1) * nb]
        sw = cfg.layer_sliding_window(li)
        if attn_impl == "linear":
            start = block_table[0] * page
            kl = jax.lax.dynamic_slice_in_dim(
                kc.reshape(-1, f), start, ctx_pad, axis=0)
            vl = jax.lax.dynamic_slice_in_dim(
                vc.reshape(-1, f), start, ctx_pad, axis=0)
        else:
            n_pages = ctx_pad // page
            kl = kc[block_table[:n_pages]].reshape(ctx_pad, f)
            vl = vc[block_table[:n_pages]].reshape(ctx_pad, f)
        return flat_prefill_attention(
            q, kl, vl, positions, total_len, k_new, v_new,
            hkv=hkv, scale=cfg.attn_scale, sliding_window=sw,
            softcap=cfg.attn_logit_softcap)

    h = forward_hidden(params, cfg, tokens, positions, attn,
                       inv_freq_global=inv_g, inv_freq_local=inv_l)

    from ..ops.pallas.kv_append import append_pages
    # Whole-page writes: chunk start is page-aligned (scheduler invariant)
    # and t_pad is a page multiple, so [L, t_pad, F] reshapes into
    # [L * t_pad/page, page, F] page blocks for free.
    n_pg = t_pad // page
    k_pages = jnp.stack(new_ks).reshape(L * n_pg, page, f)
    v_pages = jnp.stack(new_vs).reshape(L * n_pg, page, f)
    # Each chunk page's target block comes from its FIRST token's flat
    # slot (valid for scattered paged blocks AND linear regions; pages
    # whose first token is a pad carry the OOB sentinel and are dropped).
    first_flat = flat_slots.reshape(n_pg, page)[:, 0]
    blk_row = jnp.where(first_flat >= OOB_SENTINEL, OOB_SENTINEL,
                        first_flat // page)
    bases = (jnp.arange(L, dtype=jnp.int32) * nb)[:, None]
    blk_all = jnp.where(blk_row[None, :] >= OOB_SENTINEL, OOB_SENTINEL,
                        bases + blk_row[None, :]).reshape(-1)
    state["k"] = append_pages(state["k"], k_pages, blk_all)
    state["v"] = append_pages(state["v"], v_pages, blk_all)

    kv2 = PagedKvCache(
        k=state["k"].reshape(L, nb, page, f),
        v=state["v"].reshape(L, nb, page, f),
        page=page, kv_heads=hkv, head_dim=d)
    return h, kv2


def prefill_forward_batched(
    params: ModelParams, cfg: ModelConfig, kv: PagedKvCache,
    tokens: jnp.ndarray,         # int32 [B, T] — one chunk per sequence
    positions: jnp.ndarray,      # int32 [B, T] absolute; pads past total_len
    block_tables: jnp.ndarray,   # int32 [B, max_pages]
    total_lens: jnp.ndarray,     # int32 [B]: prefix + real chunk tokens
    flat_slots: jnp.ndarray,     # int32 [B, T] (OOB = drop for pads)
    *, ctx_pad: int,
    attn_impl: str = "ref",
    append: str = "pages",       # "pages" (page-aligned chunks) | "rows"
    rec: Optional[dict] = None,  # hybrid recurrent state pools
    slots: Optional[jnp.ndarray] = None,       # int32 [B] row -> slot
    rec_reset: Optional[jnp.ndarray] = None,   # bool [B] chunk 0 rows
    gdn_block: int = 64,         # GDN blocked-recurrence tile (0 = scan)
):
    """Chunked prefill for B sequences fused into ONE program.

    The trunk processes all B*T tokens as one flat batch, so every
    weight matrix streams from HBM once per CALL instead of once per
    SEQUENCE — at B=8, T=256 the matmuls run at m=2048 (MXU
    compute-bound) instead of m=256 ×8 (weight-stream-bound). This is
    the TPU answer to the reference's batched prefill scheduling
    (crates/ferrum-engine/src/continuous_engine.rs chunked-prefill
    budget): there the batching merges CUDA launches; here it
    amortizes the 4 GB int4 weight stream that dominates small-m.

    Attention is per-sequence (vmapped flat_prefill_attention over B);
    KV appends are whole-page Pallas writes exactly as the single-
    sequence path (each row's chunk start is page-aligned).
    """
    inv_g, inv_l = make_rope_tables(cfg)
    nb, page = kv.num_blocks, kv.page
    hkv, d = kv.kv_heads, kv.head_dim
    f = hkv * d
    L = kv.k.shape[0]
    b, t_pad = tokens.shape
    quant = kv.quantized
    state = {"k": kv.k.reshape(L * nb, page, f),
             "v": kv.v.reshape(L * nb, page, f)}
    if quant:
        state["ks"] = kv.k_scale.reshape(L * nb, page, hkv)
        state["vs"] = kv.v_scale.reshape(L * nb, page, hkv)
    new_ks: List[jnp.ndarray] = []
    new_vs: List[jnp.ndarray] = []
    from ..ops.attention import flat_prefill_attention

    flat_tokens = tokens.reshape(-1)
    flat_positions = positions.reshape(-1)

    def _window(arr, width, li):
        """Per-sequence ctx window from a flat [L*NB, page, w] pool."""
        lc = arr[li * nb:(li + 1) * nb]
        if attn_impl == "linear":
            starts = block_tables[:, 0] * page           # [B]
            r = lc.reshape(-1, width)
            return jax.vmap(lambda s: jax.lax.dynamic_slice_in_dim(
                r, s, ctx_pad, axis=0))(starts)          # [B, ctx, w]
        n_pages = ctx_pad // page
        return lc[block_tables[:, :n_pages]].reshape(b, ctx_pad, width)

    def attn(li, q, k_new, v_new):
        new_ks.append(k_new)
        new_vs.append(v_new)
        sw = cfg.layer_sliding_window(li)
        kli = cfg.kv_layer_index(li)
        kl = _window(state["k"], f, kli)
        vl = _window(state["v"], f, kli)
        ksl = _window(state["ks"], hkv, kli) if quant else None
        vsl = _window(state["vs"], hkv, kli) if quant else None
        qb = q.reshape(b, t_pad, *q.shape[1:])
        kb = k_new.reshape(b, t_pad, *k_new.shape[1:])
        vb = v_new.reshape(b, t_pad, *v_new.shape[1:])

        def one(qi, kli, vli, pi, tl, kni, vni, ksi=None, vsi=None):
            return flat_prefill_attention(
                qi, kli, vli, pi, tl, kni, vni, hkv=hkv,
                scale=cfg.attn_scale, sliding_window=sw,
                softcap=cfg.attn_logit_softcap,
                k_scale=ksi, v_scale=vsi)

        if quant:
            out = jax.vmap(one)(qb, kl, vl, positions, total_lens,
                                kb, vb, ksl, vsl)
        else:
            out = jax.vmap(one)(qb, kl, vl, positions, total_lens,
                                kb, vb)                  # [B, T, Hq, D]
        return out.reshape(b * t_pad, *out.shape[2:])

    mixer = None
    if rec is not None:
        from .gdn import gdn_prefill_chunk
        num_state_slots = rec["conv"].shape[1]
        sl_clip = jnp.clip(slots, 0, num_state_slots - 1)
        valid = positions < total_lens[:, None]          # [B, T]

        def mixer(gi, lp, x):
            conv_rows = rec["conv"][gi][sl_clip]         # [B, C, K-1]
            delta_rows = rec["delta"][gi][sl_clip]
            if rec_reset is not None:
                # Chunk-0 rows start from zero state (re-admissions
                # rebuild from scratch; mid-sequence chunks continue).
                conv_rows = jnp.where(
                    rec_reset[:, None, None], 0.0, conv_rows)
                delta_rows = jnp.where(
                    rec_reset[:, None, None, None], 0.0, delta_rows)
            y, c2, d2 = gdn_prefill_chunk(
                cfg, lp.gdn, x.reshape(b, t_pad, -1), conv_rows,
                delta_rows, valid, block=gdn_block)
            rec["conv"] = rec["conv"].at[gi, slots].set(c2, mode="drop")
            rec["delta"] = rec["delta"].at[gi, slots].set(d2, mode="drop")
            return y.reshape(b * t_pad, -1)

    h = forward_hidden(params, cfg, flat_tokens, flat_positions, attn,
                       inv_freq_global=inv_g, inv_freq_local=inv_l,
                       mixer_fn=mixer)

    k_stack = jnp.stack(new_ks)                  # [L, B*T, Hkv, D]
    v_stack = jnp.stack(new_vs)
    k_sc = v_sc = None
    if quant:
        k_stack, k_sc = quantize_kv(k_stack)
        v_stack, v_sc = quantize_kv(v_stack)
    if append == "rows":
        # Row-granular writes: speculative verification chunks start at
        # arbitrary (non-page-aligned) decode positions.
        from ..ops.pallas.kv_append import append_rows
        n_rows = b * t_pad
        fl = flat_slots.reshape(-1)
        blk = fl // page
        off = fl % page
        bases = (jnp.arange(L, dtype=jnp.int32) * nb)[:, None]
        blk_all = jnp.where(jnp.tile(fl, L).reshape(L, n_rows)
                            >= OOB_SENTINEL, OOB_SENTINEL,
                            bases + blk[None, :]).reshape(-1)
        off_all = jnp.tile(off, L)
        state["k"] = append_rows(state["k"], k_stack.reshape(-1, f),
                                 blk_all, off_all)
        state["v"] = append_rows(state["v"], v_stack.reshape(-1, f),
                                 blk_all, off_all)
        if quant:
            state["ks"] = append_rows(state["ks"],
                                      k_sc.reshape(-1, hkv),
                                      blk_all, off_all)
            state["vs"] = append_rows(state["vs"],
                                      v_sc.reshape(-1, hkv),
                                      blk_all, off_all)
    else:
        from ..ops.pallas.kv_append import append_pages
        # [L, B*T, F] → page blocks; every row's chunk is page-aligned
        # and t_pad is a page multiple, so the flat reshape lands on
        # pages.
        n_pg = (b * t_pad) // page
        first_flat = flat_slots.reshape(n_pg, page)[:, 0]
        blk_row = jnp.where(first_flat >= OOB_SENTINEL, OOB_SENTINEL,
                            first_flat // page)
        bases = (jnp.arange(L, dtype=jnp.int32) * nb)[:, None]
        blk_all = jnp.where(blk_row[None, :] >= OOB_SENTINEL, OOB_SENTINEL,
                            bases + blk_row[None, :]).reshape(-1)
        state["k"] = append_pages(state["k"],
                                  k_stack.reshape(L * n_pg, page, f),
                                  blk_all)
        state["v"] = append_pages(state["v"],
                                  v_stack.reshape(L * n_pg, page, f),
                                  blk_all)
        if quant:
            state["ks"] = append_pages(
                state["ks"], k_sc.reshape(L * n_pg, page, hkv), blk_all)
            state["vs"] = append_pages(
                state["vs"], v_sc.reshape(L * n_pg, page, hkv), blk_all)

    kv2 = PagedKvCache(
        k=state["k"].reshape(L, nb, page, f),
        v=state["v"].reshape(L, nb, page, f),
        page=page, kv_heads=hkv, head_dim=d,
        k_scale=state["ks"].reshape(L, nb, page, hkv) if quant else None,
        v_scale=state["vs"].reshape(L, nb, page, hkv) if quant else None)
    if rec is not None:
        return h.reshape(b, t_pad, -1), kv2, rec
    return h.reshape(b, t_pad, -1), kv2


# ---------------------------------------------------------------------------
# Random init (tests / benches; real weights come from loaders)
# ---------------------------------------------------------------------------

def init_random_params(cfg: ModelConfig, seed: int = 0,
                       dtype=jnp.bfloat16) -> ModelParams:
    rng = np.random.default_rng(seed)
    # Zero-centered (1+w) norm families store identity as zeros.
    zc = cfg.sandwich_norms or cfg.family == "qwen3_next"

    def lin(i, o, bias=False, std=0.02):
        w = rng.normal(0.0, std, (i, o)).astype(np.float32)
        b = rng.normal(0.0, std, (o,)).astype(np.float32) if bias else None
        return DenseLinearParams(
            w=jnp.asarray(w, dtype=dtype),
            bias=None if b is None else jnp.asarray(b, dtype=dtype))

    layers = []
    for li in range(cfg.num_layers):
        use_moe = cfg.layer_is_moe(li)
        moe = None
        gate = up = down = None
        gdn_p = None
        shared = None
        if cfg.layer_is_linear_attn(li):
            from .gdn import init_gdn_layer
            gdn_p = init_gdn_layer(cfg, rng, dtype=dtype)
        if use_moe:
            m = cfg.moe
            moe = MoeLayerParams(
                router=lin(cfg.hidden_size, m.num_experts),
                gate=jnp.asarray(rng.normal(0, 0.02,
                    (m.num_experts, cfg.hidden_size, m.moe_intermediate_size)
                    ).astype(np.float32), dtype=dtype),
                up=jnp.asarray(rng.normal(0, 0.02,
                    (m.num_experts, cfg.hidden_size, m.moe_intermediate_size)
                    ).astype(np.float32), dtype=dtype),
                down=jnp.asarray(rng.normal(0, 0.02,
                    (m.num_experts, m.moe_intermediate_size, cfg.hidden_size)
                    ).astype(np.float32), dtype=dtype),
            )
            if cfg.shared_expert_intermediate_size:
                from .gdn import SharedExpertParams
                sz = cfg.shared_expert_intermediate_size
                shared = SharedExpertParams(
                    gate=lin(cfg.hidden_size, sz),
                    up=lin(cfg.hidden_size, sz),
                    down=lin(sz, cfg.hidden_size),
                    gate_proj=lin(cfg.hidden_size, 1))
        else:
            gate = lin(cfg.hidden_size, cfg.intermediate_size)
            up = lin(cfg.hidden_size, cfg.intermediate_size)
            down = lin(cfg.intermediate_size, cfg.hidden_size)
        is_gdn = gdn_p is not None
        q_out = cfg.q_size * (2 if cfg.attn_output_gate else 1)
        layers.append(LayerParams(
            input_norm=jnp.ones(cfg.hidden_size, dtype=dtype) if not zc
            else jnp.zeros(cfg.hidden_size, dtype=dtype),
            q=None if is_gdn else lin(cfg.hidden_size, q_out,
                                      bias=cfg.attention_bias),
            k=None if is_gdn else lin(cfg.hidden_size, cfg.kv_size,
                                      bias=cfg.attention_bias),
            v=None if is_gdn else lin(cfg.hidden_size, cfg.kv_size,
                                      bias=cfg.attention_bias),
            o=None if is_gdn else lin(cfg.q_size, cfg.hidden_size),
            q_norm=(jnp.ones(cfg.head_dim, dtype=dtype) if cfg.qk_norm and not zc
            else (jnp.zeros(cfg.head_dim, dtype=dtype) if cfg.qk_norm else None)) if not is_gdn else None,
            k_norm=(jnp.ones(cfg.head_dim, dtype=dtype) if cfg.qk_norm and not zc
            else (jnp.zeros(cfg.head_dim, dtype=dtype) if cfg.qk_norm else None)) if not is_gdn else None,
            post_attn_norm=jnp.zeros(cfg.hidden_size, dtype=dtype)
            if cfg.sandwich_norms else None,
            pre_mlp_norm=jnp.ones(cfg.hidden_size, dtype=dtype)
            if not zc else jnp.zeros(cfg.hidden_size, dtype=dtype),
            post_mlp_norm=jnp.zeros(cfg.hidden_size, dtype=dtype)
            if cfg.sandwich_norms else None,
            gate=gate, up=up, down=down, moe=moe,
            gdn=gdn_p, shared_expert=shared,
        ))

    embed = jnp.asarray(
        rng.normal(0, 0.02, (cfg.vocab_size, cfg.hidden_size)).astype(np.float32),
        dtype=dtype)
    lm_head = None if cfg.tie_word_embeddings else lin(
        cfg.hidden_size, cfg.vocab_size)
    return ModelParams(
        embed=embed, layers=layers,
        final_norm=jnp.ones(cfg.hidden_size, dtype=dtype) if not zc
        else jnp.zeros(cfg.hidden_size, dtype=dtype),
        lm_head=lm_head)


def encode_forward(
    params: ModelParams, cfg: ModelConfig,
    tokens: jnp.ndarray,          # int32 [T_pad]
    t_real: jnp.ndarray,          # int32 scalar — real token count
) -> jnp.ndarray:
    """Cache-free causal forward over one padded chunk → hidden [T, H].

    Used by the embedding lane (mean-pooled sentence embeddings) and by
    offline scoring; no KV cache is touched.
    """
    inv_g, inv_l = make_rope_tables(cfg)
    t_pad = tokens.shape[0]
    positions = jnp.minimum(jnp.arange(t_pad, dtype=jnp.int32), t_real - 1)

    def attn(li, q, k, v):
        hq = q.shape[1]
        hkv = k.shape[1]
        rep = hq // hkv
        d = q.shape[2]
        qf = q.astype(jnp.float32).reshape(t_pad, hkv, rep, d)
        scores = jnp.einsum("thrd,chd->thrc", qf * cfg.attn_scale,
                            k.astype(jnp.float32))
        qpos = jax.lax.broadcasted_iota(jnp.int32, (t_pad, t_pad), 0)
        kpos = jax.lax.broadcasted_iota(jnp.int32, (t_pad, t_pad), 1)
        valid = (kpos <= qpos) & (kpos < t_real)
        sw = cfg.layer_sliding_window(li)
        if sw is not None:
            valid &= kpos > (qpos - sw)
        scores = jnp.where(valid[:, None, None, :], scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("thrc,chd->thrd", probs, v.astype(jnp.float32))
        return out.reshape(t_pad, hq, d).astype(q.dtype)

    return forward_hidden(params, cfg, tokens, positions, attn,
                          inv_freq_global=inv_g, inv_freq_local=inv_l)
