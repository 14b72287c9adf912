"""Gated DeltaNet linear attention (Qwen3.5 / Qwen3-Next family).

TPU-native implementation of the reference's GDN stack
(crates/ferrum-models/src/models/qwen35.rs,
crates/ferrum-kernels/kernels/gated_delta_rule.cu:41-117,
crates/ferrum-interfaces/src/recurrent_state.rs `RecurrentStateManager`):
a hybrid decoder where most layers replace softmax attention with a
constant-size recurrent state updated by the gated delta rule

    S_t = S_{t-1} * exp(g_t)                    (per-head decay)
    kv  = k_t^T S_t                             (read)
    S_t += k_t ⊗ ((v_t - kv) * beta_t)          (delta write)
    o_t = q_t^T S_t                             (output)

with a depthwise causal conv1d + silu on the stacked q/k/v channels, a
sigmoid beta from `ba` projection, decay g = -exp(A_log)·softplus(a +
dt_bias), l2-normalized q/k, and a z-gated RMSNorm on the output
(math verified against transformers' Qwen3Next eager implementation —
tests/test_gdn.py parity suite).

TPU mapping:
  - the recurrent state [Hv, dk, dv] and conv state [conv_dim, K-1]
    live in per-slot device pools (the RecurrentStateManager analog) and
    thread through the compiled decode/prefill programs exactly like
    the KV cache (donated, updated in-program);
  - decode processes all slots batched (einsums over [S, Hv, dk, dv]);
  - prefill runs a lax.scan over chunk positions with the projections
    hoisted out of the scan (the matmuls see m = B*T on the MXU; only
    the O(dk·dv) state recurrence is sequential);
  - inactive slots / pad tokens are masked: their state never updates.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.linear import LinearParams, apply_linear


@partial(jax.tree_util.register_dataclass,
         data_fields=["in_qkvz", "in_ba", "conv_w", "a_log", "dt_bias",
                      "norm_w", "out"],
         meta_fields=[])
@dataclass
class GdnLayerParams:
    """One linear-attention layer's weights (qwen35.rs
    Qwen35LinearAttentionWeights)."""

    in_qkvz: LinearParams        # H -> 2*key_dim + 2*value_dim
    in_ba: LinearParams          # H -> 2*Hv
    conv_w: jnp.ndarray          # [conv_dim, K] depthwise kernel
    a_log: jnp.ndarray           # f32 [Hv]
    dt_bias: jnp.ndarray         # f32 [Hv]
    norm_w: jnp.ndarray          # [dv] gated RMSNorm weight
    out: LinearParams            # value_dim -> H


@partial(jax.tree_util.register_dataclass,
         data_fields=["gate", "up", "down", "gate_proj"],
         meta_fields=[])
@dataclass
class SharedExpertParams:
    """qwen3-next always-on shared expert + its sigmoid gate proj."""

    gate: LinearParams
    up: LinearParams
    down: LinearParams
    gate_proj: LinearParams      # H -> 1


def split_qkvz_ba(cfg, qkvz: jnp.ndarray, ba: jnp.ndarray):
    """Undo the per-k-head interleaved packing of the fused projections
    (HF fix_query_key_value_ordering): for each key head the channels
    are [q(dk), k(dk), v(rep*dv), z(rep*dv)], ba is [b(rep), a(rep)]."""
    g = cfg.gdn
    hk, hv, dk, dv = (g.num_key_heads, g.num_value_heads,
                      g.key_head_dim, g.value_head_dim)
    rep = hv // hk
    n = qkvz.shape[0]
    qkvz = qkvz.reshape(n, hk, 2 * dk + 2 * rep * dv)
    q = qkvz[:, :, :dk]
    k = qkvz[:, :, dk:2 * dk]
    v = qkvz[:, :, 2 * dk:2 * dk + rep * dv].reshape(n, hv, dv)
    z = qkvz[:, :, 2 * dk + rep * dv:].reshape(n, hv, dv)
    ba = ba.reshape(n, hk, 2 * rep)
    b = ba[:, :, :rep].reshape(n, hv)
    a = ba[:, :, rep:].reshape(n, hv)
    return q, k, v, z, b, a


def _l2norm(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps)


def _decay_beta(cfg, p: GdnLayerParams, a: jnp.ndarray, b: jnp.ndarray):
    """g = -exp(A_log) * softplus(a + dt_bias); beta = sigmoid(b)."""
    g = -jnp.exp(p.a_log.astype(jnp.float32)) * jax.nn.softplus(
        a.astype(jnp.float32) + p.dt_bias.astype(jnp.float32))
    return g, jax.nn.sigmoid(b.astype(jnp.float32))


def _conv_step(x_t: jnp.ndarray,        # [B, C] current channels
               conv_state: jnp.ndarray,  # [B, C, K-1] previous inputs
               w: jnp.ndarray):          # [C, K]
    """One causal depthwise conv step + state shift (K-1 history)."""
    window = jnp.concatenate([conv_state, x_t[:, :, None]], axis=2)
    out = jnp.sum(window * w[None], axis=2)
    return jax.nn.silu(out.astype(jnp.float32)).astype(x_t.dtype), \
        window[:, :, 1:]


def _delta_step(state: jnp.ndarray,     # f32 [B, Hv, dk, dv]
                q: jnp.ndarray, k: jnp.ndarray,   # f32 [B, Hv, dk]
                v: jnp.ndarray,                   # f32 [B, Hv, dv]
                g: jnp.ndarray, beta: jnp.ndarray  # f32 [B, Hv]
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    state = state * jnp.exp(g)[:, :, None, None]
    kv_mem = jnp.einsum("bhk,bhkv->bhv", k, state)
    delta = (v - kv_mem) * beta[:, :, None]
    state = state + jnp.einsum("bhk,bhv->bhkv", k, delta)
    out = jnp.einsum("bhk,bhkv->bhv", q, state)
    return state, out


def _prep_heads(cfg, q, k, v):
    """l2norm + GQA repeat + query scale, all in f32 (HF kernel order)."""
    g = cfg.gdn
    rep = g.num_value_heads // g.num_key_heads
    q = _l2norm(q.astype(jnp.float32))
    k = _l2norm(k.astype(jnp.float32))
    if rep > 1:
        q = jnp.repeat(q, rep, axis=-2)
        k = jnp.repeat(k, rep, axis=-2)
    q = q * (g.key_head_dim ** -0.5)
    return q, k, v.astype(jnp.float32)


def _gated_norm(cfg, p: GdnLayerParams, out: jnp.ndarray,
                z: jnp.ndarray) -> jnp.ndarray:
    """RMSNorm(out)*w * silu(z), computed in f32 (Qwen3NextRMSNormGated)."""
    x = out.astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    x = x * jax.lax.rsqrt(var + cfg.rms_norm_eps)
    x = x * p.norm_w.astype(jnp.float32)
    return x * jax.nn.silu(z.astype(jnp.float32))


def gdn_decode_step(
    cfg, p: GdnLayerParams,
    x: jnp.ndarray,             # [S, H] one token per slot
    conv_state: jnp.ndarray,    # [S, C, K-1]
    delta_state: jnp.ndarray,   # f32 [S, Hv, dk, dv]
    active: jnp.ndarray,        # bool [S] — inactive slots keep state
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One batched decode step -> (out [S, H], conv', delta')."""
    gc = cfg.gdn
    key_dim = gc.num_key_heads * gc.key_head_dim
    val_dim = gc.num_value_heads * gc.value_head_dim
    s = x.shape[0]
    qkvz = apply_linear(p.in_qkvz, x)
    ba = apply_linear(p.in_ba, x)
    q, k, v, z, b, a = split_qkvz_ba(cfg, qkvz, ba)
    mixed = jnp.concatenate(
        [q.reshape(s, key_dim), k.reshape(s, key_dim),
         v.reshape(s, val_dim)], axis=-1)
    conv_out, conv2 = _conv_step(mixed, conv_state, p.conv_w)
    q = conv_out[:, :key_dim].reshape(s, gc.num_key_heads, gc.key_head_dim)
    k = conv_out[:, key_dim:2 * key_dim].reshape(
        s, gc.num_key_heads, gc.key_head_dim)
    v = conv_out[:, 2 * key_dim:].reshape(
        s, gc.num_value_heads, gc.value_head_dim)
    g, beta = _decay_beta(cfg, p, a, b)
    q, k, v = _prep_heads(cfg, q, k, v)
    delta2, out = _delta_step(delta_state, q, k, v, g, beta)
    y = _gated_norm(cfg, p, out, z).reshape(s, val_dim).astype(x.dtype)
    y = apply_linear(p.out, y)
    keep = active[:, None, None]
    conv2 = jnp.where(keep, conv2, conv_state)
    delta2 = jnp.where(keep[..., None], delta2, delta_state)
    return y, conv2, delta2


def gdn_prefill_chunk(
    cfg, p: GdnLayerParams,
    x: jnp.ndarray,             # [B, T, H] one chunk per row
    conv_state: jnp.ndarray,    # [B, C, K-1] carried across chunks
    delta_state: jnp.ndarray,   # f32 [B, Hv, dk, dv]
    valid: jnp.ndarray,         # bool [B, T] real (non-pad) tokens
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Chunked prefill -> (out [B, T, H], conv', delta').

    Projections + norms run batched over all B*T tokens (MXU); only the
    O(dk*dv) recurrence is a lax.scan over T. Pad steps are masked, so
    states end at each row's last real token."""
    gc = cfg.gdn
    key_dim = gc.num_key_heads * gc.key_head_dim
    val_dim = gc.num_value_heads * gc.value_head_dim
    bsz, t, h = x.shape
    flat = x.reshape(bsz * t, h)
    qkvz = apply_linear(p.in_qkvz, flat)
    ba = apply_linear(p.in_ba, flat)
    q, k, v, z, b, a = split_qkvz_ba(cfg, qkvz, ba)
    mixed = jnp.concatenate(
        [q.reshape(bsz, t, key_dim), k.reshape(bsz, t, key_dim),
         v.reshape(bsz, t, val_dim)], axis=-1)        # [B, T, C]
    g_all, beta_all = _decay_beta(
        cfg, p, a.reshape(bsz, t, -1), b.reshape(bsz, t, -1))

    def body(carry, inp):
        conv_s, delta_s = carry
        x_t, g_t, b_t, valid_t = inp
        conv_out, conv2 = _conv_step(x_t, conv_s, p.conv_w)
        qt = conv_out[:, :key_dim].reshape(
            bsz, gc.num_key_heads, gc.key_head_dim)
        kt = conv_out[:, key_dim:2 * key_dim].reshape(
            bsz, gc.num_key_heads, gc.key_head_dim)
        vt = conv_out[:, 2 * key_dim:].reshape(
            bsz, gc.num_value_heads, gc.value_head_dim)
        qt, kt, vt = _prep_heads(cfg, qt, kt, vt)
        delta2, out_t = _delta_step(delta_s, qt, kt, vt, g_t, b_t)
        keep = valid_t[:, None, None]
        conv2 = jnp.where(keep, conv2, conv_s)
        delta2 = jnp.where(keep[..., None], delta2, delta_s)
        return (conv2, delta2), out_t

    (conv2, delta2), outs = jax.lax.scan(
        body, (conv_state, delta_state),
        (jnp.swapaxes(mixed, 0, 1),                  # [T, B, C]
         jnp.swapaxes(g_all, 0, 1),                  # [T, B, Hv]
         jnp.swapaxes(beta_all, 0, 1),
         jnp.swapaxes(valid, 0, 1)))
    out = jnp.swapaxes(outs, 0, 1)                   # [B, T, Hv, dv]
    y = _gated_norm(cfg, p, out.reshape(bsz * t, gc.num_value_heads,
                                        gc.value_head_dim),
                    z).reshape(bsz * t, val_dim).astype(x.dtype)
    y = apply_linear(p.out, y).reshape(bsz, t, h)
    return y, conv2, delta2


def init_gdn_layer(cfg, rng, dtype=jnp.bfloat16) -> GdnLayerParams:
    """Random init from a numpy Generator (tests/benches)."""
    import numpy as np
    from ..ops.linear import DenseLinearParams
    gc = cfg.gdn
    key_dim = gc.num_key_heads * gc.key_head_dim
    val_dim = gc.num_value_heads * gc.value_head_dim
    conv_dim = 2 * key_dim + val_dim

    def lin(i, o):
        return DenseLinearParams(
            w=jnp.asarray(rng.normal(0, 0.02, (i, o)).astype(np.float32),
                          dtype=dtype), bias=None)

    return GdnLayerParams(
        in_qkvz=lin(cfg.hidden_size, 2 * key_dim + 2 * val_dim),
        in_ba=lin(cfg.hidden_size, 2 * gc.num_value_heads),
        conv_w=jnp.asarray(rng.normal(
            0, 0.2, (conv_dim, gc.conv_kernel_dim)).astype(np.float32),
            dtype=dtype),
        a_log=jnp.asarray(np.log(rng.uniform(
            0.5, 8.0, gc.num_value_heads)).astype(np.float32)),
        dt_bias=jnp.asarray(rng.normal(
            0, 0.1, gc.num_value_heads).astype(np.float32)),
        norm_w=jnp.ones((gc.value_head_dim,), dtype),
        out=lin(val_dim, cfg.hidden_size),
    )
