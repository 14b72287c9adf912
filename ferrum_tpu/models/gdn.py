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
import numpy as np

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
    block: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Chunked prefill -> (out [B, T, H], conv', delta').

    Dispatch: the blocked WY-form path (matmul recurrence over `block`-
    sized tiles, the chunked analog of the reference's
    gated_delta_rule.cu chunk kernels) when T divides into blocks and
    `valid` is a per-row prefix mask (the engine's invariant: pads only
    trail); else the per-position sequential scan (the oracle)."""
    t = x.shape[1]
    blk = min(int(block or 0), t)
    if blk > 1 and t % blk == 0:
        # Contract (advisor r3): the blocked path's positional conv and
        # carried-window gather are only correct for PREFIX valid masks
        # (pads strictly trailing) — the engine's chunked-prefill
        # invariant. A concrete (non-traced) mask is checked here; a
        # traced mask relies on the caller honoring the contract.
        if isinstance(valid, (np.ndarray, jnp.ndarray)) and not isinstance(
                valid, jax.core.Tracer):
            v = np.asarray(valid)
            lengths = v.sum(axis=1)
            is_prefix = all(bool(v[i, :int(n)].all()) and not v[i, int(n):].any()
                            for i, n in enumerate(lengths))
            if not is_prefix:
                return _gdn_prefill_sequential(cfg, p, x, conv_state,
                                               delta_state, valid)
        return _gdn_prefill_blocked(cfg, p, x, conv_state, delta_state,
                                    valid, blk)
    return _gdn_prefill_sequential(cfg, p, x, conv_state, delta_state,
                                   valid)


def _gdn_prefill_sequential(
    cfg, p: GdnLayerParams,
    x: jnp.ndarray,             # [B, T, H] one chunk per row
    conv_state: jnp.ndarray,    # [B, C, K-1] carried across chunks
    delta_state: jnp.ndarray,   # f32 [B, Hv, dk, dv]
    valid: jnp.ndarray,         # bool [B, T] real (non-pad) tokens
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-position reference path (and the blocked path's test oracle).

    Projections + norms run batched over all B*T tokens (MXU); only the
    O(dk*dv) recurrence is a lax.scan over T. Pad steps are masked, so
    states end at each row's last real token. Handles arbitrary (non-
    prefix) valid masks."""
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


def _gdn_prefill_blocked(
    cfg, p: GdnLayerParams,
    x: jnp.ndarray,             # [B, T, H]
    conv_state: jnp.ndarray,    # [B, C, K-1]
    delta_state: jnp.ndarray,   # f32 [B, Hv, dk, dv]
    valid: jnp.ndarray,         # bool [B, T] PREFIX mask (pads trail)
    block: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Blocked (WY-form) gated delta rule — the TPU answer to the
    reference's chunked kernels (gated_delta_rule.cu:41-117 runs the
    same per-position recurrence; fla-style chunking is the published
    fast form).

    Unrolling S_t = e^{g_t} S_{t-1} + k_t u_t^T with u_t = beta_t (v_t -
    k_t^T e^{g_t} S_{t-1}) over a block, with b_t = cumsum(g) inside the
    block:

        (I + A) U = beta (.) V - (beta e^b) (.) (K S_0)
        A[t,i]    = beta_t e^{b_t - b_i} (k_t . k_i)        (i < t)
        O         = (e^b (.) Q) S_0 + M U,
        M[t,i]    = e^{b_t - b_i} (q_t . k_i)               (i <= t)
        S'        = e^{b_T} S_0 + (e^{b_T - b} (.) K)^T U

    so the whole intra-block recurrence becomes [block, block] matmuls
    on the MXU plus ONE unit-lower triangular solve; only the block-to-
    block state handoff stays sequential (T/block scan steps instead of
    T). Pad steps are folded in exactly as g = 0, beta = 0: no decay, no
    write, u = 0 — the carried states match the sequential path's
    masked scan bit-for-bit in exact arithmetic.

    The depthwise conv runs positionally over the whole chunk (valid is
    a prefix mask, so no real token ever sees pad history); the carried
    conv window is gathered at each row's last real token."""
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
    keep = valid[..., None]
    g_all = jnp.where(keep, g_all, 0.0)               # pad: no decay
    beta_all = jnp.where(keep, beta_all, 0.0)         # pad: no write

    # Positional depthwise conv over [prev window | chunk inputs].
    kk = p.conv_w.shape[1]
    fullw = jnp.concatenate(
        [conv_state, jnp.swapaxes(mixed, 1, 2)], axis=2)  # [B, C, K-1+T]
    conv_acc = fullw[:, :, 0:t] * p.conv_w[None, :, 0, None]
    for j in range(1, kk):
        conv_acc = conv_acc + fullw[:, :, j:j + t] * p.conv_w[None, :, j, None]
    conv_out = jax.nn.silu(conv_acc.astype(jnp.float32)).astype(x.dtype)
    conv_out = jnp.swapaxes(conv_out, 1, 2)           # [B, T, C]
    nv = jnp.sum(valid.astype(jnp.int32), axis=1)     # [B]
    widx = nv[:, None] + jnp.arange(kk - 1, dtype=jnp.int32)[None, :]
    conv2 = jnp.take_along_axis(fullw, widx[:, None, :], axis=2)

    qh = conv_out[..., :key_dim].reshape(
        bsz, t, gc.num_key_heads, gc.key_head_dim)
    kh = conv_out[..., key_dim:2 * key_dim].reshape(
        bsz, t, gc.num_key_heads, gc.key_head_dim)
    vh = conv_out[..., 2 * key_dim:].reshape(
        bsz, t, gc.num_value_heads, gc.value_head_dim)
    qh, kh, vh = _prep_heads(cfg, qh, kh, vh)         # f32 [B, T, Hv, d]
    hv, dk = qh.shape[2], qh.shape[3]
    dv = vh.shape[3]

    nblk = t // block
    # [N, B, Hv, block, d] — block-major for the scan.
    def to_blocks(arr):
        return jnp.moveaxis(
            arr.reshape(bsz, nblk, block, *arr.shape[2:]), 1, 0)
    qb, kb, vb = (jnp.swapaxes(to_blocks(u), 2, 3) for u in (qh, kh, vh))
    gb = jnp.swapaxes(to_blocks(g_all), 2, 3)         # [N, B, Hv, block]
    bb = jnp.swapaxes(to_blocks(beta_all), 2, 3)

    tt = jnp.arange(block)
    lower_strict = tt[:, None] > tt[None, :]
    lower_incl = tt[:, None] >= tt[None, :]
    neg_inf = jnp.float32(-jnp.inf)

    def blk_body(s0, inp):
        qq, kx, vv, gg, be = inp                      # [B, Hv, block, *]
        cum = jnp.cumsum(gg, axis=-1)                 # b_t, inclusive
        d_mat = cum[..., :, None] - cum[..., None, :]  # b_t - b_i
        e_strict = jnp.exp(jnp.where(lower_strict, d_mat, neg_inf))
        e_incl = jnp.exp(jnp.where(lower_incl, d_mat, neg_inf))
        a_mat = be[..., :, None] * e_strict * jnp.einsum(
            "bhtk,bhik->bhti", kx, kx)
        rhs = be[..., None] * vv - (be * jnp.exp(cum))[..., None] \
            * jnp.einsum("bhtk,bhkv->bhtv", kx, s0)
        u_blk = jax.scipy.linalg.solve_triangular(
            a_mat, rhs, lower=True, unit_diagonal=True)
        m_mat = e_incl * jnp.einsum("bhtk,bhik->bhti", qq, kx)
        o_blk = jnp.exp(cum)[..., None] * jnp.einsum(
            "bhtk,bhkv->bhtv", qq, s0) \
            + jnp.einsum("bhti,bhiv->bhtv", m_mat, u_blk)
        last = cum[..., -1:]                          # [B, Hv, 1]
        s1 = jnp.exp(last)[..., None] * s0 + jnp.einsum(
            "bhtk,bhtv->bhkv", kx * jnp.exp(last - cum)[..., None], u_blk)
        return s1, o_blk

    delta2, outs = jax.lax.scan(
        blk_body, delta_state.astype(jnp.float32), (qb, kb, vb, gb, bb))
    out = jnp.moveaxis(outs, 0, 1).swapaxes(2, 3).reshape(
        bsz * t, hv, dv)                              # [B*T, Hv, dv]
    y = _gated_norm(cfg, p, out, z).reshape(
        bsz * t, val_dim).astype(x.dtype)
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
