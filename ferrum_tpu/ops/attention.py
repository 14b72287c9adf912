"""Paged-KV attention — pure-jnp reference implementations.

TPU-native analog of the reference's paged attention kernel family
(crates/ferrum-kernels/kernels/{paged_decode_attention,
batched_flash_decode_attention,paged_varlen_attention}.cu and the
vendored vLLM paged_attention_v2.cu): decode attention over a paged KV
cache, and chunked-prefill attention where a chunk of new tokens attends
to its cached prefix plus itself causally.

These jnp versions are the correctness oracle (the reference's `_eq`
pattern) AND the production attention path: the linear layout's fused
dense-slice attention for serving, and the gather-based paged path for
the paged layout. (A Pallas DMA-ring ragged kernel existed through
round 4; its own on-chip bar — in-engine A/B at ctx>=2048 — failed
7.7x against the XLA path, so it was removed. The per-sequence grid
serializes on the v5e's single TensorCore; XLA's gather + flash
composition wins at every measured context.) All
shapes are static: callers pad the batch to a bucket and the visible
context to `ctx_pad` tokens (a multiple of the page size), the TPU
analog of the reference's padded-batch CUDA-graph keys.

Cache layout: k/v each [num_blocks, page, kv_heads, head_dim]; block
tables int32 [S, max_pages] map (seq, page_idx) → physical block.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _maybe_softcap(scores: jnp.ndarray, cap: Optional[float]) -> jnp.ndarray:
    if cap is None:
        return scores
    return cap * jnp.tanh(scores / cap)


def gather_kv(cache: jnp.ndarray, block_tables: jnp.ndarray,
              ctx_pad: int, page: int) -> jnp.ndarray:
    """Gather the first ctx_pad cached tokens per sequence.

    cache: [num_blocks, page, Hkv, D]; block_tables: int32 [S, max_pages].
    Returns [S, ctx_pad, Hkv, D].
    """
    n_pages = ctx_pad // page
    tables = block_tables[:, :n_pages]                       # [S, n_pages]
    g = cache[tables]                                        # [S, n_pages, page, Hkv, D]
    s = tables.shape[0]
    return g.reshape(s, ctx_pad, cache.shape[2], cache.shape[3])


def paged_decode_attention_ref(
    q: jnp.ndarray,               # [S, Hq, D] (one new token per slot)
    k_cache: jnp.ndarray,         # [num_blocks, page, Hkv, D]
    v_cache: jnp.ndarray,
    block_tables: jnp.ndarray,    # int32 [S, max_pages]
    context_lens: jnp.ndarray,    # int32 [S] — includes the new token
    *,
    ctx_pad: int,
    scale: float,
    sliding_window: Optional[int] = None,
    softcap: Optional[float] = None,
    k_self: Optional[jnp.ndarray] = None,   # [S, Hkv, D] (deferred append)
    v_self: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """GQA decode attention over the paged cache. Returns [S, Hq, D].

    Without k_self/v_self the new token's K/V must already be in the
    cache (write-then-attend); with them, the cache holds only history
    and the current token joins via a self-term (deferred-append mode).
    """
    s, hq, d = q.shape
    page = k_cache.shape[1]
    hkv = k_cache.shape[2]
    rep = hq // hkv

    k = gather_kv(k_cache, block_tables, ctx_pad, page)       # [S, C, Hkv, D]
    v = gather_kv(v_cache, block_tables, ctx_pad, page)

    qf = q.astype(jnp.float32).reshape(s, hkv, rep, d)
    kf = k.astype(jnp.float32)
    scores = jnp.einsum("shrd,schd->shrc", qf * scale, kf)    # [S,Hkv,rep,C]

    hist_len = context_lens[:, None] - (0 if k_self is None else 1)
    pos = jax.lax.broadcasted_iota(jnp.int32, (s, ctx_pad), 1)
    valid = pos < hist_len
    if sliding_window is not None:
        valid &= pos >= (context_lens[:, None] - sliding_window)
    scores = _maybe_softcap(scores, softcap)
    scores = jnp.where(valid[:, None, None, :], scores, NEG_INF)

    if k_self is not None:
        self_sc = jnp.einsum("shrd,shd->shr", qf * scale,
                             k_self.astype(jnp.float32))      # [S,Hkv,rep]
        self_sc = _maybe_softcap(self_sc, softcap)
        m = jnp.maximum(jnp.max(scores, axis=-1), self_sc)
        e_hist = jnp.exp(scores - m[..., None])
        e_self = jnp.exp(self_sc - m)
        denom = jnp.sum(e_hist, axis=-1) + e_self
        p_hist = e_hist / denom[..., None]
        out = jnp.einsum("shrc,schd->shrd", p_hist,
                         v.astype(jnp.float32))
        out = out + (e_self / denom)[..., None] \
            * v_self.astype(jnp.float32)[:, :, None, :]
        return out.reshape(s, hq, d).astype(q.dtype)

    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("shrc,schd->shrd", probs, v.astype(jnp.float32))
    return out.reshape(s, hq, d).astype(q.dtype)


def dense_decode_attention_ref(
    q: jnp.ndarray,               # [S, Hq, D]
    k_lin: jnp.ndarray,           # [S, ctx_pad, Hkv, D] (slot-contiguous)
    v_lin: jnp.ndarray,
    context_lens: jnp.ndarray,    # int32 [S] — INCLUDING the current token
    *,
    scale: float,
    sliding_window: Optional[int] = None,
    softcap: Optional[float] = None,
    k_self: Optional[jnp.ndarray] = None,   # [S, Hkv, D] current token's K
    v_self: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Decode attention over a slot-contiguous KV slice — the linear
    KV layout's hot path. Identical math to paged_decode_attention_ref,
    but the cache is sliced (no gather materialization).

    MXU shaping: the natural GQA einsum decomposes into S*Hkv tiny
    [rep, D] x [D, C] matmuls (MXU-latency-bound). Instead we compute
    ALL (q-head, kv-head) cross scores as S large [Hq, D] x [D, C*Hkv]
    matmuls and select each q head's own kv head with a one-hot
    contraction — 8x FLOP waste on an idle MXU beats 256 latency-bound
    launches (same trade as the reference's padded-batch GEMMs).

    Deferred-append mode: when k_self/v_self are given, the cache holds
    only HISTORY (context_lens - 1 tokens); the current token's K/V join
    via an explicit self-term. This lets the caller batch all layers'
    cache writes into one scatter per step (XLA TPU scatters have a high
    per-call cost — measured ~0.4 ms each).

    Returns [S, Hq, D]."""
    s, hq, d = q.shape
    ctx_pad = k_lin.shape[1]
    hkv = k_lin.shape[2]
    rep = hq // hkv
    # Keep the big KV operands in their storage dtype and let the MXU
    # accumulate in f32 (astype would materialize a f32 copy of the
    # whole visible cache per layer).
    qf = (q.astype(jnp.float32) * scale).astype(q.dtype)     # [S, Hq, D]
    if DENSE_ALGO == "grouped":
        return _dense_grouped(qf, k_lin, v_lin, context_lens, rep,
                              sliding_window, softcap, k_self, v_self)
    return _dense_crosshead(qf, k_lin, v_lin, context_lens, rep,
                            sliding_window, softcap, k_self, v_self)


# Decode-attention algorithm over the dense slice:
#   grouped   — natural GQA batched einsum (S*Hkv matmuls of [rep,D]x[D,C])
#   crosshead — all-head cross scores ([Hq,D]x[D,C*Hkv] per slot) + one-hot
#               select; trades 8x FLOPs for fewer, larger MXU ops.
DENSE_ALGO = "grouped"


def _dense_grouped(qf, k_lin, v_lin, context_lens, rep, sliding_window,
                   softcap, k_self, v_self):
    s, hq, d = qf.shape
    ctx_pad = k_lin.shape[1]
    hkv = k_lin.shape[2]
    qg = qf.reshape(s, hkv, rep, d)
    scores = jnp.einsum("shrd,schd->shrc", qg, k_lin,
                        preferred_element_type=jnp.float32)  # [S,Hkv,rep,C]
    hist_len = context_lens[:, None] - (0 if k_self is None else 1)
    pos = jax.lax.broadcasted_iota(jnp.int32, (s, ctx_pad), 1)
    valid = pos < hist_len
    if sliding_window is not None:
        valid &= pos >= (context_lens[:, None] - sliding_window)
    scores = _maybe_softcap(scores, softcap)
    scores = jnp.where(valid[:, None, None, :], scores, NEG_INF)

    if k_self is not None:
        self_sc = jnp.einsum("shrd,shd->shr", qg,
                             k_self.astype(jnp.float32),
                             preferred_element_type=jnp.float32)
        self_sc = _maybe_softcap(self_sc, softcap)
        m = jnp.maximum(jnp.max(scores, axis=-1), self_sc)
        e_hist = jnp.exp(scores - m[..., None])
        e_self = jnp.exp(self_sc - m)
        denom = jnp.sum(e_hist, axis=-1) + e_self
        p_hist = (e_hist / denom[..., None]).astype(k_lin.dtype)
        out = jnp.einsum("shrc,schd->shrd", p_hist, v_lin,
                         preferred_element_type=jnp.float32)
        out = out + (e_self / denom)[..., None] \
            * v_self.astype(jnp.float32)[:, :, None, :]
        return out.reshape(s, hq, d).astype(qf.dtype)

    probs = jax.nn.softmax(scores, axis=-1).astype(k_lin.dtype)
    out = jnp.einsum("shrc,schd->shrd", probs, v_lin,
                     preferred_element_type=jnp.float32)
    return out.reshape(s, hq, d).astype(qf.dtype)


def _dense_crosshead(qf, k_lin, v_lin, context_lens, rep, sliding_window,
                     softcap, k_self, v_self):
    s, hq, d = qf.shape
    ctx_pad = k_lin.shape[1]
    hkv = k_lin.shape[2]
    # sel[qh, h] = 1 iff kv head h serves q head qh (contiguous groups).
    qh_ids = jax.lax.broadcasted_iota(jnp.int32, (hq, hkv), 0) // rep
    h_ids = jax.lax.broadcasted_iota(jnp.int32, (hq, hkv), 1)
    sel = (qh_ids == h_ids)
    scores_all = jnp.einsum("sqd,schd->sqch", qf, k_lin,
                            preferred_element_type=jnp.float32)
    scores = jnp.sum(jnp.where(sel[None, :, None, :], scores_all, 0.0),
                     axis=-1)                                # [S, Hq, C]
    hist_len = context_lens[:, None] - (0 if k_self is None else 1)
    pos = jax.lax.broadcasted_iota(jnp.int32, (s, ctx_pad), 1)
    valid = pos < hist_len
    if sliding_window is not None:
        valid &= pos >= (context_lens[:, None] - sliding_window)
    scores = _maybe_softcap(scores, softcap)
    scores = jnp.where(valid[:, None, :], scores, NEG_INF)

    if k_self is not None:
        self_sc = jnp.einsum("sqd,shd->sqh", qf, k_self,
                             preferred_element_type=jnp.float32)
        self_sc = jnp.sum(jnp.where(sel[None, :, :], self_sc, 0.0),
                          axis=-1)                           # [S, Hq]
        self_sc = _maybe_softcap(self_sc, softcap)
        m = jnp.maximum(jnp.max(scores, axis=-1), self_sc)   # [S, Hq]
        e_hist = jnp.exp(scores - m[:, :, None])
        e_self = jnp.exp(self_sc - m)
        denom = jnp.sum(e_hist, axis=-1) + e_self
        p_hist = (e_hist / denom[:, :, None])
        p_all = jnp.where(sel[None, :, None, :],
                          p_hist[:, :, :, None], 0.0).astype(k_lin.dtype)
        out = jnp.einsum("sqch,schd->sqd", p_all, v_lin,
                         preferred_element_type=jnp.float32)
        v_rep = jnp.repeat(v_self.astype(jnp.float32), rep, axis=1)
        out = out + (e_self / denom)[:, :, None] * v_rep
        return out.astype(qf.dtype)

    probs = jax.nn.softmax(scores, axis=-1)                  # [S, Hq, C]
    p_all = jnp.where(sel[None, :, None, :],
                      probs[:, :, None, :], 0.0).astype(k_lin.dtype)
    out = jnp.einsum("sqch,schd->sqd", p_all, v_lin,
                     preferred_element_type=jnp.float32)
    return out.astype(qf.dtype)


def dense_prefill_attention_ref(
    q: jnp.ndarray,               # [T, Hq, D]
    k_lin: jnp.ndarray,           # [ctx_pad, Hkv, D] — one slot's region
    v_lin: jnp.ndarray,
    q_positions: jnp.ndarray,     # int32 [T]
    total_len: jnp.ndarray,       # int32 scalar (prefix + real chunk)
    *,
    scale: float,
    sliding_window: Optional[int] = None,
    softcap: Optional[float] = None,
    k_new: Optional[jnp.ndarray] = None,   # [T, Hkv, D] chunk K (deferred)
    v_new: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Chunked-prefill attention over a slot-contiguous KV slice.

    Deferred-append mode (k_new/v_new given): the cache holds only the
    PREFIX; the chunk's own K/V are concatenated in-activation (per-seq
    prefill, so the concat is small) and causally masked.

    Operands stay in storage dtype (MXU f32 accumulation); the chunk
    dim T is the matmul M dim, so these are well-shaped GEMMs.
    """
    t, hq, d = q.shape
    ctx_pad, hkv, _ = k_lin.shape
    rep = hq // hkv
    qpos = q_positions[:, None]
    if k_new is not None:
        hist_len = total_len - jnp.sum(
            (q_positions < total_len).astype(jnp.int32))  # prefix length
        k_all = jnp.concatenate([k_lin, k_new.astype(k_lin.dtype)], axis=0)
        v_all = jnp.concatenate([v_lin, v_new.astype(v_lin.dtype)], axis=0)
        kpos = jnp.concatenate([
            jax.lax.iota(jnp.int32, ctx_pad),
            q_positions])                 # chunk K rows sit at their abs pos
        valid_base = jnp.concatenate([
            jax.lax.iota(jnp.int32, ctx_pad) < hist_len,
            q_positions < total_len])
        kpos_b = kpos[None, :]
        valid = valid_base[None, :] & (kpos_b <= qpos)
    else:
        k_all, v_all = k_lin, v_lin
        kpos_b = jax.lax.broadcasted_iota(jnp.int32, (t, ctx_pad), 1)
        valid = (kpos_b <= qpos) & (kpos_b < total_len)
    if sliding_window is not None:
        valid &= kpos_b > (qpos - sliding_window)

    qf = (q.astype(jnp.float32) * scale).astype(q.dtype) \
        .reshape(t, hkv, rep, d)
    scores = jnp.einsum("thrd,chd->thrc", qf, k_all,
                        preferred_element_type=jnp.float32)
    scores = _maybe_softcap(scores, softcap)
    scores = jnp.where(valid[:, None, None, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("thrc,chd->thrd", probs, v_all,
                     preferred_element_type=jnp.float32)
    return out.reshape(t, hq, d).astype(q.dtype)


def paged_prefill_attention_ref(
    q: jnp.ndarray,               # [T, Hq, D] — chunk queries (one sequence)
    k_cache: jnp.ndarray,         # [num_blocks, page, Hkv, D]
    v_cache: jnp.ndarray,
    block_table: jnp.ndarray,     # int32 [max_pages] — this sequence's table
    q_positions: jnp.ndarray,     # int32 [T] — absolute positions (pad = large)
    total_len: jnp.ndarray,       # int32 scalar — prefix + real chunk length
    *,
    ctx_pad: int,
    scale: float,
    sliding_window: Optional[int] = None,
    softcap: Optional[float] = None,
) -> jnp.ndarray:
    """Chunked-prefill attention for one sequence. Returns [T, Hq, D].

    The chunk's K/V are already written into the cache; queries at
    absolute position p attend to cached positions <= p (causal over
    prefix + chunk), ref: paged_varlen_attention.cu semantics.
    """
    t, hq, d = q.shape
    page = k_cache.shape[1]
    hkv = k_cache.shape[2]
    rep = hq // hkv

    k = gather_kv(k_cache, block_table[None, :], ctx_pad, page)[0]  # [C,Hkv,D]
    v = gather_kv(v_cache, block_table[None, :], ctx_pad, page)[0]

    qf = q.astype(jnp.float32).reshape(t, hkv, rep, d)
    scores = jnp.einsum("thrd,chd->thrc", qf * scale, k.astype(jnp.float32))

    kpos = jax.lax.broadcasted_iota(jnp.int32, (t, ctx_pad), 1)
    qpos = q_positions[:, None]
    valid = (kpos <= qpos) & (kpos < total_len)
    if sliding_window is not None:
        valid &= kpos > (qpos - sliding_window)
    scores = _maybe_softcap(scores, softcap)
    scores = jnp.where(valid[:, None, None, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("thrc,chd->thrd", probs, v.astype(jnp.float32))
    return out.reshape(t, hq, d).astype(q.dtype)


def kv_cache_append(
    k_cache: jnp.ndarray,          # [num_blocks, page, Hkv, D]
    v_cache: jnp.ndarray,
    k_new: jnp.ndarray,            # [T, Hkv, D]
    v_new: jnp.ndarray,
    flat_slots: jnp.ndarray,       # int32 [T] — block * page + offset; OOB = drop
):
    """Scatter new K/V rows into the paged cache (fused-append analog,
    ref: kernels/kv_cache_append.cu). Returns updated (k_cache, v_cache).

    Padding tokens use flat_slots >= num_blocks*page, which XLA scatter
    drops (out-of-bounds update semantics: skipped).
    """
    nb, page, hkv, d = k_cache.shape
    kf = k_cache.reshape(nb * page, hkv, d)
    vf = v_cache.reshape(nb * page, hkv, d)
    kf = kf.at[flat_slots].set(k_new.astype(kf.dtype), mode="drop")
    vf = vf.at[flat_slots].set(v_new.astype(vf.dtype), mode="drop")
    return kf.reshape(nb, page, hkv, d), vf.reshape(nb, page, hkv, d)


# ---------------------------------------------------------------------------
# Flat-layout attention (cache minor dim stays F = Hkv*D; no reshape/copy)
# ---------------------------------------------------------------------------

def _mask_q_flat(q: jnp.ndarray, hkv: int) -> jnp.ndarray:
    """q [N, Hq, D] → block-diagonal [N, Hq, Hkv*D]: each q head's values
    sit in its own kv head's lane block, zeros elsewhere. Contracting
    this against the flat cache [C, Hkv*D] yields per-own-head scores in
    ONE large matmul — no cache reshape, no cross-head select."""
    n, hq, d = q.shape
    rep = hq // hkv
    qh_ids = jax.lax.broadcasted_iota(jnp.int32, (hq, hkv), 0) // rep
    h_ids = jax.lax.broadcasted_iota(jnp.int32, (hq, hkv), 1)
    sel = (qh_ids == h_ids)                                  # [Hq, Hkv]
    qt = jnp.where(sel[None, :, :, None], q[:, :, None, :], 0)
    return qt.reshape(n, hq, hkv * d)


def _unmask_out_flat(out_all: jnp.ndarray, hq: int, hkv: int,
                     d: int) -> jnp.ndarray:
    """out_all [N, Hq, Hkv*D] (pv over ALL heads' lanes) → [N, Hq, D]
    selecting each q head's own lane block."""
    n = out_all.shape[0]
    rep = hq // hkv
    qh_ids = jax.lax.broadcasted_iota(jnp.int32, (hq, hkv), 0) // rep
    h_ids = jax.lax.broadcasted_iota(jnp.int32, (hq, hkv), 1)
    sel = (qh_ids == h_ids)
    o4 = out_all.reshape(n, hq, hkv, d)
    return jnp.sum(jnp.where(sel[None, :, :, None], o4, 0), axis=2)


def flat_decode_attention(
    q: jnp.ndarray,               # [S, Hq, D]
    k_flat: jnp.ndarray,          # [S, C, F] slot-contiguous, F = Hkv*D
    v_flat: jnp.ndarray,
    context_lens: jnp.ndarray,    # int32 [S] incl. current token
    k_self: jnp.ndarray,          # [S, Hkv, D]
    v_self: jnp.ndarray,
    *,
    hkv: int,
    scale: float,
    sliding_window: Optional[int] = None,
    softcap: Optional[float] = None,
    k_scale: Optional[jnp.ndarray] = None,   # f32 [S, C, Hkv] (int8 KV)
    v_scale: Optional[jnp.ndarray] = None,
    k_win: Optional[jnp.ndarray] = None,     # [W, S, Hkv, D] in-window K
    v_win: Optional[jnp.ndarray] = None,
    win_valid: Optional[jnp.ndarray] = None,  # bool [S, W]
    cache_len: Optional[jnp.ndarray] = None,  # int32 [S] frozen lens of
                                              # the cache (win mode)
) -> jnp.ndarray:
    """Deferred-append decode attention over the flat cache layout.

    INT8 KV: k_flat/v_flat are int8 with per-(token, kv-head) scales.
    The scale is constant within a head's F segment and the masked-q
    layout gives each q row exactly one head segment, so dequant
    commutes out of both matmuls: scores *= k_scale (post-QK) and
    p_hist *= v_scale (pre-PV). Exact, and the cache streams at half
    the bytes (ref: int8_paged_decode_attention.cu).

    k_win/v_win: K/V of tokens generated EARLIER IN THIS WINDOW that are
    not in the cache yet (the KV-out-of-scan-carry design: the cache is
    scan-invariant, so XLA never copies the multi-GB pool per step;
    in-window tokens attend via these masked extra terms instead)."""
    s, hq, d = q.shape
    ctx_pad = k_flat.shape[1]
    rep = hq // hkv
    qf = (q.astype(jnp.float32) * scale).astype(q.dtype)
    qt = _mask_q_flat(qf, hkv)                               # [S, Hq, F]
    kf = k_flat.astype(qt.dtype) if k_flat.dtype == jnp.int8 else k_flat
    scores = jnp.einsum("sqf,scf->sqc", qt, kf,
                        preferred_element_type=jnp.float32)  # [S, Hq, C]
    if k_scale is not None:
        # [S, C, Hkv] -> per q-head row [S, Hq, C]
        ks_q = jnp.repeat(jnp.swapaxes(k_scale, 1, 2), rep, axis=1)
        scores = scores * ks_q
    hist_src = context_lens if cache_len is None else cache_len
    hist_len = hist_src[:, None] - 1
    pos = jax.lax.broadcasted_iota(jnp.int32, (s, ctx_pad), 1)
    valid = pos < hist_len
    if sliding_window is not None:
        valid &= pos >= (context_lens[:, None] - sliding_window)
    scores = _maybe_softcap(scores, softcap)
    scores = jnp.where(valid[:, None, :], scores, NEG_INF)

    self_sc = jnp.einsum("sqf,sf->sq", qt,
                         k_self.reshape(s, hkv * d),
                         preferred_element_type=jnp.float32)  # [S, Hq]
    self_sc = _maybe_softcap(self_sc, softcap)

    win_sc = None
    if k_win is not None:
        kw = jnp.moveaxis(k_win, 0, 1).reshape(s, -1, hkv * d)
        win_sc = jnp.einsum("sqf,swf->sqw", qt,
                            kw.astype(qt.dtype),
                            preferred_element_type=jnp.float32)
        win_sc = _maybe_softcap(win_sc, softcap)
        win_sc = jnp.where(win_valid[:, None, :], win_sc, NEG_INF)

    m = jnp.maximum(jnp.max(scores, axis=-1), self_sc)
    if win_sc is not None:
        m = jnp.maximum(m, jnp.max(win_sc, axis=-1))
    e_hist = jnp.exp(scores - m[:, :, None])
    e_self = jnp.exp(self_sc - m)
    denom = jnp.sum(e_hist, axis=-1) + e_self
    e_win = None
    if win_sc is not None:
        e_win = jnp.exp(win_sc - m[:, :, None])
        denom = denom + jnp.sum(e_win, axis=-1)
    p_hist = e_hist / denom[:, :, None]
    if v_scale is not None:
        vs_q = jnp.repeat(jnp.swapaxes(v_scale, 1, 2), rep, axis=1)
        p_hist = p_hist * vs_q
    p_hist = p_hist.astype(qt.dtype)
    vf = v_flat.astype(qt.dtype) if v_flat.dtype == jnp.int8 else v_flat
    out_all = jnp.einsum("sqc,scf->sqf", p_hist, vf,
                         preferred_element_type=jnp.float32)  # [S, Hq, F]
    if e_win is not None:
        vw = jnp.moveaxis(v_win, 0, 1).reshape(s, -1, hkv * d)
        p_win = (e_win / denom[:, :, None]).astype(qt.dtype)
        out_all = out_all + jnp.einsum(
            "sqw,swf->sqf", p_win, vw.astype(qt.dtype),
            preferred_element_type=jnp.float32)
    out = _unmask_out_flat(out_all, hq, hkv, d)
    v_rep = jnp.repeat(v_self.astype(jnp.float32), rep, axis=1)
    out = out + (e_self / denom)[:, :, None] * v_rep
    return out.astype(q.dtype)


def flat_prefill_window_attention(
    q: jnp.ndarray,               # [P, Hq, D] — step-t block of ONE slot's chunk
    k_ctx: jnp.ndarray,           # [C, F] the slot's pool region (prefix)
    v_ctx: jnp.ndarray,
    ctx_len: jnp.ndarray,         # int32 scalar: pool tokens for this slot
    win_k: jnp.ndarray,           # [T, P, Hkv, D] in-window prefill K acc
    win_v: jnp.ndarray,
    step: jnp.ndarray,            # int32 scalar: rows of steps < step visible
    chunk_start: jnp.ndarray,     # int32 scalar: position of win row 0
    valid_len: jnp.ndarray,       # int32 scalar: real rows in the chunk
    k_new: jnp.ndarray,           # [P, Hkv, D] this block's K (pre-append)
    v_new: jnp.ndarray,
    q_positions: jnp.ndarray,     # int32 [P] (pad rows: large OOB, increasing)
    *,
    hkv: int,
    scale: float,
    sliding_window: Optional[int] = None,
    softcap: Optional[float] = None,
    k_scale: Optional[jnp.ndarray] = None,   # f32 [C, Hkv] (int8 KV pool)
    v_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Chunked-prefill attention for a P-row block INSIDE a fused decode
    window (the mixed prefill+decode design: prefill rows ride the
    decode steps' already-paid weight stream, so a steady-state refill
    costs ~zero extra HBM traffic instead of a full per-chunk model
    read — the TPU answer to the reference's mixed decode+prefill
    batches, crates/ferrum-engine/src/continuous_engine/inner/batch.rs).

    Three key segments, one softmax:
      - the slot's pool prefix (tokens prefilled BEFORE this window;
        int8 KV dequant rides post-QK / pre-PV as flat_decode_attention)
      - earlier in-window blocks of the same chunk (steps < `step`,
        accumulated in win_k/win_v — not yet in the pool)
      - the current block itself, causal.
    """
    p, hq, d = q.shape
    c_pad = k_ctx.shape[0]
    t_steps = win_k.shape[0]
    rep = hq // hkv
    f = hkv * d
    qf = (q.astype(jnp.float32) * scale).astype(q.dtype)
    qt = _mask_q_flat(qf, hkv)                               # [P, Hq, F]

    kc = k_ctx.astype(qt.dtype) if k_ctx.dtype == jnp.int8 else k_ctx
    vc = v_ctx.astype(qt.dtype) if v_ctx.dtype == jnp.int8 else v_ctx
    kw = win_k.reshape(t_steps * p, f).astype(qt.dtype)
    vw = win_v.reshape(t_steps * p, f).astype(qt.dtype)
    kn = k_new.reshape(p, f).astype(qt.dtype)
    vn = v_new.reshape(p, f).astype(qt.dtype)
    k_all = jnp.concatenate([kc, kw, kn], axis=0)            # [C+T*P+P, F]
    v_all = jnp.concatenate([vc, vw, vn], axis=0)

    w_idx = jax.lax.iota(jnp.int32, t_steps * p)
    kpos = jnp.concatenate([
        jax.lax.iota(jnp.int32, c_pad),                      # pool prefix
        chunk_start + w_idx,                                 # earlier blocks
        q_positions])                                        # self block
    valid_base = jnp.concatenate([
        jax.lax.iota(jnp.int32, c_pad) < ctx_len,
        (w_idx < step * p) & (w_idx < valid_len),
        q_positions < (chunk_start + valid_len)])
    qpos = q_positions[:, None]
    valid = valid_base[None, :] & (kpos[None, :] <= qpos)
    # Causal tie-break: the self block's own row attends to itself; no
    # two VALID rows share a position, so <= is exact.
    if sliding_window is not None:
        valid &= kpos[None, :] > (qpos - sliding_window)

    scores = jnp.einsum("pqf,cf->pqc", qt, k_all,
                        preferred_element_type=jnp.float32)
    if k_scale is not None:
        ones = jnp.ones((t_steps * p + p, hkv), k_scale.dtype)
        ks_all = jnp.concatenate([k_scale, ones], axis=0)
        scores = scores * jnp.repeat(ks_all.T, rep, axis=0)[None]
    scores = _maybe_softcap(scores, softcap)
    scores = jnp.where(valid[:, None, :], scores, NEG_INF)
    # Pad q rows can have all keys masked; guard the softmax.
    any_valid = jnp.any(valid, axis=-1)                      # [P]
    scores = jnp.where(any_valid[:, None, None], scores, 0.0)
    probs = jax.nn.softmax(scores, axis=-1)
    if v_scale is not None:
        ones = jnp.ones((t_steps * p + p, hkv), v_scale.dtype)
        vs_all = jnp.concatenate([v_scale, ones], axis=0)
        probs = probs * jnp.repeat(vs_all.T, rep, axis=0)[None]
    probs = probs.astype(qt.dtype)
    out_all = jnp.einsum("pqc,cf->pqf", probs, v_all,
                         preferred_element_type=jnp.float32)
    return _unmask_out_flat(out_all, hq, hkv, d).astype(q.dtype)


def flat_prefill_attention(
    q: jnp.ndarray,               # [T, Hq, D] — one slot's chunk
    k_flat: jnp.ndarray,          # [C, F] slot region (prefix only)
    v_flat: jnp.ndarray,
    q_positions: jnp.ndarray,     # int32 [T]
    total_len: jnp.ndarray,       # int32 scalar
    k_new: jnp.ndarray,           # [T, Hkv, D] chunk K (not yet in cache)
    v_new: jnp.ndarray,
    *,
    hkv: int,
    scale: float,
    sliding_window: Optional[int] = None,
    softcap: Optional[float] = None,
    k_scale: Optional[jnp.ndarray] = None,   # f32 [C, Hkv] (int8 KV)
    v_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Deferred-append chunked-prefill attention, flat layout.

    INT8 KV: the cached prefix is int8 + per-(token, head) scales; the
    in-flight chunk (k_new/v_new) stays full precision. Dequant rides
    post-QK / pre-PV exactly as flat_decode_attention."""
    t, hq, d = q.shape
    ctx_pad = k_flat.shape[0]
    rep = hq // hkv
    qf = (q.astype(jnp.float32) * scale).astype(q.dtype)
    qt = _mask_q_flat(qf, hkv)                               # [T, Hq, F]
    kfp = k_flat.astype(qt.dtype) if k_flat.dtype == jnp.int8 else k_flat
    vfp = v_flat.astype(qt.dtype) if v_flat.dtype == jnp.int8 else v_flat
    k_all = jnp.concatenate(
        [kfp, k_new.reshape(t, hkv * d).astype(kfp.dtype)], axis=0)
    v_all = jnp.concatenate(
        [vfp, v_new.reshape(t, hkv * d).astype(vfp.dtype)], axis=0)
    hist_len = total_len - jnp.sum(
        (q_positions < total_len).astype(jnp.int32))
    kpos = jnp.concatenate([jax.lax.iota(jnp.int32, ctx_pad), q_positions])
    valid_base = jnp.concatenate([
        jax.lax.iota(jnp.int32, ctx_pad) < hist_len,
        q_positions < total_len])
    qpos = q_positions[:, None]
    valid = valid_base[None, :] & (kpos[None, :] <= qpos)
    if sliding_window is not None:
        valid &= kpos[None, :] > (qpos - sliding_window)
    scores = jnp.einsum("tqf,cf->tqc", qt, k_all,
                        preferred_element_type=jnp.float32)
    if k_scale is not None:
        ones = jnp.ones((t, hkv), k_scale.dtype)
        ks_all = jnp.concatenate([k_scale, ones], axis=0)    # [C+T, Hkv]
        scores = scores * jnp.repeat(ks_all.T, rep, axis=0)[None]
    scores = _maybe_softcap(scores, softcap)
    scores = jnp.where(valid[:, None, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    if v_scale is not None:
        ones = jnp.ones((t, hkv), v_scale.dtype)
        vs_all = jnp.concatenate([v_scale, ones], axis=0)
        probs = probs * jnp.repeat(vs_all.T, rep, axis=0)[None]
    probs = probs.astype(qt.dtype)
    out_all = jnp.einsum("tqc,cf->tqf", probs, v_all,
                         preferred_element_type=jnp.float32)
    return _unmask_out_flat(out_all, hq, hkv, d).astype(q.dtype)
