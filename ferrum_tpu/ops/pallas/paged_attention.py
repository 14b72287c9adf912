"""Pallas ragged paged decode attention — the TPU PagedAttention kernel.

TPU-native analog of the reference's decode-attention kernel family
(crates/ferrum-kernels/kernels/{paged_decode_attention,
batched_flash_decode_attention}.cu and the vendored vLLM
paged_attention_v2.cu): one query token per sequence slot attends over
that sequence's paged KV cache via its block table.

Design (per the TPU hardware model, not a CUDA translation):
  - grid = (S,) — one program per sequence slot; the kernel walks ONLY
    the slot's real pages (ragged — no padded-context compute), so a
    single compilation serves every context length.
  - block tables + context lens ride scalar prefetch (SMEM) and drive
    double-buffered async DMA of KV pages HBM → VMEM, overlapping the
    next page's fetch with the current page's flash-softmax update.
  - K and V of a page are fetched as one contiguous [page, Hkv*D] copy
    each (the cache's native layout), maximizing DMA efficiency.
  - GQA: all Hq = Hkv*rep query heads of the slot are processed in one
    program; per-KV-head score matmuls are [rep, D] x [D, page] MXU ops.

Numerics: online (flash) softmax in f32; parity oracle =
ops/attention.paged_decode_attention_ref (tests/test_pallas_kernels.py).

Production status (owned decision, VERDICT r3 #6): the serving fast
path is the LINEAR slot-contiguous layout, where attention is a fused
dense slice inside the decode scan — no gather, no per-sequence grid —
and at the bench context (256+128) the XLA gather reference also beats
this kernel inside the fused window (the (S,) grid serializes on the
v5e's single TensorCore while each step's work is small). This kernel
is therefore OPT-IN (attn_impl="pallas"), aimed at long-context paged
serving where attention bytes dominate and the ragged page walk +
N_BUF-deep DMA ring pay off; tools/bench_attn_ab.py is the in-engine
A/B (ctx>=2048) that must show a win before it becomes the paged
default.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
N_BUF = 8  # DMA ring depth (pages of K+V in flight)


def _decode_kernel(
    # scalar prefetch
    tables_ref,        # SMEM int32 [S, max_pages]
    lens_ref,          # SMEM int32 [S]
    # inputs
    q_ref,             # VMEM [1, Hq, D]
    kc_ref,            # HBM  [NB, page, HkvD]
    vc_ref,            # HBM  [NB, page, HkvD]
    # outputs
    o_ref,             # VMEM [1, Hq, D]
    # scratch
    k_buf, v_buf,      # VMEM [2, page, HkvD]
    acc_ref,           # VMEM [Hq, D] f32
    m_ref, l_ref,      # VMEM [Hq, 128] f32 (col 0 used)
    sems,              # DMA sems [2, 2]
    *,
    page: int,
    hkv: int,
    head_dim: int,
    rep: int,
    scale: float,
    max_pages: int,
    sliding_window: Optional[int],
    softcap: Optional[float],
):
    s = pl.program_id(0)
    seq_len = lens_ref[s]
    n_pages = pl.cdiv(seq_len, page)
    first_page = 0
    if sliding_window is not None:
        first_page = jnp.maximum(seq_len - sliding_window, 0) // page

    def page_dma(slot, p_idx):
        blk = tables_ref[s, p_idx]
        return (
            pltpu.make_async_copy(kc_ref.at[blk], k_buf.at[slot],
                                  sems.at[slot, 0]),
            pltpu.make_async_copy(vc_ref.at[blk], v_buf.at[slot],
                                  sems.at[slot, 1]),
        )

    # Deep DMA ring: keep up to N_BUF pages' K+V copies in flight so the
    # walk is bandwidth-bound, not DMA-latency-bound (double buffering
    # alone leaves the engine idle between 64KB copies).
    for b in range(N_BUF):
        @pl.when(first_page + b < n_pages)
        def _(b=b):
            for d in page_dma(b, first_page + b):
                d.start()

    acc_ref[:] = jnp.zeros_like(acc_ref)
    m_ref[:] = jnp.full_like(m_ref, NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0].astype(jnp.float32) * scale        # [Hq, D]

    def body(i, _):
        p_idx = first_page + i
        slot = jax.lax.rem(i, N_BUF)

        for d in page_dma(slot, p_idx):
            d.wait()

        k = k_buf[slot].reshape(page, hkv, head_dim)   # bf16
        v = v_buf[slot].reshape(page, hkv, head_dim)

        # positions of this page, mask to [0, seq_len) (+ window)
        pos = p_idx * page + jax.lax.broadcasted_iota(
            jnp.int32, (1, page), 1)                   # [1, page]
        valid = pos < seq_len
        if sliding_window is not None:
            valid &= pos >= (seq_len - sliding_window)

        # scores for all q heads: per-kv-head [rep, D] x [D, page]
        scores_parts = []
        for h in range(hkv):
            qh = q[h * rep:(h + 1) * rep, :]           # [rep, D]
            kh = k[:, h, :].astype(jnp.float32)        # [page, D]
            sc = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)    # [rep, page]
            scores_parts.append(sc)
        scores = jnp.concatenate(scores_parts, axis=0)  # [Hq, page]
        if softcap is not None:
            scores = softcap * jnp.tanh(scores / softcap)
        scores = jnp.where(valid, scores, NEG_INF)

        # online softmax update
        m_prev = m_ref[:, 0:1]                          # [Hq, 1]
        m_cur = jnp.max(scores, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p_exp = jnp.exp(scores - m_new)                 # [Hq, page]
        l_ref[:, 0:1] = l_ref[:, 0:1] * alpha + jnp.sum(
            p_exp, axis=1, keepdims=True)
        m_ref[:, 0:1] = m_new

        pv_parts = []
        for h in range(hkv):
            ph = p_exp[h * rep:(h + 1) * rep, :]        # [rep, page]
            vh = v[:, h, :].astype(jnp.float32)         # [page, D]
            pv_parts.append(jax.lax.dot_general(
                ph, vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))    # [rep, D]
        pv = jnp.concatenate(pv_parts, axis=0)          # [Hq, D]
        acc_ref[:] = acc_ref[:] * alpha + pv

        # Refill the ring slot we just consumed with page i + N_BUF.
        @pl.when(p_idx + N_BUF < n_pages)
        def _():
            for d in page_dma(slot, p_idx + N_BUF):
                d.start()
        return 0

    jax.lax.fori_loop(0, n_pages - first_page, body, 0)

    l_safe = jnp.maximum(l_ref[:, 0:1], 1e-30)
    o_ref[0] = (acc_ref[:] / l_safe).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "sliding_window", "softcap"))
def paged_decode_attention(
    q: jnp.ndarray,              # [S, Hq, D]
    k_cache: jnp.ndarray,        # [NB, page, Hkv, D]
    v_cache: jnp.ndarray,
    block_tables: jnp.ndarray,   # int32 [S, max_pages]
    context_lens: jnp.ndarray,   # int32 [S]
    *,
    scale: float,
    sliding_window: Optional[int] = None,
    softcap: Optional[float] = None,
) -> jnp.ndarray:
    s, hq, d = q.shape
    nb, page, hkv, _ = k_cache.shape
    rep = hq // hkv
    max_pages = block_tables.shape[1]

    kernel = functools.partial(
        _decode_kernel, page=page, hkv=hkv, head_dim=d, rep=rep,
        scale=scale, max_pages=max_pages,
        sliding_window=sliding_window, softcap=softcap)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(s,),
        in_specs=[
            pl.BlockSpec((1, hq, d), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, hq, d), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((N_BUF, page, hkv * d), k_cache.dtype),
            pltpu.VMEM((N_BUF, page, hkv * d), v_cache.dtype),
            pltpu.VMEM((hq, d), jnp.float32),
            pltpu.VMEM((hq, 128), jnp.float32),
            pltpu.VMEM((hq, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((N_BUF, 2)),
        ],
    )

    kc = k_cache.reshape(nb, page, hkv * d)
    vc = v_cache.reshape(nb, page, hkv * d)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, hq, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(block_tables, context_lens, q, kc, vc)
