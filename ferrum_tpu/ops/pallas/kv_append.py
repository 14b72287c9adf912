"""Pallas KV-append kernels: page-granular cache writes, no XLA scatter.

TPU-native analog of the reference's kv_cache_append.cu. Two findings
drive the design (profiler-verified on v5e):
  - XLA's generic scatter serializes (~14 us/row) — unusable in the hot
    loop;
  - reshapes that split the cache's minor dim (F = Hkv*D) change the
    physical tile layout and copy the whole pool (~6.5 ms per 2.2 GB
    array per step).

So the cache keeps its flat [num_blocks, page, F] layout end-to-end and
these kernels write it in place:
  - kv_append_rows: one row per grid step (decode; each step's rows land
    in DISTINCT pages). The target page is read-modify-written with a
    masked select — no dynamic sublane stores.
  - kv_append_pages: whole-page writes (prefill; chunk starts are
    page-aligned by the scheduler, so chunks cover whole pages).

Both alias the cache input to the output (in-place; untouched pages
preserved) and redirect invalid indices to a write-back of the current
contents (a no-op). CPU fallback: jnp scatter (the parity oracle).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import on_tpu


def _rows_kernel_factory(num_blocks: int, page: int):
    def kernel(blk_ref, off_ref, row_ref, cur_ref, o_ref):
        i = pl.program_id(0)
        valid = blk_ref[i] < num_blocks
        off = off_ref[i]
        rows_iota = jax.lax.broadcasted_iota(
            jnp.int32, (page, 1), 0)                       # [page, 1]
        mask = (rows_iota == off) & valid
        o_ref[0] = jnp.where(mask, row_ref[0, 0][None, :], cur_ref[0])
    return kernel


def kv_append_rows(cache: jnp.ndarray, rows: jnp.ndarray,
                   block_ids: jnp.ndarray,
                   offsets: jnp.ndarray) -> jnp.ndarray:
    """cache [B, page, F]; rows [N, F]; block_ids/offsets int32 [N]
    (block_ids >= B → dropped). Each (block, offset) pair must be unique
    within a call (decode rows are: one per (layer, slot))."""
    b, page, f = cache.shape
    n = rows.shape[0]

    def clamp(i, blk_ref, off_ref):
        return (jnp.minimum(blk_ref[i], b - 1), 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 1, f), lambda i, b_, o_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, page, f), clamp, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, page, f), clamp,
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _rows_kernel_factory(b, page),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(cache.shape, cache.dtype),
        input_output_aliases={3: 0},   # cache operand → output
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(block_ids.astype(jnp.int32), offsets.astype(jnp.int32),
      rows.reshape(n, 1, f).astype(cache.dtype), cache)


def kv_append_pages(cache: jnp.ndarray, pages: jnp.ndarray,
                    block_ids: jnp.ndarray) -> jnp.ndarray:
    """cache [B, page, F]; pages [P, page, F]; block_ids int32 [P]
    (>= B → dropped). Whole-page overwrite (prefill)."""
    b, page, f = cache.shape
    p = pages.shape[0]

    def clamp(i, blk_ref):
        return (jnp.minimum(blk_ref[i], b - 1), 0, 0)

    def kernel(blk_ref, pg_ref, cur_ref, o_ref):
        i = pl.program_id(0)
        valid = blk_ref[i] < b
        o_ref[:] = jnp.where(valid, pg_ref[:], cur_ref[:])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(p,),
        in_specs=[
            pl.BlockSpec((1, page, f), lambda i, b_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, page, f), clamp, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, page, f), clamp,
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(cache.shape, cache.dtype),
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(block_ids.astype(jnp.int32), pages.astype(cache.dtype), cache)


# ---------------------------------------------------------------------------
# Dispatch wrappers with jnp fallback (parity oracle)
# ---------------------------------------------------------------------------

def append_rows(cache: jnp.ndarray, rows: jnp.ndarray,
                block_ids: jnp.ndarray,
                offsets: jnp.ndarray) -> jnp.ndarray:
    b, page, f = cache.shape
    if not on_tpu():
        flat = cache.reshape(b * page, f)
        idx = jnp.where(block_ids < b, block_ids * page + offsets,
                        b * page + 7)
        flat = flat.at[idx].set(rows.astype(cache.dtype), mode="drop")
        return flat.reshape(b, page, f)
    return kv_append_rows(cache, rows, block_ids, offsets)


def append_pages(cache: jnp.ndarray, pages: jnp.ndarray,
                 block_ids: jnp.ndarray) -> jnp.ndarray:
    b, page, f = cache.shape
    if not on_tpu():
        idx = jnp.where(block_ids < b, block_ids, b + 7)
        return cache.at[idx].set(pages.astype(cache.dtype), mode="drop")
    return kv_append_pages(cache, pages, block_ids)
