"""ModelRunner: owns device state and the compiled prefill/decode steps.

TPU-native analog of the reference's CudaDecodeRunner + LlmExecutor
(crates/ferrum-kernels/src/backend/cuda/cuda_decode.rs:191,
crates/ferrum-models/src/executor/llm_executor.rs:187) — with XLA
compilation replacing CUDA-Graph capture:

  - ONE jitted program per (phase, bucket): decode is compiled per
    padded-context bucket; prefill per (chunk-pad, context) bucket.
    Buckets are powers of two, so recompilation is rare and cached —
    the TPU analog of the reference's graph cache keyed by padded batch
    (llama_family.rs:36-38).
  - KV cache, repetition-penalty counts and PRNG keys are donated
    through every step → XLA updates them in place in HBM.
  - Greedy/sampled tokens are chosen on device; only the [S] token ids
    cross back to the host per step (ref: FERRUM_GREEDY_ARGMAX GPU
    argmax fast path, traits.rs:1534).
"""

from __future__ import annotations

import math
import threading
import time
from dataclasses import dataclass
from functools import partial
from typing import Dict, FrozenSet, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EngineConfig
from ..models.configs import ModelConfig
from ..models.llama_family import (
    OOB_SENTINEL, ModelParams, PagedKvCache, append_window_kv,
    decode_forward, logits_from_hidden, prefill_forward_batched,
)
from ..utils import profile as _prof
from ..sampling.device import (
    SlotSamplingParams, guided_advance, guided_mask_rows, sample_step,
    update_counts,
)
from ..scheduler.continuous import PrefillChunk
from ..scheduler.sequence import Sequence
from ..types import NotSupportedError


def _round_up_pow2(x: int, lo: int, hi: int) -> int:
    x = max(x, lo)
    return min(1 << (x - 1).bit_length(), hi)


@dataclass
class BatchPrefillResult:
    """Unfetched device results of one batched prefill dispatch."""

    tokens: "jax.Array"               # int32 [B_pad] sampled first tokens
    logits: Optional["jax.Array"]     # f32 [B_pad, V] final-position logits
    rows: Dict[str, int]              # request id -> row index
    # Score mode (prompt logprobs — /v1/completions echo+logprobs):
    # per-position target logprob, argmax id, argmax logprob [B, t_pad].
    score_lp: Optional["jax.Array"] = None
    score_argmax: Optional["jax.Array"] = None
    score_argmax_lp: Optional["jax.Array"] = None


@dataclass
class DecodeWindow:
    """An in-flight fused decode window (num_steps tokens per active
    slot) whose results have NOT been fetched yet.

    The pipelined engine loop keeps one of these outstanding: window
    W+1 is dispatched (chained on device from W's final tokens) BEFORE
    W's tokens are read back, so the ~31 ms dispatch/readback RTT and
    all host bookkeeping overlap with device compute. This is the TPU
    answer to the reference's always-busy CUDA decode stream
    (crates/ferrum-engine/src/continuous_engine/inner/decode.rs).

    Occupancy bucketing: the program runs over `s_pad` compacted LANES
    (pow2 bucket of the active-sequence count), not the full slot
    frame — attention, sampling and state updates cost O(occupancy)
    while the weight stream stays per-step. `lanes` maps request id →
    lane column of `toks`. Chaining is lane-layout independent: every
    window scatters its final tokens into the slot-indexed `last_toks`
    device array the next window reads from.
    """

    seqs: List["Sequence"]            # active lanes at dispatch time
    covered: frozenset                # request ids riding this window
    toks: "jax.Array"                 # [T, s_pad] device array (unfetched)
    end_pos: Dict[int, int]           # slot -> position AFTER the window
    num_steps: int
    lanes: Dict[str, int] = None      # request id -> lane column
    # Sequences whose slot/KV release is deferred until this window's
    # results are fetched (their lanes may still be written by it).
    deferred: List["Sequence"] = None
    # Mixed prefill+decode: the chunk that rode this window (its first
    # token, when pf_is_last, is the pf_tok [1] device array).
    pf_seq: Optional["Sequence"] = None
    pf_is_last: bool = False
    pf_tok: Optional["jax.Array"] = None

    def __post_init__(self):
        if self.deferred is None:
            self.deferred = []
        if self.lanes is None:
            self.lanes = {}


class ModelRunner:
    def __init__(self, model_cfg: ModelConfig, engine_cfg: EngineConfig,
                 params: ModelParams, kv: PagedKvCache,
                 mesh=None, attn_impl: str = "auto"):
        self.model_cfg = model_cfg
        self.cfg = engine_cfg
        self.params = params
        self.kv = kv
        self.mesh = mesh
        if engine_cfg.kv_layout == "linear":
            # Slot-contiguous layout: attention is a fused dense slice.
            attn_impl = "linear"
        elif attn_impl == "auto":
            # Paged layout: the XLA gather-based attention IS the
            # production path (the Pallas DMA-ring kernel was removed
            # after losing its own ctx-2048 A/B bar 7.7x — the
            # per-sequence grid serializes on the single TensorCore).
            attn_impl = "ref"
        self.attn_impl = attn_impl

        s = engine_cfg.num_slots
        v = model_cfg.vocab_size
        self.num_slots = s
        self.max_pages = engine_cfg.max_blocks_per_seq
        self.page = kv.page

        # Device-resident per-slot state. Everything a decode step needs
        # lives on device; the host uploads ONE packed int array per call
        # (each host→device transfer costs a dispatch round trip on
        # tunneled backends).
        self.counts = jnp.zeros((s, v), jnp.int32)
        base = jax.random.key_data(jax.random.PRNGKey(engine_cfg.seed))
        self.keys = jnp.tile(base[None, :], (s, 1))
        self.samp = {
            "temps": jnp.zeros(s, jnp.float32),
            "top_ks": jnp.zeros(s, jnp.int32),
            "top_ps": jnp.ones(s, jnp.float32),
            "pens": jnp.ones(s, jnp.float32),
        }
        # Host mirrors (greedy-variant selection only).
        self._temps = np.zeros(s, np.float32)

        # Device-resident block tables with change tracking (static
        # identity in linear mode → uploaded once).
        self._tables_np = np.zeros((s, self.max_pages), np.int32)
        self._tables_dev = jnp.asarray(self._tables_np)

        self._decode_fns: Dict[Tuple, "jax.stages.Wrapped"] = {}
        self._decode_multi_fns: Dict[Tuple, "jax.stages.Wrapped"] = {}
        self._prefill_batch_fns: Dict[Tuple, "jax.stages.Wrapped"] = {}
        # Slot-indexed final tokens of the most recent decode window —
        # the device-side chain carry. Lane-layout independent: windows
        # of ANY bucket/length scatter into it and read from it, so
        # chains survive occupancy-bucket and window-length changes.
        self._last_toks = jnp.zeros(s, jnp.int32)

        # Linear-layout prefix store (ensure_prefix_store): None until
        # the engine enables copy-based prefix reuse.
        self.prefix_store: Optional[PagedKvCache] = None

        # --- device-FSM guided decoding (sampling/token_fsm.py) ---
        # Stacked tables for every registered FSM; row 0 = FREE state
        # (all tokens allowed, self-loop) for unguided slots. Per-slot
        # FSM state lives on device and advances INSIDE the fused
        # windows; host-side resets ride the next dispatch's init row.
        self._gstates = jnp.zeros(s, jnp.int32)
        self._gtrans_np = np.zeros((1, 258), np.int32)      # FREE row
        self._gmask_np = np.full((1, (v + 31) // 32),
                                 0xFFFFFFFF, np.uint32)
        self._gtrans_dev: Optional["jax.Array"] = None
        self._gmask_dev: Optional["jax.Array"] = None
        self._gtokcp_dev: Optional["jax.Array"] = None
        self._fsm_offsets: Dict[int, int] = {}              # id(fsm) -> row
        self._pending_ginit: Dict[int, int] = {}            # slot -> state
        self._grows_bucket = 0
        # Placeholder args for unguided program variants (traced but
        # unused; tiny constant shapes keyed by grows=0).
        self._gdummy_trans = jnp.zeros((1, 258), jnp.int32)
        self._gdummy_mask = jnp.zeros((1, 1), jnp.uint32)
        self._gdummy_init = jnp.full((s,), -1, jnp.int32)
        self._gdummy_tokcp = jnp.zeros((1, 1), jnp.int32)

        # --- hybrid (qwen3.5/qwen3-next) recurrent state pools ---
        # The RecurrentStateManager analog (recurrent_state.rs:141):
        # per-slot conv + delta states, donated through every compiled
        # step; chunk-0 prefill rows reset their slot in-program.
        self.hybrid = bool(model_cfg.gdn is not None
                           and model_cfg.num_linear_layers > 0)
        if self.hybrid:
            gc = model_cfg.gdn
            lg = model_cfg.num_linear_layers
            conv_dim = (2 * gc.num_key_heads * gc.key_head_dim
                        + gc.num_value_heads * gc.value_head_dim)
            pdtype = jax.tree_util.tree_leaves(params)[0].dtype
            self.rec_conv = jnp.zeros(
                (lg, s, conv_dim, gc.conv_kernel_dim - 1), pdtype)
            self.rec_delta = jnp.zeros(
                (lg, s, gc.num_value_heads, gc.key_head_dim,
                 gc.value_head_dim), jnp.float32)
        else:
            self.rec_conv = jnp.zeros((1, 1, 1, 1), jnp.float32)
            self.rec_delta = jnp.zeros((1, 1, 1, 1, 1), jnp.float32)

        def _admit(counts, keys, samp, slot, key, svals):
            counts = counts.at[slot].set(0)
            keys = keys.at[slot].set(key)
            samp = {
                "temps": samp["temps"].at[slot].set(svals[0]),
                "top_ks": samp["top_ks"].at[slot].set(
                    svals[1].astype(jnp.int32)),
                "top_ps": samp["top_ps"].at[slot].set(svals[2]),
                "pens": samp["pens"].at[slot].set(svals[3]),
            }
            return counts, keys, samp

        self._admit_fn = jax.jit(_admit, donate_argnums=(0, 1, 2))

        # Perf counters (ref: per-op atomic counters llama_family.rs:42-66).
        self.decode_steps = 0
        self.prefill_steps = 0
        self.compilations = 0
        # Compile audit trail: (site, key) per jit trace — the warmers'
        # coverage is asserted against this (a mid-cell entry in a bench
        # is a warm-up hole; bench_engine counts them per cell).
        self.compile_log: list = []
        self.decode_device_time = 0.0
        self.decode_sync_time = 0.0
        self.prefill_device_time = 0.0

    def _note_compile(self, site: str, key) -> None:
        """One jit trace: count it, audit it, and surface it to the
        observability product (compiles are the #1 latency cliff on the
        tunneled chip — a mid-measurement one is a warmup hole)."""
        self.compilations += 1
        self.compile_log.append((site, key))
        from ..utils import profile as _prof
        _prof.emit_instant("engine.compile",
                           {"site": site, "key": repr(key)},
                           status="diagnostic_only")

    # ------------------------------------------------------------------
    # Slot lifecycle
    # ------------------------------------------------------------------
    def admit_slot(self, seq: Sequence) -> None:
        sp = seq.request.sampling
        slot = seq.slot
        self._temps[slot] = sp.temperature
        seed = sp.seed if sp.seed is not None \
            else (self.cfg.seed ^ (hash(seq.request.request_id) & 0x7FFFFFFF))
        key = jax.random.key_data(jax.random.PRNGKey(seed))
        svals = np.asarray([sp.temperature, float(sp.top_k), sp.top_p,
                            sp.repetition_penalty], np.float32)
        self.counts, self.keys, self.samp = self._admit_fn(
            self.counts, self.keys, self.samp, slot, key,
            jnp.asarray(svals))

    # ------------------------------------------------------------------
    # Prefix store (linear-layout prefix cache; kv/linear_prefix.py)
    # ------------------------------------------------------------------
    def prefix_store_block_bytes(self) -> int:
        """Device bytes one prefix-store block costs (all layers, k+v,
        + int8 scales when quantized)."""
        kv = self.kv
        n_layers = kv.k.shape[0]
        f = kv.kv_heads * kv.head_dim
        per = n_layers * self.page * f * kv.k.dtype.itemsize * 2
        if kv.quantized:
            per += n_layers * self.page * kv.kv_heads * 4 * 2
        return per

    def prefix_store_budget_blocks(self,
                                   headroom_bytes: int = 4 << 30) -> int:
        """How many store blocks fit in free HBM after a headroom for
        program transients (batched-prefill logits peak >1 GB at 8B
        vocab). Unknown backends (no memory_stats) return a huge cap —
        the CPU test path is unconstrained."""
        try:
            ms = jax.local_devices()[0].memory_stats()
            free = ms.get("bytes_limit", 0) - ms.get("bytes_in_use", 0)
        except Exception:
            return 1 << 30
        if free <= 0:
            return 1 << 30
        return max(0, int(free - headroom_bytes)
                   // self.prefix_store_block_bytes())

    def ensure_prefix_store(self, num_blocks: int) -> None:
        """Allocate the device-side prefix store: a block extent with the
        same (layer, page, head) geometry as the KV pool, holding cached
        full prompt blocks. The linear layout hard-rejects CoW block
        sharing (slot regions are identity-mapped), so prefix reuse is
        copy-based instead: finish copies prompt blocks slot→store, a
        prefix hit copies them store→slot at admission (ref: prefix.rs
        reuse semantics, crates/ferrum-kv/src/cache/prefix.rs:113)."""
        if getattr(self, "prefix_store", None) is not None:
            return
        self.prefix_store = PagedKvCache.create(
            self.model_cfg, num_blocks, self.page,
            dtype=self.kv.k.dtype)
        self._prefix_copy_fns: Dict[Tuple, "jax.stages.Wrapped"] = {}
        self._count_fns: Dict[int, "jax.stages.Wrapped"] = {}

    def _get_prefix_copy_fn(self, r_pad: int):
        fn = self._prefix_copy_fns.get(r_pad)
        if fn is not None:
            return fn
        quant = self.kv.quantized
        hkv = self.kv.kv_heads

        def copy(src_k, src_v, dst_k, dst_v, src_rows, dst_rows,
                 src_ks=None, src_vs=None, dst_ks=None, dst_vs=None):
            # src_rows/dst_rows int32 [r_pad] flat token rows; pad rows
            # carry dst=OOB_SENTINEL (scatter drops) + src clipped.
            L, nbs, page, f = src_k.shape
            sk = src_k.reshape(L, nbs * page, f)
            sv = src_v.reshape(L, nbs * page, f)
            src = jnp.clip(src_rows, 0, nbs * page - 1)
            dk = dst_k.reshape(L, -1, f).at[:, dst_rows].set(
                sk[:, src], mode="drop")
            dv = dst_v.reshape(L, -1, f).at[:, dst_rows].set(
                sv[:, src], mode="drop")
            out = (dk.reshape(dst_k.shape), dv.reshape(dst_v.shape))
            if quant:
                sks = src_ks.reshape(L, nbs * page, hkv)
                svs = src_vs.reshape(L, nbs * page, hkv)
                dks = dst_ks.reshape(L, -1, hkv).at[:, dst_rows].set(
                    sks[:, src], mode="drop")
                dvs = dst_vs.reshape(L, -1, hkv).at[:, dst_rows].set(
                    svs[:, src], mode="drop")
                out = out + (dks.reshape(dst_ks.shape),
                             dvs.reshape(dst_vs.shape))
            return out

        fn = jax.jit(copy, donate_argnums=(2, 3) + ((8, 9) if quant
                                                    else ()))
        self._prefix_copy_fns[r_pad] = fn
        self._note_compile("prefix_copy", r_pad)
        return fn

    def copy_prefix_blocks(self, src_blocks: List[int],
                           dst_blocks: List[int], to_store: bool) -> None:
        """Copy whole KV blocks between the slot pool and the prefix
        store (to_store=True: save at finish; False: restore on a prefix
        hit at admission). One compiled gather+scatter program over all
        layers; dispatch-ordered with the windows that read/write the
        same rows, so no host sync is needed."""
        page = self.page
        r = len(src_blocks) * page
        r_pad = _round_up_pow2(r, page, 1 << 22)
        src_rows = np.zeros(r_pad, np.int32)
        dst_rows = np.full(r_pad, OOB_SENTINEL, np.int32)
        for i, (sb, db) in enumerate(zip(src_blocks, dst_blocks)):
            src_rows[i * page:(i + 1) * page] = np.arange(
                sb * page, (sb + 1) * page)
            dst_rows[i * page:(i + 1) * page] = np.arange(
                db * page, (db + 1) * page)
        fn = self._get_prefix_copy_fn(r_pad)
        store = self.prefix_store
        src, dst = (self.kv, store) if to_store else (store, self.kv)
        args = (src.k, src.v, dst.k, dst.v,
                jnp.asarray(src_rows), jnp.asarray(dst_rows))
        if self.kv.quantized:
            args = args + (src.k_scale, src.v_scale,
                           dst.k_scale, dst.v_scale)
        out = fn(*args)
        new = PagedKvCache(
            k=out[0], v=out[1], page=page, kv_heads=dst.kv_heads,
            head_dim=dst.head_dim,
            k_scale=out[2] if self.kv.quantized else None,
            v_scale=out[3] if self.kv.quantized else None)
        if to_store:
            self.prefix_store = new
        else:
            self.kv = new

    def add_prompt_counts(self, slot: int, tokens: List[int]) -> None:
        """Seed repetition-penalty counts for prompt tokens that were
        NOT prefilled (prefix-cache reuse): the prefill program counts
        only the tokens it processes, so reused-prefix tokens must be
        counted here for sampled output to match the uncached run."""
        if not hasattr(self, "_count_fns"):
            self._count_fns = {}
        n = len(tokens)
        if n == 0:
            return
        v = self.model_cfg.vocab_size
        n_pad = _round_up_pow2(n, 8, 1 << 20)
        fn = self._count_fns.get(n_pad)
        if fn is None:
            def add(counts, slot, toks):
                return counts.at[slot, toks].add(1, mode="drop")
            fn = jax.jit(add, donate_argnums=(0,))
            self._count_fns[n_pad] = fn
            self._note_compile("counts", n_pad)
        arr = np.full(n_pad, v, np.int32)   # pads: vocab → dropped
        arr[:n] = tokens
        self.counts = fn(self.counts, slot, jnp.asarray(arr))

    # ------------------------------------------------------------------
    # KV block host I/O (prefix offload tier; kv/compression.py)
    # ------------------------------------------------------------------
    def _kv_block_io(self):
        if getattr(self, "_kv_read_fn", None) is None:
            quant = self.kv.quantized

            def read(k, v, b, ks, vs):
                out = (k[:, b], v[:, b])
                if quant:
                    out += (ks[:, b], vs[:, b])
                return out

            def write(k, v, b, bk, bv, ks, vs, bks, bvs):
                out = (k.at[:, b].set(bk), v.at[:, b].set(bv))
                if quant:
                    out += (ks.at[:, b].set(bks), vs.at[:, b].set(bvs))
                return out

            # Block index is TRACED (one compile, any block); pool
            # arrays are donated on write so the update is in place.
            self._kv_read_fn = jax.jit(read, static_argnums=())
            self._kv_write_fn = jax.jit(
                write, donate_argnums=(0, 1) + ((5, 6) if quant else ()))
            self._note_compile("kv_block_io", quant)
        return self._kv_read_fn, self._kv_write_fn

    def read_kv_block(self, block_id: int) -> tuple:
        """Fetch one pool block to host: (k, v[, k_scale, v_scale])
        numpy arrays, k/v [L, page, kv_size]. One blocking readback."""
        read_fn, _ = self._kv_block_io()
        kv = self.kv
        out = read_fn(kv.k, kv.v, block_id,
                      kv.k_scale if kv.quantized else 0,
                      kv.v_scale if kv.quantized else 0)
        return tuple(np.asarray(x) for x in out)

    def write_kv_block(self, block_id: int, arrays: tuple) -> None:
        """Upload one host block group into the pool (restore path)."""
        _, write_fn = self._kv_block_io()
        kv = self.kv
        quant = kv.quantized
        bk = jnp.asarray(arrays[0], kv.k.dtype)
        bv = jnp.asarray(arrays[1], kv.v.dtype)
        out = write_fn(kv.k, kv.v, block_id, bk, bv,
                       kv.k_scale if quant else 0,
                       kv.v_scale if quant else 0,
                       jnp.asarray(arrays[2]) if quant else 0,
                       jnp.asarray(arrays[3]) if quant else 0)
        self.kv = PagedKvCache(
            k=out[0], v=out[1], page=kv.page, kv_heads=kv.kv_heads,
            head_dim=kv.head_dim,
            k_scale=out[2] if quant else None,
            v_scale=out[3] if quant else None)

    # ------------------------------------------------------------------
    # Guided decoding (device FSM)
    # ------------------------------------------------------------------
    def register_guided_fsm(self, fsm, vocab_table) -> int:
        """Stack a TokenFsm's tables into the device-resident guided
        tables; returns the FSM's global row offset. Tables are padded
        to a pow2 row bucket so growing the registry recompiles at most
        log2 times."""
        off = self._fsm_offsets.get(id(fsm))
        if off is not None:
            return off
        off = self._gtrans_np.shape[0]
        trans = fsm.trans + off                 # local ids -> global rows
        self._gtrans_np = np.concatenate([self._gtrans_np, trans])
        self._gmask_np = np.concatenate([self._gmask_np, fsm.mask_words])
        self._fsm_offsets[id(fsm)] = off
        self._gtrans_dev = None                 # re-upload lazily
        if self._gtokcp_dev is None:
            self._gtokcp_dev = jnp.asarray(vocab_table.token_cps)
        return off

    def set_guided_state(self, slot: int, state: int) -> None:
        """Queue a per-slot FSM state init; applied by the next guided
        dispatch's init row (no extra device round trip)."""
        self._pending_ginit[slot] = state

    def _guided_tables(self) -> Tuple["jax.Array", "jax.Array", int]:
        rows = self._gtrans_np.shape[0]
        bucket = max(2, 1 << (rows - 1).bit_length())
        if self._gtrans_dev is None or bucket != self._grows_bucket:
            pad = bucket - rows
            trans = np.concatenate(
                [self._gtrans_np,
                 np.zeros((pad, 258), np.int32)]) if pad else self._gtrans_np
            mask = np.concatenate(
                [self._gmask_np,
                 np.full((pad, self._gmask_np.shape[1]), 0xFFFFFFFF,
                         np.uint32)]) if pad else self._gmask_np
            self._gtrans_dev = jnp.asarray(trans)
            self._gmask_dev = jnp.asarray(mask)
            self._grows_bucket = bucket
        return self._gtrans_dev, self._gmask_dev, bucket

    def _gdummy(self) -> Tuple["jax.Array", "jax.Array", int]:
        return self._gdummy_trans, self._gdummy_mask, 0

    def _ginit_row(self) -> np.ndarray:
        """Per-slot init states for this dispatch (-1 = keep device
        state); drains ALL queued resets (inits for slots not in the
        batch are harmless — their lanes are inactive)."""
        row = np.full(self.num_slots, -1, np.int32)
        for slot, st in self._pending_ginit.items():
            row[slot] = st
        self._pending_ginit.clear()
        return row

    # ------------------------------------------------------------------
    # Bucketing
    # ------------------------------------------------------------------
    def ctx_bucket(self, max_len: int) -> int:
        lo = max(2 * self.page, 16)
        return _round_up_pow2(max_len, lo, self.cfg.max_model_len)

    def lane_bucket(self, n: int) -> int:
        """Smallest decode-lane bucket >= n (cfg.decode_buckets ladder;
        default: pow2 1..max_num_seqs). Decode windows compact active
        sequences into lanes so attention/sampling/state cost scales
        with occupancy while the weight stream stays per-step."""
        for b in self.cfg.decode_buckets:
            if b >= n:
                return b
        return self.cfg.decode_buckets[-1]

    def chunk_bucket(self, t: int) -> int:
        # t_pad must be a page multiple (whole-page prefill writes) and
        # >= 8 (sublane alignment + the packed scalars row holds 5 ints).
        lo = max(8, self.page, min(64, self.cfg.prefill_chunk_size))
        return _round_up_pow2(t, lo, max(self.cfg.prefill_chunk_size, lo))

    # ------------------------------------------------------------------
    # Compiled steps
    # ------------------------------------------------------------------
    def _get_decode_fn(self, ctx_pad: int, return_logits: bool,
                       greedy: bool = False):
        key = (ctx_pad, return_logits, greedy)
        fn = self._decode_fns.get(key)
        if fn is not None:
            return fn
        eos_ids = self.model_cfg.eos_token_ids
        mc = self.model_cfg
        attn_impl = self.attn_impl
        hybrid = self.hybrid

        def step(params, kv, counts, keys, packed, block_tables, samp,
                 flat_slots, rec_conv, rec_delta):
            # packed int32 [6, S]: tokens, positions, context_lens,
            # pos_limit(unused here), active_slots, min_tokens_active
            if hybrid:
                h, kv, rec = decode_forward(
                    params, mc, kv, packed[0], packed[1], block_tables,
                    packed[2], flat_slots, ctx_pad=ctx_pad,
                    attn_impl=attn_impl,
                    rec={"conv": rec_conv, "delta": rec_delta})
                rec_conv, rec_delta = rec["conv"], rec["delta"]
            else:
                h, kv = decode_forward(
                    params, mc, kv, packed[0], packed[1], block_tables,
                    packed[2], flat_slots, ctx_pad=ctx_pad,
                    attn_impl=attn_impl)
            logits = logits_from_hidden(params, mc, h)
            sp = SlotSamplingParams(samp["temps"], samp["top_ks"],
                                    samp["top_ps"], samp["pens"],
                                    packed[5] == 1)
            out_tokens, keys = sample_step(logits, sp, counts, keys, eos_ids,
                                           greedy_only=greedy)
            counts = update_counts(counts, packed[4], out_tokens)
            if return_logits:
                return (out_tokens, kv, counts, keys, rec_conv, rec_delta,
                        logits)
            return out_tokens, kv, counts, keys, rec_conv, rec_delta

        fn = jax.jit(step, donate_argnums=(1, 2, 3, 8, 9))
        self._decode_fns[key] = fn
        self._note_compile("decode1", key)
        return fn

    def _get_decode_window_fn(self, ctx_pad: int, num_steps: int,
                              s_pad: int, greedy: bool = False,
                              guided: bool = False,
                              grows: int = 0, p_rows: int = 0):
        """T decode steps fused into one compiled program via lax.scan,
        over `s_pad` occupancy-compacted LANES.

        Lane compaction: active sequences are packed into lanes
        0..n-1 of an `s_pad`-wide program (pow2 bucket), with per-slot
        state (counts, PRNG keys, FSM states, recurrent pools, sampling
        params, KV context rows) gathered by the lane→slot map at entry
        and scattered back at exit. Attention, sampling, the lm_head
        matmul and all state updates then cost O(occupancy) while the
        trunk weight stream stays per-step — this is what makes c=1
        decode weight-stream-bound instead of paying the full slot
        frame (VERDICT r2 weak #1).

        p_rows > 0 (mixed prefill+decode, linear/win path only): each
        step additionally processes a P-row block of ONE slot's prefill
        chunk through the same trunk call — the chunk rides the weight
        stream the decode steps already pay. The prefilling slot is NOT
        a lane; its state updates happen slot-indexed after the scan,
        and its first sampled token is returned separately (pf_tok) and
        scattered into `last_toks` so the next window chains from it.

        The sampled token of step t feeds step t+1 on device; positions,
        context lengths and KV flat slots advance on device. One host
        sync yields [T, s_pad] tokens. This is the TPU answer to both
        CUDA-Graph decode capture AND launch/dispatch latency (ref:
        cuda_graph.rs '~550 launches → 1').

        Windows CHAIN on device through the slot-indexed `last_toks`
        array: every window scatters its final sampled tokens into it,
        and lanes with packed[6] (use_carry) read their input token
        from it — so window W+1 dispatches before W's results are
        fetched, across ANY change of bucket size or window length.
        """
        key = (ctx_pad, num_steps, s_pad, greedy, guided, grows, p_rows)
        fn = self._decode_multi_fns.get(key)
        if fn is not None:
            return fn
        eos_ids = self.model_cfg.eos_token_ids
        mc = self.model_cfg
        attn_impl = self.attn_impl
        page = self.page
        vocab = self.model_cfg.vocab_size
        hybrid = self.hybrid
        num_slots = self.num_slots
        # KV-out-of-carry window (flat/linear attention): the cache is
        # scan-INVARIANT (read-only closure); per-step K/V accumulates
        # in a small [L, T, s_pad, Hkv, D] carry and lands in the pool
        # with ONE append after the scan. A lax.scan carry containing
        # the multi-GB pool ping-pongs buffers — measured as a full pool
        # copy per step (~16 ms/step at 4.3 GB on v5e).
        use_win = attn_impl == "linear"
        # Identity variant (s_pad == num_slots): the dispatcher assigns
        # lane == slot, so the hoisted ctx windows are SLICES of the
        # pool instead of lane gathers. XLA's row gather runs at ~2.4x
        # the slice cost on v5e (measured tools/bench_lane_sweep.py:
        # +0.4 ms/step/lane vs +0.164 physics), which at full occupancy
        # cost ~7 ms/step in r3's first lane-compaction cut. State
        # scatters keep their mode=drop semantics (pad lanes drop).
        ident = s_pad == self.num_slots

        if p_rows and not use_win:
            raise NotSupportedError(
                "mixed prefill+decode windows require the linear/win "
                f"attention path, not attn_impl={attn_impl!r}")

        def step_fn(params, kv, counts, keys, packed, last_toks,
                    block_tables, samp, gstates, ginit, gtrans, gmask,
                    gtokcp, rec_conv, rec_delta,
                    pf_packed=None, pf_scal=None):
            # pf_packed int32 [4, T, P]: tokens, count_tokens (vocab =
            # pad), positions (OOB = pad), flat_slots (OOB_SENTINEL =
            # pad). pf_scal int32 [8]: slot (real slot id; num_slots =
            # warm no-op sentinel), chunk_start, valid_len, last_t,
            # last_j, is_last, min_tokens_active, (reserved).
            # packed int32 [7, s_pad] LANE space: tokens, positions,
            # context_lens, pos_limit, lane_slots (num_slots = inactive
            # pad lane), min_tokens_active, use_carry.
            lane_slots = packed[4]
            lc = jnp.clip(lane_slots, 0, num_slots - 1)
            lane_active = lane_slots < num_slots
            # Drain queued FSM resets for ALL slots (slot space), then
            # gather per-lane working state.
            if guided:
                gstates = jnp.where(ginit >= 0, ginit, gstates)
            gstates_l = gstates[lc]
            counts_l = counts[lc]                      # [s_pad, V]
            keys_l = keys[lc]
            temps = samp["temps"][lc]
            top_ks = samp["top_ks"][lc]
            top_ps = samp["top_ps"][lc]
            penalties = samp["pens"][lc]
            bt_l = block_tables[lc]                    # [s_pad, max_pages]
            if hybrid:
                rec_conv_l = rec_conv[:, lc]
                rec_delta_l = rec_delta[:, lc]
            else:
                rec_conv_l, rec_delta_l = rec_conv, rec_delta
            tokens0 = jnp.where(packed[6] == 1, last_toks[lc], packed[0])
            pos_limit = packed[3]
            min_tok_active = packed[5] == 1
            cache_len0 = packed[2]
            lane_iota = jnp.arange(s_pad, dtype=jnp.int32)
            lane_ids = jnp.where(lane_active, lane_iota, s_pad)
            if use_win:
                lkv = mc.num_kv_layers
                win_k0 = jnp.zeros(
                    (lkv, num_steps, s_pad, kv.kv_heads, kv.head_dim),
                    kv.k.dtype if not kv.quantized else jnp.bfloat16)
                win_v0 = jnp.zeros_like(win_k0)
                win_pk0 = win_pv0 = 0
                if p_rows:
                    win_pk0 = jnp.zeros(
                        (lkv, num_steps, p_rows, kv.kv_heads,
                         kv.head_dim), win_k0.dtype)
                    win_pv0 = jnp.zeros_like(win_pk0)
                w_iota = jnp.arange(num_steps, dtype=jnp.int32)
                # Hoist the per-layer lane-gathered ctx windows OUT of
                # the scan: one [s_pad, ctx_pad, F] gather per layer per
                # WINDOW (cost scales with occupancy, not slot count).
                f = kv.kv_heads * kv.head_dim
                lane_ix = slice(None) if ident else lc
                k_lins = [kv.k[li].reshape(
                    num_slots, -1, f)[lane_ix, :ctx_pad]
                    for li in range(lkv)]
                v_lins = [kv.v[li].reshape(
                    num_slots, -1, f)[lane_ix, :ctx_pad]
                    for li in range(lkv)]
                ks_lins = vs_lins = None
                if kv.quantized:
                    ks_lins = [kv.k_scale[li].reshape(
                        num_slots, -1, kv.kv_heads)[lane_ix, :ctx_pad]
                        for li in range(lkv)]
                    vs_lins = [kv.v_scale[li].reshape(
                        num_slots, -1, kv.kv_heads)[lane_ix, :ctx_pad]
                        for li in range(lkv)]
                pf_kc = pf_vc = pf_ksc = pf_vsc = None
                if p_rows:
                    # The prefilling slot is not a lane: hoist ITS ctx
                    # rows separately (one row per layer).
                    psl = jnp.clip(pf_scal[0], 0, num_slots - 1)
                    pf_kc = [jnp.take(kv.k[li].reshape(num_slots, -1, f),
                                      psl, axis=0)[:ctx_pad]
                             for li in range(lkv)]
                    pf_vc = [jnp.take(kv.v[li].reshape(num_slots, -1, f),
                                      psl, axis=0)[:ctx_pad]
                             for li in range(lkv)]
                    if kv.quantized:
                        pf_ksc = [jnp.take(kv.k_scale[li].reshape(
                            num_slots, -1, kv.kv_heads), psl,
                            axis=0)[:ctx_pad] for li in range(lkv)]
                        pf_vsc = [jnp.take(kv.v_scale[li].reshape(
                            num_slots, -1, kv.kv_heads), psl,
                            axis=0)[:ctx_pad] for li in range(lkv)]

            def flat_of(positions):
                # Device-side flat-slot lookup (kv_cache_append analog
                # of the host's SequenceBlocks.flat_slot).
                page_idx = positions // page
                block = jnp.take_along_axis(
                    bt_l, page_idx[:, None], axis=1)[:, 0]
                flat = block * page + positions % page
                return jnp.where(
                    (positions < pos_limit) & lane_active,
                    flat, OOB_SENTINEL)

            def body(carry, step):
                (tokens, positions, context_lens, kv_c, counts_l, keys_l,
                 gstates_l, rec_conv_l, rec_delta_l, win_k, win_v,
                 win_pk, win_pv) = carry
                flat = flat_of(positions)
                win = None
                if use_win:
                    win = {"k": win_k, "v": win_v, "step": step,
                           "valid": (w_iota[None, :] < step),
                           "cache_len": cache_len0,
                           "k_lins": k_lins, "v_lins": v_lins,
                           "ks_lins": ks_lins, "vs_lins": vs_lins}
                fwd_tokens, fwd_positions = tokens, positions
                if p_rows:
                    pos_p = pf_packed[2, step]               # [P]
                    win["pk"], win["pv"] = win_pk, win_pv
                    win["pf"] = {"chunk_start": pf_scal[1],
                                 "valid_len": pf_scal[2],
                                 "positions": pos_p,
                                 "k_ctx": pf_kc, "v_ctx": pf_vc,
                                 "ks_ctx": pf_ksc, "vs_ctx": pf_vsc}
                    fwd_tokens = jnp.concatenate(
                        [tokens, pf_packed[0, step]])
                    fwd_positions = jnp.concatenate([positions, pos_p])
                kw = {}
                if hybrid:
                    kw["rec"] = {"conv": rec_conv_l, "delta": rec_delta_l}
                out = decode_forward(
                    params, mc, kv_c, fwd_tokens, fwd_positions,
                    bt_l, context_lens, flat, ctx_pad=ctx_pad,
                    attn_impl=attn_impl, win=win, **kw)
                if use_win and hybrid:
                    h, win, rec = out
                elif use_win:
                    h, win = out
                elif hybrid:
                    h, kv_c, rec = out
                else:
                    h, kv_c = out
                if use_win:
                    win_k, win_v = win["k"], win["v"]
                h_p = None
                if p_rows:
                    win_pk, win_pv = win["pk"], win["pv"]
                    h, h_p = h[:s_pad], h[s_pad:]
                if hybrid:
                    rec_conv_l, rec_delta_l = rec["conv"], rec["delta"]
                logits = logits_from_hidden(params, mc, h)
                sp = SlotSamplingParams(temps, top_ks, top_ps, penalties,
                                        min_tok_active)
                mask = guided_mask_rows(gmask, gstates_l, vocab) \
                    if guided else None
                out_tokens, keys_l = sample_step(
                    logits, sp, counts_l, keys_l, eos_ids,
                    greedy_only=greedy, allowed_mask=mask)
                if guided:
                    gstates_l = guided_advance(gtrans, gtokcp, gstates_l,
                                               out_tokens)
                counts_l = update_counts(counts_l, lane_ids, out_tokens)
                ys = (out_tokens, h_p) if p_rows else out_tokens
                return ((out_tokens, positions + 1, context_lens + 1,
                         kv_c, counts_l, keys_l, gstates_l, rec_conv_l,
                         rec_delta_l, win_k, win_v, win_pk, win_pv),
                        ys)

            if use_win:
                carry = (tokens0, packed[1], packed[2], None, counts_l,
                         keys_l, gstates_l, rec_conv_l, rec_delta_l,
                         win_k0, win_v0, win_pk0, win_pv0)

                def body_win(carry, step):
                    c = list(carry)
                    c[3] = kv          # closure-invariant cache
                    new_c, tok = body(tuple(c), step)
                    new_c = list(new_c)
                    new_c[3] = None    # keep the pool OUT of the carry
                    return tuple(new_c), tok

                (tokens, positions, context_lens, _none, counts_l, keys_l,
                 gstates_l, rec_conv_l, rec_delta_l, win_k, win_v, win_pk,
                 win_pv), ys = jax.lax.scan(body_win, carry, w_iota)
                all_toks = ys[0] if p_rows else ys
                # ONE append for the whole window.
                flat_mat = jax.vmap(
                    lambda t: flat_of(packed[1] + t))(w_iota)  # [T, s_pad]
                if p_rows:
                    # Chunk K/V joins the same single append (its flat
                    # slots ride pf_packed[3]; pads carry OOB_SENTINEL).
                    win_k = jnp.concatenate([win_k, win_pk], axis=2)
                    win_v = jnp.concatenate([win_v, win_pv], axis=2)
                    flat_mat = jnp.concatenate(
                        [flat_mat, pf_packed[3]], axis=1)  # [T, s_pad+P]
                kv2 = append_window_kv(kv, win_k, win_v, flat_mat)
            else:
                carry = (tokens0, packed[1], packed[2], kv, counts_l,
                         keys_l, gstates_l, rec_conv_l, rec_delta_l,
                         0, 0, 0, 0)
                (tokens, positions, context_lens, kv2, counts_l, keys_l,
                 gstates_l, rec_conv_l, rec_delta_l, _a, _b, _c, _d), \
                    all_toks = jax.lax.scan(
                        body, carry,
                        jnp.arange(num_steps, dtype=jnp.int32))

            # Scatter lane state back to slot space (pad lanes drop).
            counts = counts.at[lane_slots].set(counts_l, mode="drop")
            keys = keys.at[lane_slots].set(keys_l, mode="drop")
            if guided:
                gstates = gstates.at[lane_slots].set(gstates_l,
                                                     mode="drop")
            if hybrid:
                rec_conv = rec_conv.at[:, lane_slots].set(
                    rec_conv_l, mode="drop")
                rec_delta = rec_delta.at[:, lane_slots].set(
                    rec_delta_l, mode="drop")
            last_toks = last_toks.at[lane_slots].set(
                all_toks[num_steps - 1], mode="drop")

            pf_tok_out = None
            if p_rows:
                # First-token sample for the chunk's slot (mirrors the
                # standalone prefill program: prompt-token counts, fresh
                # key, is_last-gated commits) — all slot-indexed, AFTER
                # the lane scatters (the pf slot is never a lane). Its
                # token lands in last_toks so the next window chains
                # from it on device.
                sl = pf_scal[0]
                slc = jnp.clip(sl, 0, num_slots - 1)
                is_last = pf_scal[5] == 1
                counts = counts.at[
                    sl, pf_packed[1].reshape(-1)].add(1, mode="drop")
                h_last = ys[1][pf_scal[3], pf_scal[4]]      # [H]
                logits_p = logits_from_hidden(params, mc,
                                              h_last[None])  # [1, V]
                sp1 = SlotSamplingParams(
                    samp["temps"][slc][None], samp["top_ks"][slc][None],
                    samp["top_ps"][slc][None], samp["pens"][slc][None],
                    (pf_scal[6] == 1)[None])
                tok_p, nk = sample_step(
                    logits_p, sp1, counts[slc][None], keys[slc][None],
                    eos_ids, greedy_only=greedy)
                keys = keys.at[sl].set(
                    jnp.where(is_last, nk[0], keys[slc]), mode="drop")
                counts = counts.at[
                    sl, jnp.where(is_last, tok_p[0], vocab)].add(
                    1, mode="drop")
                last_toks = last_toks.at[sl].set(
                    jnp.where(is_last, tok_p[0], last_toks[slc]),
                    mode="drop")
                pf_tok_out = tok_p

            outs = (all_toks, last_toks, kv2, counts, keys, gstates,
                    rec_conv, rec_delta)
            if p_rows:
                return outs + (pf_tok_out,)
            return outs

        fn = jax.jit(step_fn, donate_argnums=(1, 2, 3, 5, 8, 13, 14))
        self._decode_multi_fns[key] = fn
        self._note_compile("window", key)
        return fn

    def start_decode_window(self, seqs: List[Sequence], num_steps: int,
                            prev: Optional[DecodeWindow] = None,
                            pf_chunk: Optional[PrefillChunk] = None
                            ) -> DecodeWindow:
        """Dispatch one fused decode window WITHOUT waiting for results.

        Active sequences are compacted into the lanes of the smallest
        decode bucket that fits (attention/sampling/state cost scales
        with occupancy). For sequences covered by `prev` (the still-
        outstanding previous window), the input token rides the
        slot-indexed device carry (`last_toks`) and positions continue
        from prev.end_pos — the host does not need to have read prev's
        tokens, and the carry is lane-layout independent. Everything
        else (new joiners after prefill, re-admissions) gets
        host-provided rows.

        pf_chunk: one slot's prefill chunk to fold into this window
        (mixed prefill+decode): its tokens split into T blocks of P
        rows riding the decode steps' trunk. When the chunk is the
        prompt's last, the sampled first token is returned in the
        window's pf_tok handle AND scattered into last_toks, so the
        NEXT window chains from it without a host readback."""
        n_lanes = len(seqs)
        s_pad = self.lane_bucket(max(1, n_lanes))
        # Full-frame bucket: lane == slot (the program slices the pool
        # instead of lane-gathering — see _get_decode_window_fn ident).
        ident = s_pad == self.num_slots
        packed = np.zeros((7, s_pad), np.int32)
        packed[4] = self.num_slots               # inactive pad lanes
        max_len = 2
        end_pos: Dict[int, int] = {}
        lanes: Dict[str, int] = {}
        for i, seq in enumerate(seqs):
            lane = seq.slot if ident else i
            sl = seq.slot
            rid = seq.request.request_id
            lanes[rid] = lane
            if prev is not None and rid in prev.covered \
                    and sl in prev.end_pos:
                pos = prev.end_pos[sl]
                packed[6, lane] = 1              # token from device carry
            else:
                pos = seq.next_position()
                packed[0, lane] = seq.all_tokens[-1]
            packed[1, lane] = pos
            packed[2, lane] = pos + 1
            packed[3, lane] = len(seq.blocks.blocks) * self.page
            packed[4, lane] = sl
            # Conservative: suppress EOS through the whole window while
            # under min_tokens (may overshoot by <= T-1, never under).
            packed[5, lane] = int(seq.num_output_tokens
                                  < seq.request.sampling.min_tokens)
            end_pos[sl] = pos + num_steps
            max_len = max(max_len, pos + 1)
        covered = set(seq.request.request_id for seq in seqs)

        pf_packed = pf_scal = None
        p_rows = 0
        if pf_chunk is not None:
            seq_p = pf_chunk.seq
            n = len(pf_chunk.tokens)
            p_rows = _round_up_pow2(
                (n + num_steps - 1) // num_steps, 8, 512)
            total_rows = num_steps * p_rows
            v = self.model_cfg.vocab_size
            pos_oob = self.cfg.max_model_len + (1 << 16)
            toks = np.zeros(total_rows, np.int32)
            cnts = np.full(total_rows, v, np.int32)
            poss = np.full(total_rows, pos_oob, np.int32)
            flats = np.full(total_rows, OOB_SENTINEL, np.int32)
            start = pf_chunk.start
            toks[:n] = pf_chunk.tokens
            cnts[:n] = pf_chunk.tokens
            poss[:n] = np.arange(start, start + n)
            flats[:n] = [seq_p.blocks.flat_slot(p)
                         for p in range(start, start + n)]
            pf_packed = jnp.asarray(np.stack([toks, cnts, poss, flats])
                                    .reshape(4, num_steps, p_rows))
            pf_scal = jnp.asarray(np.array([
                seq_p.slot, start, n, (n - 1) // p_rows,
                (n - 1) % p_rows, int(pf_chunk.is_last),
                int(seq_p.num_output_tokens
                    < seq_p.request.sampling.min_tokens), 0], np.int32))
            self._sync_tables([seq_p])
            max_len = max(max_len, start + n)
            if pf_chunk.is_last:
                covered.add(seq_p.request.request_id)
                end_pos[seq_p.slot] = start + n
        self._sync_tables(seqs)

        ctx_pad = self.ctx_bucket(max_len + num_steps)
        greedy = bool(all(self._temps[seq.slot] == 0 for seq in seqs)
                      and (pf_chunk is None
                           or self._temps[pf_chunk.seq.slot] == 0))
        guided = any(getattr(seq, "guided_fsm_offset", None) is not None
                     for seq in seqs)
        if guided:
            gtrans, gmask, grows = self._guided_tables()
            ginit = jnp.asarray(self._ginit_row())
            gtokcp = self._gtokcp_dev
        else:
            gtrans, gmask, grows = self._gdummy()
            ginit = self._gdummy_init
            gtokcp = self._gdummy_tokcp
        fn = self._get_decode_window_fn(ctx_pad, num_steps, s_pad, greedy,
                                        guided, grows, p_rows)
        t0 = time.perf_counter()
        out = fn(
            self.params, self.kv, self.counts, self.keys,
            jnp.asarray(packed), self._last_toks, self._tables_dev,
            self.samp, self._gstates, ginit, gtrans, gmask, gtokcp,
            self.rec_conv, self.rec_delta, pf_packed, pf_scal)
        (all_toks, self._last_toks, self.kv, self.counts, self.keys,
         self._gstates, self.rec_conv, self.rec_delta) = out[:8]
        pf_tok = out[8] if p_rows else None
        dt = time.perf_counter() - t0
        self.decode_device_time += dt
        _prof.emit("window.dispatch", dt, {
            "steps": num_steps, "lanes": n_lanes, "bucket": s_pad,
            "p_rows": p_rows})
        self.decode_steps += num_steps
        if pf_chunk is not None:
            self.prefill_steps += 1
        return DecodeWindow(
            seqs=list(seqs), covered=frozenset(covered),
            toks=all_toks, end_pos=end_pos, num_steps=num_steps,
            lanes=lanes,
            pf_seq=pf_chunk.seq if pf_chunk is not None else None,
            pf_is_last=bool(pf_chunk.is_last) if pf_chunk is not None
            else False,
            pf_tok=pf_tok)

    def sync_window(self, window: DecodeWindow) -> Dict[str, List[int]]:
        """Fetch a window's sampled tokens (the one blocking sync).
        A completed mixed-prefill chunk's sequence is included: its
        first token is the LAST entry of its row."""
        t0 = time.perf_counter()
        tok_host = np.asarray(window.toks)       # [T, s_pad]
        pf_tok = None
        if window.pf_tok is not None and window.pf_is_last:
            pf_tok = int(np.asarray(window.pf_tok)[0])
        dt = time.perf_counter() - t0
        self.decode_sync_time += dt
        _prof.emit("window.fetch", dt, {
            "steps": window.num_steps, "lanes": len(window.seqs)})
        out = {seq.request.request_id:
               tok_host[:, window.lanes[seq.request.request_id]].tolist()
               for seq in window.seqs}
        if pf_tok is not None and window.pf_seq is not None:
            # Engine reads only the LAST entry for the prefill seq.
            out[window.pf_seq.request.request_id] = \
                [0] * (window.num_steps - 1) + [pf_tok]
        return out

    def run_decode_multi(self, seqs: List[Sequence], num_steps: int
                         ) -> Dict[str, List[int]]:
        """Run `num_steps` fused decode steps; returns per-request token
        lists (callers discard overshoot past EOS/stop/max_tokens).
        Unpipelined convenience wrapper over start/sync."""
        return self.sync_window(self.start_decode_window(seqs, num_steps))

    def _get_prefill_batch_fn(self, b_pad: int, t_pad: int, ctx_pad: int,
                              greedy: bool = False,
                              return_logits: bool = False,
                              guided: bool = False, grows: int = 0,
                              score: bool = False):
        """B sequences' prefill chunks fused into ONE compiled program.

        The trunk runs at m = B*T, so the (4 GB at 8B-int4) weight
        stream is amortized across the whole admitted wave instead of
        per sequence — measured 80 ms/seq serial → ~22 ms/seq at B=8
        on v5e. TTFT under concurrent load is dominated by this.

        score=True (prompt-logprob scoring, the /v1/completions
        echo+logprobs contract lm_eval's local-completions client
        consumes — ref: scripts/lm_eval_light.sh): packed gains a 6th
        row of per-position TARGET ids (the next prompt token) and the
        program additionally returns, per position, the target's
        logprob plus the argmax id and its logprob — computed on device
        so the [T, V] logits never cross the tunnel. Dispatched b=1
        (the [t_pad, V] f32 softmax stats are the transient cost)."""
        key = (b_pad, t_pad, ctx_pad, greedy, return_logits, guided, grows,
               score)
        fn = self._prefill_batch_fns.get(key)
        if fn is not None:
            return fn
        eos_ids = self.model_cfg.eos_token_ids
        mc = self.model_cfg
        attn_impl = self.attn_impl
        vocab = self.model_cfg.vocab_size
        num_slots = self.num_slots

        hybrid = self.hybrid

        def step(params, kv, counts, keys, packed, tables, samp,
                 gstates, ginit, gtrans, gmask, gtokcp,
                 rec_conv, rec_delta):
            # packed int32 [B, 5(+1), t_pad]: per row — tokens,
            # count_tokens, positions, flat_slots, scalars(slot,
            # last_idx, total_len, min_tokens_active, is_last, ...pad)
            # [, score targets (vocab = masked pad)]. Pad rows carry
            # slot == num_slots (scatters drop them).
            scalars = packed[:, 4]                        # [B, t_pad]
            slots = scalars[:, 0]                         # [B]
            last_idx = scalars[:, 1]
            total_lens = scalars[:, 2]
            min_active = scalars[:, 3] == 1
            is_last = scalars[:, 4] == 1
            block_tables = tables[jnp.clip(slots, 0, num_slots - 1)]
            if hybrid:
                # Chunk-0 rows restart their slot's recurrent state
                # in-program (admission/recompute reset — the
                # RecurrentStateManager free/alloc analog).
                rec = {"conv": rec_conv, "delta": rec_delta}
                reset = packed[:, 2, 0] == 0
                h, kv, rec = prefill_forward_batched(
                    params, mc, kv, packed[:, 0], packed[:, 2],
                    block_tables, total_lens, packed[:, 3],
                    ctx_pad=ctx_pad, attn_impl=attn_impl, rec=rec,
                    slots=slots, rec_reset=reset,
                    gdn_block=self.cfg.gdn_chunk_block)
                rec_conv, rec_delta = rec["conv"], rec["delta"]
            else:
                h, kv = prefill_forward_batched(
                    params, mc, kv, packed[:, 0], packed[:, 2],
                    block_tables, total_lens, packed[:, 3],
                    ctx_pad=ctx_pad, attn_impl=attn_impl)  # [B, T, H]
            counts = counts.at[slots[:, None], packed[:, 1]].add(
                1, mode="drop")
            score_out = None
            if score:
                # Per-position scoring: lp(target | prefix), argmax id +
                # its lp. Stats (max, logsumexp) reduce the [B*T, V]
                # logits on device — only [B, T] rows return.
                lg = logits_from_hidden(
                    params, mc, h.reshape(-1, h.shape[-1])
                ).astype(jnp.float32)                      # [B*T, V]
                mx = jnp.max(lg, axis=-1)
                lse = mx + jnp.log(
                    jnp.sum(jnp.exp(lg - mx[:, None]), axis=-1))
                tgt = jnp.clip(packed[:, 5].reshape(-1), 0, vocab - 1)
                t_lp = jnp.take_along_axis(
                    lg, tgt[:, None], axis=1)[:, 0] - lse
                am = jnp.argmax(lg, axis=-1).astype(jnp.int32)
                am_lp = mx - lse
                score_out = (t_lp.reshape(b_pad, t_pad),
                             am.reshape(b_pad, t_pad),
                             am_lp.reshape(b_pad, t_pad))
            hs = jnp.take_along_axis(
                h, last_idx[:, None, None], axis=1)[:, 0]  # [B, H]
            logits = logits_from_hidden(params, mc, hs)    # [B, V]
            sl = jnp.clip(slots, 0, num_slots - 1)
            sp = SlotSamplingParams(
                samp["temps"][sl], samp["top_ks"][sl],
                samp["top_ps"][sl], samp["pens"][sl], min_active)
            if guided:
                gstates = jnp.where(ginit >= 0, ginit, gstates)
                st = gstates[sl]                           # [B]
                mask = guided_mask_rows(gmask, st, vocab)
            else:
                mask = None
            toks, new_keys = sample_step(
                logits, sp, counts[sl], keys[sl], eos_ids,
                greedy_only=greedy, allowed_mask=mask)
            if guided:
                # Advance the FSM only on final chunks (non-final rows'
                # samples are discarded by the host).
                st2 = guided_advance(gtrans, gtokcp, st, toks)
                gstates = gstates.at[slots].set(
                    jnp.where(is_last, st2, st), mode="drop")
            # Commit sampled-token count + PRNG advance only for final
            # chunks (pad/non-final rows drop via OOB index / slot).
            keys = keys.at[slots].set(
                jnp.where(is_last[:, None], new_keys, keys[sl]),
                mode="drop")
            counts = counts.at[
                slots, jnp.where(is_last, toks, vocab)].add(1, mode="drop")
            out = (toks, kv, counts, keys, gstates, rec_conv, rec_delta)
            if return_logits:
                out = out + (logits,)
            if score:
                out = out + score_out
            return out

        fn = jax.jit(step, donate_argnums=(1, 2, 7, 12, 13))
        self._prefill_batch_fns[key] = fn
        self._note_compile("prefill", key)
        return fn

    def run_prefill_batch(self, chunks: List[PrefillChunk],
                          return_logits: bool = False,
                          score: bool = False
                          ) -> "BatchPrefillResult":
        """Dispatch B prefill chunks as one program (no sync).

        Chunks must belong to distinct sequences (one chunk per sequence
        per engine iteration — scheduler invariant). Returns a
        BatchPrefillResult whose .tokens is a [B_pad] DEVICE array; the
        engine fetches it once per iteration for all final chunks.

        score=True additionally returns per-position prompt logprobs
        (see _get_prefill_batch_fn); targets are each position's NEXT
        token in the chunk's prefill target."""
        b = len(chunks)
        t = max(len(c.tokens) for c in chunks)
        t_pad = self.chunk_bucket(t)
        ctx_pad = max(self.ctx_bucket(c.start + len(c.tokens))
                      for c in chunks)
        b_pad = _round_up_pow2(b, 1, max(self.cfg.num_slots, 1))
        v = self.model_cfg.vocab_size

        packed = np.zeros((b_pad, 6 if score else 5, t_pad), np.int32)
        packed[:, 1] = v                                  # count pads drop
        packed[:, 2] = self.cfg.max_model_len + ctx_pad   # pos pads: OOB
        packed[:, 3] = OOB_SENTINEL                       # write pads drop
        packed[:, 4, 0] = self.num_slots                  # pad rows: slot OOB
        if score:
            packed[:, 5] = v                              # masked targets
        rows: Dict[str, int] = {}
        for i, c in enumerate(chunks):
            seq = c.seq
            n = len(c.tokens)
            total = c.start + n
            packed[i, 0, :n] = c.tokens
            packed[i, 1, :n] = c.tokens
            packed[i, 2, :n] = np.arange(c.start, total)
            packed[i, 3, :n] = [seq.blocks.flat_slot(p)
                                for p in range(c.start, total)]
            packed[i, 4, :5] = [
                seq.slot, n - 1, total,
                int(seq.num_output_tokens
                    < seq.request.sampling.min_tokens),
                int(c.is_last)]
            if score:
                target = seq.prefill_target
                nxt = target[c.start + 1:total + 1]       # pos p -> t[p+1]
                packed[i, 5, :len(nxt)] = nxt
            rows[seq.request.request_id] = i
        self._sync_tables([c.seq for c in chunks])

        greedy = bool(all(self._temps[c.seq.slot] == 0 for c in chunks))
        guided = any(getattr(c.seq, "guided_fsm_offset", None) is not None
                     for c in chunks)
        if guided:
            gtrans, gmask, grows = self._guided_tables()
            ginit = jnp.asarray(self._ginit_row())
            gtokcp = self._gtokcp_dev
        else:
            gtrans, gmask, grows = self._gdummy()
            ginit = self._gdummy_init
            gtokcp = self._gdummy_tokcp
        fn = self._get_prefill_batch_fn(b_pad, t_pad, ctx_pad, greedy,
                                        return_logits, guided, grows,
                                        score)
        t0 = time.perf_counter()
        out = fn(self.params, self.kv, self.counts, self.keys,
                 jnp.asarray(packed), self._tables_dev, self.samp,
                 self._gstates, ginit, gtrans, gmask, gtokcp,
                 self.rec_conv, self.rec_delta)
        (toks, self.kv, self.counts, self.keys, self._gstates,
         self.rec_conv, self.rec_delta) = out[:7]
        logits = out[7] if return_logits else None
        s_lp = s_am = s_am_lp = None
        if score:
            s_lp, s_am, s_am_lp = out[7 + int(return_logits):]
        self.prefill_device_time += time.perf_counter() - t0
        self.prefill_steps += len(chunks)
        return BatchPrefillResult(tokens=toks, logits=logits, rows=rows,
                                  score_lp=s_lp, score_argmax=s_am,
                                  score_argmax_lp=s_am_lp)

    def warm_prefill_siblings(self) -> int:
        """Compile every pow2 b_pad sibling of the already-compiled
        batched-prefill buckets via a NO-OP execution (all rows padded:
        slot == num_slots, OOB positions/flat-slots → every state write
        drops). Serving then never compiles a prefill program mid-
        request regardless of how admission waves fragment (a mid-bench
        remote compile costs 40-400 s and lands in some request's TTFT).
        Returns the number of programs compiled."""
        v = self.model_cfg.vocab_size
        done = 0
        budget = self.cfg.max_num_batched_tokens
        for (b_pad, t_pad, ctx_pad, greedy, rl, gd, grows, score) in list(
                self._prefill_batch_fns.keys()):
            if score:
                continue                 # score programs stay b=1
            # A (b, t_pad) group's chunks each carry > t_pad/2 tokens
            # (pow2 bucketing), and the scheduler admits within the
            # token budget — so b beyond budget/(t_pad/2+1) can never
            # be dispatched. Warming it anyway costs compile time and,
            # at b=32 x t=512 (m=16k rows), more transient HBM than a
            # 16 GB chip has next to an 8B model + KV pool (observed
            # RESOURCE_EXHAUSTED with fused projections).
            max_b = _round_up_pow2(
                max(1, budget // max(1, t_pad // 2 + 1)), 1,
                max(self.cfg.num_slots, 1))
            b = 1
            while b <= max_b:
                key = (b, t_pad, ctx_pad, greedy, rl, gd, grows, False)
                if key not in self._prefill_batch_fns:
                    packed = np.zeros((b, 5, t_pad), np.int32)
                    packed[:, 1] = v
                    packed[:, 2] = self.cfg.max_model_len + ctx_pad
                    packed[:, 3] = OOB_SENTINEL
                    packed[:, 4, 0] = self.num_slots
                    if gd:
                        gtrans, gmask, _ = self._guided_tables()
                        gtokcp = self._gtokcp_dev
                    else:
                        gtrans, gmask, _ = self._gdummy()
                        gtokcp = self._gdummy_tokcp
                    fn = self._get_prefill_batch_fn(b, t_pad, ctx_pad,
                                                    greedy, rl, gd, grows)
                    # Pad rows' first position is 0 → the hybrid reset
                    # branch would zero slot states; use an OOB first
                    # position so warm runs are true no-ops.
                    packed[:, 2, 0] = self.cfg.max_model_len + ctx_pad
                    out = fn(self.params, self.kv, self.counts, self.keys,
                             jnp.asarray(packed), self._tables_dev,
                             self.samp, self._gstates, self._gdummy_init,
                             gtrans, gmask, gtokcp,
                             self.rec_conv, self.rec_delta)
                    (toks, self.kv, self.counts, self.keys,
                     self._gstates, self.rec_conv, self.rec_delta) = out[:7]
                    np.asarray(toks)  # block until compiled + run
                    done += 1
                b *= 2
        # Bucket/length expansion FIRST so the mixed pass sees every
        # (bucket, T) variant the engine can dispatch.
        return (done + self.warm_decode_buckets()
                + self.warm_mixed_windows())

    def _warm_window(self, ctx_pad: int, num_steps: int, s_pad: int,
                     greedy: bool, guided: bool, grows: int,
                     p_rows: int) -> None:
        """Compile + run one decode-window variant as a NO-OP (all lanes
        inactive sentinels; pf slot == num_slots sentinel → every state
        write drops)."""
        fn = self._get_decode_window_fn(
            ctx_pad, num_steps, s_pad, greedy, guided, grows, p_rows)
        packed = np.zeros((7, s_pad), np.int32)
        packed[4] = self.num_slots
        pf_packed = pf_scal = None
        if p_rows:
            pfp = np.zeros((4, num_steps, p_rows), np.int32)
            pfp[1] = self.model_cfg.vocab_size
            pfp[2] = self.cfg.max_model_len + (1 << 16)
            pfp[3] = OOB_SENTINEL
            pfs = np.zeros(8, np.int32)
            pfs[0] = self.num_slots              # sentinel slot: no-op
            pf_packed, pf_scal = jnp.asarray(pfp), jnp.asarray(pfs)
        if guided:
            gtrans, gmask, _ = self._guided_tables()
            gtokcp = self._gtokcp_dev
        else:
            gtrans, gmask, _ = self._gdummy()
            gtokcp = self._gdummy_tokcp
        ginit = self._gdummy_init                # no pending-init drain
        out = fn(
            self.params, self.kv, self.counts, self.keys,
            jnp.asarray(packed), self._last_toks, self._tables_dev,
            self.samp, self._gstates, ginit, gtrans, gmask, gtokcp,
            self.rec_conv, self.rec_delta, pf_packed, pf_scal)
        (toks, self._last_toks, self.kv, self.counts, self.keys,
         self._gstates, self.rec_conv, self.rec_delta) = out[:8]
        np.asarray(toks)                         # block until compiled + run

    def warm_mixed_windows(self) -> int:
        """Compile mixed prefill+decode variants of every already-
        compiled decode-window bucket via NO-OP executions. Serving then
        folds chunks into windows from the first post-warmup admission
        without a mid-request compile."""
        if self.attn_impl != "linear" or self.hybrid \
                or not self.cfg.mixed_prefill:
            return 0
        done = 0
        chunk_cap = max(16, min(self.cfg.prefill_chunk_size,
                                self.cfg.max_num_batched_tokens))
        for (ctx_pad, num_steps, s_pad, greedy, guided, grows, p0) in \
                list(self._decode_multi_fns.keys()):
            if p0:
                continue
            p_want = {_round_up_pow2(
                (n + num_steps - 1) // num_steps, 8, 512)
                for n in (256, chunk_cap) if n <= 128 * num_steps}
            for p_rows in sorted(p_want):
                key = (ctx_pad, num_steps, s_pad, greedy, guided, grows,
                       p_rows)
                if key in self._decode_multi_fns:
                    continue
                self._warm_window(ctx_pad, num_steps, s_pad, greedy,
                                  guided, grows, p_rows)
                done += 1
        return done

    def adaptive_window_steps(self, t_steps: int, n_active: int) -> int:
        """Low-occupancy window doubling: each dispatched window pays a
        fixed host/transport cost (~16-19 ms on the tunneled chip), so
        at <= 4 active lanes run windows twice as long (cap 16)."""
        if n_active <= 4:
            return min(2 * t_steps, 16)
        return t_steps

    def warm_decode_buckets(self) -> int:
        """For every compiled decode-window variant, no-op compile all
        SMALLER lane buckets (and their mixed variants) so occupancy
        shrinking at a cell's tail never compiles mid-measurement.
        Low buckets also warm their adaptive doubled-window variant
        (the engine only doubles when no prefill chunk rides, so the
        plain p_rows=0 program is the one that must exist)."""
        done = 0
        base_t = max(1, self.cfg.decode_multi_step)
        t_spec = getattr(self.cfg, "decode_t_spec", "")
        adaptive = getattr(self.cfg, "adaptive_windows", True) \
            and not t_spec
        for (ctx_pad, num_steps, s_pad, greedy, guided, grows, p_rows) \
                in list(self._decode_multi_fns.keys()):
            for b in self.cfg.decode_buckets:
                if b > s_pad:
                    break
                # Per-bucket T spec: each smaller bucket warms at ITS
                # window length (the only one the engine dispatches for
                # it) — still exactly one variant per bucket.
                t_b = self.cfg.t_for_bucket(b) if t_spec else num_steps
                # A different T needs its own p_rows geometry — warm the
                # plain variant here; warm_mixed_windows (which runs
                # after) derives the correct p_rows for the new key.
                want = [(t_b, p_rows if t_b == num_steps else 0)] \
                    if b < s_pad else []
                if adaptive:
                    # Adaptive doubling (low occupancy, idle queue).
                    t2 = self.adaptive_window_steps(num_steps, b)
                    if t2 != num_steps:
                        want.append((t2, 0))
                    # Pileup halving (engine shortens windows while
                    # admissions queue; see engine step (c)).
                    th = max(4, base_t // 2)
                    if th != num_steps:
                        want.append((th, p_rows))
                for t_w, p_w in want:
                    key = (ctx_pad, t_w, b, greedy, guided, grows, p_w)
                    if key in self._decode_multi_fns:
                        continue
                    self._warm_window(ctx_pad, t_w, b, greedy, guided,
                                      grows, p_w)
                    done += 1
        return done

    # ------------------------------------------------------------------
    # Host-side batch assembly + execution
    # ------------------------------------------------------------------
    def _sync_tables(self, seqs: Sequence) -> None:
        """Upload block tables only when they changed (they are the
        static identity mapping in linear mode)."""
        changed = False
        for seq in seqs:
            ids = seq.blocks.blocks
            row = self._tables_np[seq.slot]
            if not np.array_equal(row[:len(ids)], ids):
                row[:len(ids)] = ids
                changed = True
        if changed:
            self._tables_dev = jnp.asarray(self._tables_np)

    def run_decode(self, seqs: List[Sequence],
                   return_logits: bool = False):
        """One batched decode step. Each seq's input token is its most
        recent token; returns {seq: sampled_token} (+ logits array)."""
        s = self.num_slots
        packed = np.zeros((6, s), np.int32)
        packed[4] = s
        flat = np.full(s, OOB_SENTINEL, np.int32)
        max_len = 2
        for seq in seqs:
            sl = seq.slot
            pos = seq.next_position()
            packed[0, sl] = seq.all_tokens[-1]
            packed[1, sl] = pos
            packed[2, sl] = pos + 1
            packed[4, sl] = sl
            packed[5, sl] = int(seq.num_output_tokens
                                < seq.request.sampling.min_tokens)
            flat[sl] = seq.blocks.flat_slot(pos)
            max_len = max(max_len, pos + 1)
        self._sync_tables(seqs)

        ctx_pad = self.ctx_bucket(max_len)
        greedy = bool((self._temps == 0).all()) and not return_logits
        fn = self._get_decode_fn(ctx_pad, return_logits, greedy)
        t0 = time.perf_counter()
        out = fn(self.params, self.kv, self.counts, self.keys,
                 jnp.asarray(packed), self._tables_dev, self.samp,
                 jnp.asarray(flat), self.rec_conv, self.rec_delta)
        (out_tokens, self.kv, self.counts, self.keys,
         self.rec_conv, self.rec_delta) = out[:6]
        logits = out[6] if return_logits else None
        tok_host = np.asarray(out_tokens)
        self.decode_device_time += time.perf_counter() - t0
        self.decode_steps += 1
        result = {seq.request.request_id: int(tok_host[seq.slot])
                  for seq in seqs}
        if return_logits:
            return result, np.asarray(logits)
        return result

    def run_prefill(self, chunk: PrefillChunk, return_logits: bool = False):
        """One-chunk convenience wrapper over run_prefill_batch (tools /
        tests). Returns the first-token device scalar for final chunks
        (+ the logits row with return_logits), None otherwise."""
        res = self.run_prefill_batch(
            [chunk], return_logits=return_logits and chunk.is_last)
        if not chunk.is_last:
            return None
        if res.logits is not None:
            return res.tokens[0], res.logits[0]
        return res.tokens[0]
