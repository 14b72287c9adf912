"""Continuous-batching scheduler: token budgets, chunked prefill, preemption.

TPU-native analog of the reference's `ContinuousBatchScheduler`
(crates/ferrum-scheduler/src/implementations/continuous.rs:178): one
`next_batch()` call per engine iteration produces a mixed batch of
decode slots + chunked-prefill slices under `max_num_batched_tokens`,
with KV-pressure preemption (recompute policy) and capacity-deferred
re-admission. FIFO and priority policies are admission-order variants
(implementations/{fifo,priority}.rs).

Host-only code — it runs once per iteration; the device step has static
shapes regardless of what this schedules (slots not scheduled this
iteration are masked inside the compiled step).
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from typing import Callable, Deque, Dict, List, Optional, Tuple
from collections import deque

from ..config import EngineConfig
from ..kv.block_pool import BlockPool, SequenceBlocks, SlotBlocks
from ..kv.prefix_cache import PrefixCache
from ..types import CapacityError
from .sequence import Phase, Sequence


@dataclass
class PrefillChunk:
    seq: Sequence
    start: int            # first prompt position in this chunk
    tokens: List[int]     # token ids for this chunk
    # True when this chunk completes the prompt → sample the first output
    # token from its last hidden state.
    is_last: bool = False


@dataclass
class ScheduledBatch:
    prefill_chunks: List[PrefillChunk] = field(default_factory=list)
    decode_seqs: List[Sequence] = field(default_factory=list)
    preempted: List[Sequence] = field(default_factory=list)
    admitted: List[Sequence] = field(default_factory=list)
    # Decodes skipped because KV pressure could not be resolved while
    # every preemption victim was pinned by an in-flight window (the
    # engine breaks the pipeline chain to let preemption proceed).
    deferred_decodes: List[Sequence] = field(default_factory=list)
    # When KV capacity cannot cover the full multi-step lookahead for
    # some sequence, the whole batch's decode window is clamped to this
    # many steps (minimum-progress mode). None = full window.
    decode_steps: Optional[int] = None

    @property
    def is_empty(self) -> bool:
        return not self.prefill_chunks and not self.decode_seqs


@dataclass
class SchedulerStats:
    iterations: int = 0
    submitted: int = 0
    finished: int = 0
    preemptions: int = 0
    tokens_prefilled_scheduled: int = 0
    tokens_decoded_scheduled: int = 0


class ContinuousBatchScheduler:
    """policy: 'continuous' (arrival order), 'fifo' (no chunking — full
    prefill before decode admission), 'priority' (request.priority then
    arrival)."""

    def __init__(self, cfg: EngineConfig, pool: BlockPool,
                 prefix_cache: Optional[PrefixCache] = None,
                 policy: str = "continuous"):
        self.cfg = cfg
        self.pool = pool
        self.prefix_cache = prefix_cache
        self.policy = policy
        # KV headroom reserved per decode schedule: the engine decodes up
        # to this many tokens per iteration on device (multi-step scan);
        # with dispatch-ahead depth D, D windows may be outstanding
        # beyond the host-visible position PLUS the one being scheduled,
        # so reserve (D + 1) windows.
        steps = max(1, cfg.decode_multi_step)
        if getattr(cfg, "spec_draft_model", None):
            # A speculative round advances up to K+1 tokens per slot.
            steps = max(steps, cfg.spec_num_tokens + 1)
        depth = getattr(cfg, "pipeline_depth", 1) \
            if getattr(cfg, "pipeline_decode", False) else 0
        self.decode_lookahead = steps * (1 + depth)
        self.waiting: Deque[Sequence] = deque()
        self.running: List[Sequence] = []     # admission order
        # num_slots >= max_num_seqs: slack lanes absorb deferred slot
        # releases (engine._retire_seq) so a replacement request admits
        # immediately after its predecessor finishes.
        self._free_slots: List[int] = list(range(cfg.num_slots - 1, -1, -1))
        self.stats = SchedulerStats()
        self._trace_fh = None
        if cfg.scheduler_trace_path:
            self._trace_fh = open(cfg.scheduler_trace_path, "a")

    # ------------------------------------------------------------------
    def submit(self, seq: Sequence) -> None:
        if seq.num_prompt_tokens + seq.request.sampling.max_tokens \
                > self.cfg.max_model_len:
            raise CapacityError(
                f"prompt ({seq.num_prompt_tokens}) + max_tokens "
                f"({seq.request.sampling.max_tokens}) exceeds max_model_len "
                f"{self.cfg.max_model_len}")
        seq.phase = Phase.WAITING
        if self.policy == "priority":
            # Stable insert by priority (higher first), then arrival.
            idx = len(self.waiting)
            for i, s in enumerate(self.waiting):
                if seq.request.priority > s.request.priority:
                    idx = i
                    break
            self.waiting.insert(idx, seq)
        else:
            self.waiting.append(seq)
        self.stats.submitted += 1

    def finish(self, seq: Sequence) -> None:
        """Release a finished sequence's slot + KV blocks."""
        if seq in self.running:
            self.running.remove(seq)
        if seq.slot is not None:
            self._free_slots.append(seq.slot)
            seq.slot = None
        if seq.blocks is not None:
            if self.prefix_cache is not None and seq.num_prompt_tokens \
                    >= self.pool.page_size \
                    and seq.prefilled >= seq.num_prompt_tokens:
                # prefilled guard: an aborted/waiting sequence's later
                # blocks were never written — caching them would serve
                # garbage KV to future prefix hits.
                self.prefix_cache.insert(seq.prompt_tokens, seq.blocks.blocks)
            seq.blocks.release()
            seq.blocks = None
        seq.phase = Phase.FINISHED
        self.stats.finished += 1

    # ------------------------------------------------------------------
    def _try_alloc(self, seq: Sequence, tokens: int) -> bool:
        """Ensure KV capacity for `tokens` total tokens, evicting prefix-
        cache blocks under pressure. False if still impossible."""
        if getattr(seq.blocks, "is_linear", False):
            # Linear layout: the slot's region is pre-reserved; only the
            # per-slot length bound can fail (never pool pressure).
            try:
                seq.blocks.ensure_capacity(min(tokens,
                                               self.cfg.max_model_len))
                return True
            except CapacityError:
                return False
        # Clamp the multi-step/pipeline lookahead at the model-length
        # ceiling (the linear branch above does the same): a request
        # finishing exactly at max_model_len must not reserve blocks
        # past the per-seq table width (observed: window lookahead
        # growing a 256-token seq to 34 blocks of a 32-wide table).
        tokens = min(tokens, self.cfg.max_model_len)
        need = seq.blocks.blocks_needed_for(tokens)
        if need == 0:
            return True
        if need > self.pool.num_free and self.prefix_cache is not None:
            self.prefix_cache.evict(min_free_target=need)
        if need > self.pool.num_free:
            return False
        seq.blocks.ensure_capacity(tokens)
        return True

    def _preempt_victim(self, batch: ScheduledBatch,
                        exclude: Sequence,
                        pinned: frozenset = frozenset()
                        ) -> Optional[Sequence]:
        """Drop the most-recently-admitted running seq (LIFO victim,
        ref: preempt_victim batch.rs:998) and recompute it later.
        Sequences riding an in-flight decode window (pinned) cannot be
        preempted — the window still writes their KV blocks."""
        for victim in reversed(self.running):
            if victim is exclude:
                continue
            if victim.request.request_id in pinned:
                continue
            self.running.remove(victim)
            if victim.slot is not None:
                self._free_slots.append(victim.slot)
            victim.blocks.release()
            victim.blocks = None
            victim.reset_for_recompute()
            self.waiting.appendleft(victim)
            batch.preempted.append(victim)
            self.stats.preemptions += 1
            from ..utils import profile as _prof
            _prof.emit_instant("engine.preempt", {
                "request_id": victim.request.request_id,
                "recompute_tokens": len(victim.prompt_tokens)
                + victim.num_output_tokens})
            return victim
        return None

    # ------------------------------------------------------------------
    def next_batch(self, pinned: frozenset = frozenset(),
                   inflight_steps: int = -1) -> ScheduledBatch:
        cfg = self.cfg
        batch = ScheduledBatch()
        budget = cfg.max_num_batched_tokens
        self.stats.iterations += 1

        # --- 1. decode set: every running seq that finished its prefill ---
        decode_candidates = [s for s in self.running if s.phase == Phase.DECODING]
        for seq in list(decode_candidates):
            if seq.phase != Phase.DECODING or seq.blocks is None:
                continue  # preempted as a victim earlier this iteration
            # Each decode consumes 1 budget token + maybe a new block.
            if budget <= 0:
                break
            scheduled = False
            while not self._try_alloc(seq,
                                      seq.total_tokens + self.decode_lookahead):
                if self._preempt_victim(batch, exclude=seq,
                                        pinned=pinned) is None:
                    # No victim available. Before deferring outright, try
                    # a minimum-progress allocation (1 decode step past
                    # what any in-flight window will write): a request
                    # whose prompt+outputs brush the pool's total
                    # capacity must still make progress, else it would
                    # livelock ("defer_decode_to_waiting_for_capacity"
                    # forever).
                    # Exact write horizon for a pinned seq: the steps of
                    # the windows actually outstanding (engine passes
                    # it); worst-case depth*T only as a fallback.
                    if seq.request.request_id not in pinned:
                        inflight = 0
                    elif inflight_steps >= 0:
                        inflight = inflight_steps
                    else:
                        inflight = (cfg.decode_multi_step
                                    * max(1, getattr(cfg, "pipeline_depth",
                                                     1)))
                    if self._try_alloc(seq, seq.total_tokens + inflight + 1):
                        batch.decode_steps = 1
                        scheduled = True
                    else:
                        batch.deferred_decodes.append(seq)
                    break
            else:
                scheduled = True
            if scheduled:
                batch.decode_seqs.append(seq)
                budget -= 1
        self.stats.tokens_decoded_scheduled += len(batch.decode_seqs)

        # --- 2. ongoing prefills (chunked) ---
        chunk_cap = cfg.prefill_chunk_size if cfg.enable_chunked_prefill \
            else cfg.max_num_batched_tokens
        page = cfg.kv_block_size
        for seq in [s for s in self.running if s.phase == Phase.PREFILLING]:
            if budget <= 0:
                break
            t = min(seq.prefill_remaining, chunk_cap, budget)
            if t < seq.prefill_remaining and t < chunk_cap:
                # Only full-cap chunks or the whole remainder: odd chunk
                # sizes would trigger fresh XLA compilations mid-serve
                # (each padded-size bucket is its own program). Defer to
                # the next iteration instead, when budget frees up.
                continue
            if t <= 0:
                continue
            if not self._try_alloc(seq, seq.prefilled + t):
                continue  # retry next iteration
            target = seq.prefill_target
            chunk = PrefillChunk(
                seq=seq, start=seq.prefilled,
                tokens=target[seq.prefilled:seq.prefilled + t],
                is_last=(seq.prefilled + t == len(target)))
            batch.prefill_chunks.append(chunk)
            budget -= t
            self.stats.tokens_prefilled_scheduled += t

        # --- 3. admit waiting requests while slots + budget remain ---
        linear = cfg.kv_layout == "linear"
        while self.waiting and self._free_slots and budget > 0:
            seq = self.waiting[0]
            first_chunk = min(seq.prefill_remaining, chunk_cap, budget)
            if first_chunk < seq.prefill_remaining and first_chunk < chunk_cap:
                break  # defer admission: no odd-sized chunks (see above)
            if self.policy == "fifo" and first_chunk < seq.prefill_remaining \
                    and seq.prefill_remaining <= cfg.max_num_batched_tokens:
                # fifo: avoid chunking when the whole prompt fits a batch.
                if first_chunk < seq.prefill_remaining:
                    break
            if first_chunk <= 0:
                break
            if linear:
                blocks = SlotBlocks(self.pool, self._free_slots[-1],
                                    cfg.max_blocks_per_seq)
            else:
                blocks = SequenceBlocks(self.pool)
            seq.blocks = blocks
            reused_blocks: List[int] = []
            reused = 0
            if self.prefix_cache is not None and seq.prefilled == 0 \
                    and not seq.score_mode:
                # Score requests need EVERY position prefilled (reused
                # blocks would leave their positions unscored).
                reused_blocks, reused = self.prefix_cache.match_prefix(
                    seq.prompt_tokens)
            if reused:
                if linear:
                    # Copy-based reuse: reserve the slot-region blocks;
                    # the engine dispatches the store→slot device copy
                    # at admission (kv/linear_prefix.py).
                    blocks.adopt_copied_prefix(reused)
                    seq.pending_prefix_copy = (reused_blocks, reused)
                else:
                    blocks.append_shared_prefix(reused_blocks, reused)
                seq.prefilled = reused
                seq.prefix_reused_tokens = reused
                first_chunk = min(seq.prefill_remaining, chunk_cap, budget)
                if first_chunk < seq.prefill_remaining \
                        and first_chunk < chunk_cap:
                    # Defer (no odd-sized chunks); seq stays at the head
                    # of the waiting queue with its prefix released.
                    blocks.release()
                    seq.blocks = None
                    seq.prefilled = 0
                    seq.prefix_reused_tokens = 0
                    seq.pending_prefix_copy = None
                    break
            if not self._try_alloc(seq, seq.prefilled + first_chunk):
                # No KV room for even the first chunk → stop admitting.
                blocks.release()
                seq.blocks = None
                seq.prefilled = 0
                break
            self.waiting.popleft()
            seq.slot = self._free_slots.pop()
            seq.phase = Phase.PREFILLING
            self.running.append(seq)
            batch.admitted.append(seq)
            target = seq.prefill_target
            chunk = PrefillChunk(
                seq=seq, start=seq.prefilled,
                tokens=target[seq.prefilled:seq.prefilled + first_chunk],
                is_last=(seq.prefilled + first_chunk == len(target)))
            batch.prefill_chunks.append(chunk)
            budget -= first_chunk
            self.stats.tokens_prefilled_scheduled += first_chunk

        self._trace(batch, budget)
        return batch

    def note_prefill_done(self, chunk: PrefillChunk) -> None:
        """Engine callback after a chunk's device step ran."""
        seq = chunk.seq
        seq.prefilled += len(chunk.tokens)
        if seq.is_prefill_done:
            seq.phase = Phase.DECODING
            seq.recompute = False

    # ------------------------------------------------------------------
    def _trace(self, batch: ScheduledBatch, budget_left: int) -> None:
        if self._trace_fh is None:
            return
        rec = {
            "t": time.time(),
            "iteration": self.stats.iterations,
            "decode": len(batch.decode_seqs),
            "prefill_chunks": [[c.seq.request.request_id, c.start,
                                len(c.tokens)] for c in batch.prefill_chunks],
            "admitted": [s.request.request_id for s in batch.admitted],
            "preempted": [s.request.request_id for s in batch.preempted],
            "waiting": len(self.waiting),
            "running": len(self.running),
            "free_blocks": self.pool.num_free,
            "budget_left": budget_left,
        }
        self._trace_fh.write(json.dumps(rec) + "\n")
        self._trace_fh.flush()
