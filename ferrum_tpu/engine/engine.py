"""ContinuousBatchEngine — the serving core.

TPU-native analog of the reference's engine crate
(crates/ferrum-engine/src/continuous_engine.rs:3324 ContinuousBatchEngine,
continuous_engine/inner.rs:365 run_iteration): a single background
iteration loop drives scheduler → prefill chunks → batched decode →
completion/stream emission. Requests are submitted from any thread and
consume results via per-request queues (the reference's per-request mpsc
channels).

Differences from the reference, by TPU design:
  - the whole decode batch is one compiled XLA call (no per-op launches);
  - sampling happens on device; the host loop only sees token ids;
  - the loop is a plain Python thread (host work per iteration is a few
    hundred microseconds of bookkeeping; the device step dominates).
"""

from __future__ import annotations

import collections
import queue
import threading
import time
import traceback
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from ..config import EngineConfig
from ..kv.block_pool import BlockPool
from ..kv.prefix_cache import PrefixCache
from ..scheduler.continuous import ContinuousBatchScheduler, PrefillChunk
from ..scheduler.sequence import Phase, Sequence
from ..tokenizer import FerrumTokenizer
from ..types import (
    EngineMetricsSnapshot, EngineStoppedError, FinishReason,
    InferenceRequest, InferenceResponse, InvalidRequestError, StreamChunk,
)
from .runner import DecodeWindow, ModelRunner


class _RequestState:
    def __init__(self, seq: Sequence):
        self.seq = seq
        self.out_queue: "queue.Queue[StreamChunk]" = queue.Queue()
        self.submit_time = time.monotonic()
        self.aborted = False


class ContinuousBatchEngine:
    def __init__(self, cfg: EngineConfig, runner: ModelRunner,
                 tokenizer: FerrumTokenizer,
                 pool: Optional[BlockPool] = None,
                 prefix_cache: Optional[PrefixCache] = None,
                 spec=None):
        self.cfg = cfg
        self.runner = runner
        self.tokenizer = tokenizer
        # Speculative decoding (SpecDecoder) — replaces plain decode
        # windows when a draft model is configured.
        self.spec = spec
        # Device-FSM guided decoding: compiled table cache per guided
        # spec (regex/schema/json_mode).
        self._fsm_cache: Dict = {}
        self.pool = pool or BlockPool(
            runner.kv.num_blocks, cfg.kv_block_size)
        if prefix_cache is not None:
            self.prefix_cache = prefix_cache
        elif cfg.kv_layout == "linear" and cfg.enable_prefix_cache \
                and self._linear_store_blocks(cfg, runner) > 0:
            # Copy-based reuse over a dedicated store extent — the
            # linear fast path keeps its dense slices AND gets prefix
            # reuse (VERDICT r2 missing #4).
            from ..kv.linear_prefix import LinearPrefixCache
            self.prefix_cache = LinearPrefixCache(
                runner, self._linear_store_blocks(cfg, runner),
                cfg.kv_block_size,
                policy=getattr(cfg, "prefix_cache_policy", "lru"))
        else:
            offload = block_io = None
            if cfg.kv_layout == "paged" and cfg.enable_prefix_cache \
                    and getattr(cfg, "prefix_offload_mb", 0) > 0:
                from ..kv.compression import HostOffloadTier, make_strategy
                offload = HostOffloadTier(
                    cfg.prefix_offload_mb << 20,
                    make_strategy(cfg.prefix_offload_algo))
                block_io = (runner.read_kv_block, runner.write_kv_block)
            self.prefix_cache = PrefixCache(
                self.pool,
                enabled=cfg.enable_prefix_cache
                and cfg.kv_layout == "paged",
                policy=getattr(cfg, "prefix_cache_policy", "lru"),
                offload=offload, block_io=block_io)
        self.scheduler = ContinuousBatchScheduler(
            cfg, self.pool, self.prefix_cache, policy=cfg.scheduler)

        self._requests: Dict[str, _RequestState] = {}
        # Pipelined decode: FIFO of outstanding (dispatched, unfetched)
        # windows, newest last — up to cfg.pipeline_depth deep so the
        # fixed per-dispatch cost overlaps device time (window N+1
        # chains from N on device through the slot-indexed last_toks
        # carry; the host fetches N only when the queue exceeds the
        # target depth). Prefill first-token device handles defer to
        # the next iteration the same way.
        self._inflight_q: "collections.deque" = collections.deque()
        self._hold_streak = 0      # consecutive refill-first holds
        self._pending_first: List = []
        # Prompt-logprob scoring: (chunk, result) pairs whose score rows
        # are fetched next iteration (one readback per dispatch).
        self._pending_scores: List = []
        self._lock = threading.Lock()
        self._work_event = threading.Event()
        self._stop = False
        self._loop_thread: Optional[threading.Thread] = None
        self._loop_error: Optional[BaseException] = None
        self.metrics = EngineMetricsSnapshot(
            kv_blocks_total=self.pool.num_blocks)

    # ------------------------------------------------------------------
    # Public API (ref: infer/infer_stream continuous_engine.rs:3515,3593)
    # ------------------------------------------------------------------
    def submit(self, request: InferenceRequest) -> "queue.Queue[StreamChunk]":
        if self._stop:
            raise EngineStoppedError("engine is stopped")
        request.sampling.validate()
        if request.prompt_token_ids is not None:
            ids = list(request.prompt_token_ids)
        elif request.prompt is not None:
            ids = self.tokenizer.encode(request.prompt)
        else:
            raise InvalidRequestError("prompt or prompt_token_ids required",
                                      param="prompt")
        if not ids:
            raise InvalidRequestError("empty prompt", param="prompt")
        if len(ids) + request.sampling.max_tokens > self.cfg.max_model_len:
            # Clamp generation budget rather than reject (vLLM-compatible).
            request.sampling.max_tokens = max(
                1, self.cfg.max_model_len - len(ids))
        if len(ids) >= self.cfg.max_model_len:
            raise InvalidRequestError(
                f"prompt length {len(ids)} exceeds max_model_len "
                f"{self.cfg.max_model_len}", param="prompt")

        if request.echo and request.sampling.logprobs is not None:
            # Prompt-logprob scoring (lm_eval local-completions
            # loglikelihood contract): prefill-only.
            if request.sampling.max_tokens != 0:
                raise InvalidRequestError(
                    "echo+logprobs is supported for max_tokens=0 "
                    "scoring only", param="echo")
            if request.guided is not None:
                raise InvalidRequestError(
                    "echo+logprobs cannot be combined with guided "
                    "decoding", param="echo")
        elif request.sampling.max_tokens == 0:
            raise InvalidRequestError(
                "max_tokens=0 requires echo+logprobs scoring",
                param="max_tokens")

        seq = Sequence(request, ids)
        if request.guided is not None:
            from ..sampling.guided import build_guided_processor
            seq.guided_processor = build_guided_processor(
                request.guided, self.tokenizer)
            self._setup_device_guided(seq, request.guided)
        state = _RequestState(seq)
        with self._lock:
            self._requests[request.request_id] = state
            self.scheduler.submit(seq)
            self.metrics.requests_submitted += 1
        self.ensure_loop()
        self._work_event.set()
        return state.out_queue

    @staticmethod
    def _linear_store_blocks(cfg, runner) -> int:
        """Prefix-store extent size, capped by free HBM with headroom
        (an oversized store OOMs under batched-prefill transients —
        observed on v5e at the 8B bench config). Explicit
        prefix_cache_blocks values pass through uncapped."""
        blocks = cfg.resolved_prefix_cache_blocks
        if cfg.prefix_cache_blocks < 0:     # auto → respect free HBM
            budget = runner.prefix_store_budget_blocks()
            blocks = min(blocks, budget)
            if blocks < cfg.max_blocks_per_seq:
                return 0                    # can't hold one full prompt
        return blocks

    def _setup_device_guided(self, seq, opts) -> None:
        """Compile the request's DFA into device-FSM tables so the
        sequence rides the normal fused windows (mask + state advance
        on device — no per-token host round trip). Falls back silently
        to the host-masking path when the FSM is unsupported (> MAX
        states / non-uniform astral-plane transitions).

        ref: guided.rs masks on the host every step; SURVEY §7 'guided
        decoding on device' is this table design. With a draft model
        wired, the FSM also composes with speculative rounds: the draft
        samples under the mask and the verify program masks the target
        per position (spec_decode.py), so guided requests keep
        speculative speed."""
        key = (opts.regex, getattr(opts, "json_schema", None) and
               str(opts.json_schema), bool(opts.json_mode))
        hit = self._fsm_cache.get(key)
        if hit is None:
            from ..sampling.token_fsm import build_token_fsm, vocab_table
            from ..types import NotSupportedError
            vocab = self.runner.model_cfg.vocab_size
            try:
                vt = vocab_table(self.tokenizer, vocab)
                fsm = build_token_fsm(seq.guided_processor.dfa, vt, vocab)
                # DFA state ids are per-instance; the cached FSM's
                # dfa_to_local refers to THIS dfa, so cache it and make
                # later requests' processors share it.
                hit = (fsm, seq.guided_processor.dfa, vt)
            except NotSupportedError:
                hit = (None, None, None)
            self._fsm_cache[key] = hit
        fsm, dfa, vt = hit
        if fsm is None:
            return
        if seq.guided_processor.dfa is not dfa:
            seq.guided_processor.dfa = dfa
            seq.guided_processor.state = dfa.start
        off = self.runner.register_guided_fsm(fsm, vt)
        seq.guided_fsm = fsm
        seq.guided_fsm_offset = off

    def infer_stream(self, request: InferenceRequest
                     ) -> Iterator[StreamChunk]:
        q = self.submit(request)
        while True:
            chunk = q.get()
            if self._loop_error is not None:
                raise self._loop_error
            yield chunk
            if chunk.finished:
                return

    def infer(self, request: InferenceRequest) -> InferenceResponse:
        t0 = time.monotonic()
        text_parts: List[str] = []
        token_ids: List[int] = []
        ttft = None
        last = None
        for chunk in self.infer_stream(request):
            if chunk.token_ids and ttft is None:
                ttft = time.monotonic() - t0
            text_parts.append(chunk.text)
            token_ids.extend(chunk.token_ids)
            last = chunk
        return InferenceResponse(
            request_id=request.request_id,
            text="".join(text_parts),
            token_ids=token_ids,
            finish_reason=last.finish_reason or FinishReason.STOP,
            prompt_tokens=last.prompt_tokens,
            completion_tokens=last.completion_tokens,
            ttft=ttft,
            e2e_latency=time.monotonic() - t0,
            logprobs=last.logprobs)

    def abort(self, request_id: str) -> None:
        with self._lock:
            state = self._requests.get(request_id)
            if state is not None:
                state.aborted = True
        self._work_event.set()

    def stop(self) -> None:
        self._stop = True
        self._work_event.set()
        if self._loop_thread is not None:
            self._loop_thread.join(timeout=30)
        # Unblock any consumer still waiting in infer_stream's q.get():
        # without this, a request in flight at stop() hangs its caller
        # thread forever (observed: a test run whose process could
        # never exit because engine.stop() in a finally left the
        # worker threads blocked).
        with self._lock:
            states = list(self._requests.values())
            self._requests.clear()
        for state in states:
            state.out_queue.put(StreamChunk(
                request_id=state.seq.request.request_id, text="",
                token_ids=[], finished=True,
                finish_reason=FinishReason.ABORT))

    def metrics_snapshot(self) -> EngineMetricsSnapshot:
        m = self.metrics
        m.kv_blocks_free = self.pool.num_free
        m.waiting_requests = len(self.scheduler.waiting)
        m.running_requests = len(self.scheduler.running)
        pc = self.prefix_cache
        m.prefix_cache_hits = pc.stats.hits
        m.prefix_cache_misses = pc.stats.misses
        m.prefix_cache_saved_tokens = pc.stats.saved_prefill_tokens
        return m

    # ------------------------------------------------------------------
    # Background loop (ref: ensure_bg_loop CAS continuous_engine.rs:3446)
    # ------------------------------------------------------------------
    def ensure_loop(self) -> None:
        if self._loop_thread is None or not self._loop_thread.is_alive():
            with self._lock:
                if self._loop_thread is None or not self._loop_thread.is_alive():
                    self._loop_thread = threading.Thread(
                        target=self._loop, name="ferrum-engine-loop",
                        daemon=True)
                    self._loop_thread.start()

    def _loop(self) -> None:
        try:
            while not self._stop:
                did_work = self.run_iteration()
                if not did_work:
                    self._work_event.wait(timeout=0.05)
                    self._work_event.clear()
        except BaseException as e:  # propagate to waiters
            self._loop_error = e
            traceback.print_exc()
            with self._lock:
                for state in self._requests.values():
                    state.out_queue.put(StreamChunk(
                        request_id=state.seq.request.request_id, text="",
                        token_ids=[], finished=True,
                        finish_reason=FinishReason.ERROR))

    # ------------------------------------------------------------------
    def run_iteration(self) -> bool:
        """One scheduler+device iteration (ref: run_iteration inner.rs:365).
        Returns False when idle.

        Pipelined decode: window W+1 is DISPATCHED (chained on device
        from W's final tokens) before W's results are fetched, so host
        bookkeeping + dispatch RTT overlap with device compute. Slot/KV
        release for sequences finishing in W is deferred until W+1 is
        fetched (its lanes may still write their blocks)."""
        from ..utils import profile as _prof
        iter_t0 = time.monotonic()
        self._drain_aborts()
        did_work = False

        # --- (a0) score rows from scoring prefills (one readback per
        # dispatch; must land before the final-chunk handling below) ---
        if self._pending_scores:
            pend, self._pending_scores = self._pending_scores, []
            for chunk, res in pend:
                seq = chunk.seq
                if seq.phase == Phase.FINISHED or seq.blocks is None:
                    continue
                row = res.rows[seq.request.request_id]
                n = len(chunk.tokens)
                seq.score_parts[chunk.start] = (
                    np.asarray(res.score_lp[row, :n]),
                    np.asarray(res.score_argmax[row, :n]),
                    np.asarray(res.score_argmax_lp[row, :n]))
            did_work = True

        # --- (a) first tokens from prefills dispatched last iteration ---
        if self._pending_first:
            pending, self._pending_first = self._pending_first, []
            # ONE readback per batched prefill dispatch (a per-token
            # np.asarray costs a tunnel RTT each; at c=32 that alone was
            # ~1 s of TTFT).
            fetched: Dict[int, np.ndarray] = {}
            fetched_logits: Dict[int, np.ndarray] = {}
            for seq, res in pending:
                if seq.phase == Phase.FINISHED or seq.blocks is None:
                    continue  # aborted/preempted while in flight
                if seq.request.sampling.max_tokens == 0:
                    # Prompt-only scoring: no token accepted; finish
                    # with the assembled prompt logprobs.
                    self._finish_prompt_only(seq)
                    continue
                row = res.rows[seq.request.request_id]
                if seq.guided_processor is not None \
                        and seq.guided_fsm is None:
                    # Guided: sample the first token on host under the
                    # DFA mask (the device sample ignores it; picking
                    # allowed[0] would choose by vocab order).
                    lg = fetched_logits.get(id(res))
                    if lg is None:
                        lg = np.asarray(res.logits)
                        fetched_logits[id(res)] = lg
                    tok = self._guided_sample(seq, lg[row])
                else:
                    toks = fetched.get(id(res))
                    if toks is None:
                        toks = np.asarray(res.tokens)
                        fetched[id(res)] = toks
                    tok = int(toks[row])
                self._accept_token(seq, tok)
            did_work = True

        # --- (b) schedule; in-flight sequences are preemption-pinned ---
        pinned = frozenset().union(
            *(w.covered for w in self._inflight_q)) \
            if self._inflight_q else frozenset()
        with self._lock:
            # Flush queued prefix-store saves as ONE dispatch, before
            # any admission can overwrite a source slot region or
            # restore a still-pending hash (kv/linear_prefix.py).
            if hasattr(self.prefix_cache, "flush_pending"):
                self.prefix_cache.flush_pending()
            batch = self.scheduler.next_batch(
                pinned=pinned,
                inflight_steps=sum(w.num_steps
                                   for w in self._inflight_q))
            for seq in batch.admitted:
                self.runner.admit_slot(seq)
                if seq.pending_prefix_copy is not None:
                    # Linear-layout prefix hit: restore the cached
                    # blocks into the slot region (device copy,
                    # dispatch-ordered before this seq's first chunk).
                    store_blocks, _cov = seq.pending_prefix_copy
                    self.runner.copy_prefix_blocks(
                        store_blocks,
                        seq.blocks.blocks[:len(store_blocks)],
                        to_store=False)
                    seq.pending_prefix_copy = None
                if seq.prefix_reused_tokens:
                    # Seed repetition-penalty counts for the reused
                    # prompt tokens (the prefill program only counts
                    # the tokens it actually processes).
                    self.runner.add_prompt_counts(
                        seq.slot,
                        seq.prompt_tokens[:seq.prefix_reused_tokens])
                if seq.guided_fsm is None:
                    # Reset any stale FSM state a previous guided
                    # occupant left in this slot — guided-compiled
                    # windows mask EVERY slot by its gstates row, and
                    # unguided lanes must sit at the FREE row (0).
                    self.runner.set_guided_state(seq.slot, 0)
                if seq.guided_fsm is not None:
                    # (Re-)init the device FSM state for this slot:
                    # fresh requests start at the FSM start; recompute
                    # re-admissions resume at the processor's current
                    # state (the host shadow tracks accepted tokens).
                    local = seq.guided_fsm.dfa_to_local.get(
                        seq.guided_processor.state, seq.guided_fsm.dead)
                    self.runner.set_guided_state(
                        seq.slot, seq.guided_fsm_offset + local)
        if not batch.is_empty:
            self.metrics.iterations_total += 1

        # --- (c) dispatch prefill chunks (async; fetched next iter) ---
        # One eligible chunk is held back to ride the decode window's
        # trunk (mixed prefill+decode — the weight stream is already
        # paid by the decode steps); the rest fuse into batched prefill
        # programs per (chunk, context) bucket (the weight stream is
        # amortized across the admitted wave, m = B*T).
        # Plain/guided split decided here (before window-length and
        # mixed-chunk selection) so the per-bucket T spec sees the
        # exact lane count that will be dispatched. Phases of
        # batch.decode_seqs are stable across the prefill dispatch
        # below (a seq finishing prefill this iteration only starts
        # decoding next iteration).
        decode_seqs = [s for s in batch.decode_seqs
                       if s.phase == Phase.DECODING]
        # Device-FSM guided sequences ride the plain fused windows (mask
        # + FSM advance happen inside the compiled step); only the host-
        # masking fallback needs the per-token logits loop.
        guided_seqs = [s for s in decode_seqs
                       if s.guided_processor is not None
                       and s.guided_fsm is None]
        plain_seqs = [s for s in decode_seqs
                      if s.guided_processor is None
                      or s.guided_fsm is not None]

        t_steps = batch.decode_steps or max(1, self.cfg.decode_multi_step)
        if not batch.decode_steps and self.cfg.decode_t_spec and plain_seqs:
            # Per-bucket window length (one T per bucket — same program
            # count as the flat default; see EngineConfig.decode_t_spec).
            t_steps = self.cfg.t_for_bucket(
                self.runner.lane_bucket(len(plain_seqs)))
        # Adaptive window length: each dispatched window pays a fixed
        # host/transport cost (~16-19 ms on the tunneled chip — NOTES_
        # ROUND3 T-sweep), so at low occupancy with nothing waiting to
        # admit, run windows twice as long to amortize it (chains
        # survive length changes; overshoot past EOS is discarded).
        # decode_t_spec IS the length policy when set — adaptive
        # doubling/halving stands down for consistency of the warm set.
        if (not batch.decode_steps and self.cfg.pipeline_decode
                and self.cfg.adaptive_windows
                and not self.cfg.decode_t_spec
                and not batch.prefill_chunks
                and not self.scheduler.waiting):
            t_steps = self.runner.adaptive_window_steps(
                t_steps, len(batch.decode_seqs))
        elif (not batch.decode_steps and batch.prefill_chunks
                and self.cfg.adaptive_windows
                and not self.cfg.decode_t_spec
                and self.scheduler.waiting):
            # Admission pileup (initial burst): shorter windows between
            # prefill waves pull every queued request's first token
            # forward; steady-state iterations return to full length.
            t_steps = max(4, t_steps // 2)
        pf_chunk = None
        will_decode = any(s.phase == Phase.DECODING
                          and (s.guided_processor is None
                               or s.guided_fsm is not None)
                          for s in batch.decode_seqs)
        if (batch.prefill_chunks and self.cfg.mixed_prefill
                and will_decode and self.spec is None
                and self.cfg.pipeline_decode
                and self.runner.attn_impl == "linear"
                and not self.runner.hybrid):
            for chunk in batch.prefill_chunks:
                sq = chunk.seq
                if (sq.guided_processor is None
                        and not sq.score_mode
                        and sq.num_output_tokens == 0
                        and len(chunk.tokens) <= 128 * t_steps):
                    pf_chunk = chunk
                    break
        # Refill-first: decode is HBM-bandwidth-bound, so a window at
        # half occupancy streams the full weight set for half the
        # tokens. When a multi-sequence admission wave is prefilling
        # and occupancy is low, hold decode for the iteration and let
        # the wave join — the next windows run at full occupancy.
        # (gates/tpu phase_times: 368 window-steps at avg occupancy
        # ~17/32 for a c=32 cell vs ~192 ideal — ~1.5 s of
        # half-occupancy weight streams.) A single long prompt never
        # holds decode: it contributes one chunk per iteration.
        # Guard rails: never hold under KV pressure or while recompute
        # re-admissions are in the wave (the held decodes are what
        # frees blocks — holding can livelock a tight pool), and bound
        # consecutive holds so any pathological admission pattern
        # self-resolves.
        hold_decode = (
            self.cfg.refill_first and self.spec is None
            and len(batch.prefill_chunks) >= 2
            and 0 < len(plain_seqs) <= self.runner.num_slots // 2
            and not batch.deferred_decodes
            and not any(c.seq.recompute for c in batch.prefill_chunks)
            and self._hold_streak < 8)
        self._hold_streak = self._hold_streak + 1 if hold_decode else 0
        if hold_decode:
            pf_chunk = None
        old_chunks = [c for c in batch.prefill_chunks if c is not pf_chunk]
        if old_chunks:
            self._dispatch_prefill_groups(old_chunks)

        # --- (d) decode: dispatch W+1, then fetch + process W ---
        new_window = None
        newest = self._inflight_q[-1] if self._inflight_q else None
        if self.spec is not None:
            # Speculative rounds replace decode windows (fixed K+1
            # shape → no length-change chain breaks); same pipelined
            # dispatch-ahead pattern (depth 1: rounds carry their own
            # accept/reject accounting).
            if plain_seqs and not (batch.deferred_decodes and pinned):
                new_window = self.spec.start_round(
                    plain_seqs, prev=newest)
            plain_seqs = []
        elif plain_seqs and self.cfg.pipeline_decode and not hold_decode:
            # Window length and lane-bucket changes chain freely: the
            # device carry is the slot-indexed last_toks array, not the
            # previous window's output shape.
            if batch.deferred_decodes and pinned:
                # KV pressure unresolvable while the chain pins every
                # victim: break the chain (drain the queue below) so
                # next iteration can preempt freely.
                pass
            elif plain_seqs:
                new_window = self.runner.start_decode_window(
                    plain_seqs, t_steps, prev=newest,
                    pf_chunk=pf_chunk)
                if pf_chunk is not None:
                    self.scheduler.note_prefill_done(pf_chunk)
                    self.metrics.tokens_prefilled += len(pf_chunk.tokens)
                    pf_chunk = None

        if pf_chunk is not None:
            # The held-back chunk found no window to ride this iteration
            # (chain break / deferred decode / no plain lanes after
            # phase filtering): dispatch it standalone.
            self._dispatch_prefill_groups([pf_chunk])

        if new_window is not None:
            self._inflight_q.append(new_window)
            # Target depth: cfg.pipeline_depth while the batch is busy;
            # 1 at <= 4 active lanes (each extra outstanding window adds
            # a full window of token-delivery latency) and for spec
            # rounds (their round accounting assumes depth 1).
            depth = 1 if (self.spec is not None
                          or len(batch.decode_seqs) <= 4) \
                else max(1, self.cfg.pipeline_depth)
        else:
            # Nothing dispatched (chain break / no decodable lanes):
            # drain so preemption unpins and idle engines quiesce.
            depth = 0
        while len(self._inflight_q) > depth:
            self._process_window(self._inflight_q.popleft())
            did_work = True

        if plain_seqs and not self.cfg.pipeline_decode and not hold_decode:
            token_lists = self.runner.run_decode_multi(plain_seqs, t_steps)
            self._accept_window_tokens(plain_seqs, token_lists, t_steps)

        if guided_seqs:
            # Guided sequences need per-token host masking → single step
            # with logits readback (the in-flight window keeps the device
            # busy while the host blocks here).
            tokens, logits = self.runner.run_decode(
                guided_seqs, return_logits=True)
            for seq in guided_seqs:
                tok = self._guided_sample(seq, logits[seq.slot])
                self._accept_token(seq, tok)
                self.metrics.tokens_decoded += 1

        _prof.emit("engine.iteration", time.monotonic() - iter_t0, {
            "decode": len(decode_seqs),
            "prefill_chunks": len(batch.prefill_chunks),
        })
        # Memory high-water trace: one snapshot every 256 iterations
        # (device HBM stats on TPU, host RSS fallback) — long serves
        # get a leak/fragmentation record without a profiler attach.
        self._mem_profile_tick = getattr(self, "_mem_profile_tick", 0) + 1
        if self._mem_profile_tick % 256 == 1:
            _prof.emit_memory({"iterations": self.metrics.iterations_total,
                               "running": len(self.scheduler.running),
                               "waiting": len(self.scheduler.waiting)})
        # deferred_decodes keep the loop LIVE: a fully KV-deferred batch
        # is empty by is_empty's definition, but the deferral resolves
        # only by iterating (queue drain → unpin → preempt/min-progress)
        # — sleeping here deadlocks those requests.
        return did_work or not batch.is_empty \
            or bool(self._inflight_q) or bool(batch.deferred_decodes)

    def _dispatch_prefill_groups(self, chunks) -> None:
        """Batched standalone prefill: chunks sharing a (chunk, context)
        bucket fuse into ONE program; final chunks' first tokens are
        fetched next iteration (_pending_first).

        Scoring chunks (echo+logprobs) dispatch alone through the score
        program variant (b=1 bounds the [t_pad, V] softmax-stat
        transient); their per-position rows are fetched next iteration
        (_pending_scores)."""
        score_chunks = [c for c in chunks if c.seq.score_mode]
        chunks = [c for c in chunks if not c.seq.score_mode]
        for chunk in score_chunks:
            res = self.runner.run_prefill_batch([chunk], score=True)
            self.scheduler.note_prefill_done(chunk)
            self.metrics.tokens_prefilled += len(chunk.tokens)
            self._pending_scores.append((chunk, res))
            if chunk.is_last:
                self._pending_first.append((chunk.seq, res))
        groups: Dict[Tuple[int, int], list] = {}
        for chunk in chunks:
            k = (self.runner.chunk_bucket(len(chunk.tokens)),
                 self.runner.ctx_bucket(chunk.start + len(chunk.tokens)))
            groups.setdefault(k, []).append(chunk)
        for group in groups.values():
            # Host-masked guided requests (FSM fallback) need the
            # final-position logits; device-FSM requests sample under
            # the mask on device like plain ones.
            host_guided = any(
                c.seq.guided_processor is not None
                and c.seq.guided_fsm is None and c.is_last
                for c in group)
            res = self.runner.run_prefill_batch(
                group, return_logits=host_guided)
            for chunk in group:
                self.scheduler.note_prefill_done(chunk)
                self.metrics.tokens_prefilled += len(chunk.tokens)
                if chunk.is_last:
                    self._pending_first.append((chunk.seq, res))

    def _process_window(self, window) -> None:
        """Fetch an outstanding window's tokens, accept them, and release
        resources whose cleanup was deferred past this window.
        Handles both DecodeWindow and SpecWindow (variable per-slot
        token counts)."""
        if self.spec is not None and hasattr(window, "n_out"):
            token_lists = self.spec.sync_round(window)
            for seq in window.seqs:
                for tok in token_lists[seq.request.request_id]:
                    if seq.phase != Phase.DECODING:
                        break
                    self._accept_token(seq, tok)
                    self.metrics.tokens_decoded += 1
        else:
            token_lists = self.runner.sync_window(window)
            self._accept_window_tokens(window.seqs, token_lists,
                                       window.num_steps)
            pf = getattr(window, "pf_seq", None)
            if (pf is not None and window.pf_is_last
                    and pf.phase == Phase.DECODING
                    and not pf.output_tokens):
                # Mixed-prefill first token: sampled in-window at the
                # chunk's last row, carried in the slot's final output
                # row (the next window already chained from it).
                self._accept_token(
                    pf, token_lists[pf.request.request_id][-1])
        for seq in window.deferred:
            with self._lock:
                self.scheduler.finish(seq)

    def _accept_window_tokens(self, seqs, token_lists, t_steps) -> None:
        for seq in seqs:
            if seq.phase != Phase.DECODING:
                continue  # finished/aborted earlier in window
            toks = token_lists[seq.request.request_id][:t_steps]
            if seq.guided_processor is not None \
                    or seq.request.sampling.stop:
                # Per-token path: the guided host-shadow FSM and stop-
                # string scans need token granularity.
                for tok in toks:
                    if seq.phase != Phase.DECODING:
                        break
                    self._accept_token(seq, tok)
                    self.metrics.tokens_decoded += 1
            else:
                self._accept_seq_window(seq, toks)

    def _accept_seq_window(self, seq: Sequence, toks) -> None:
        """Accept one sequence's whole window of tokens at once.

        The per-token path costs ~0.5 ms/token of host work (per-token
        set builds, incremental detok calls, StreamChunk queue puts
        each waking a consumer thread) — at c=32 x T=16 that is ~270 ms
        per 254 ms window, capping the engine at 48% of device-side
        throughput (gates/perf r5 decomposition). Tokens genuinely
        arrive host-side once per window, so window granularity is the
        honest streaming unit: scan the ints for EOS/length finishes,
        detokenize ONCE, emit ONE chunk."""
        sp = seq.request.sampling
        eos_ids = seq.eos_cache
        if eos_ids is None:
            eos_ids = seq.eos_cache = frozenset(
                self.tokenizer.eos_token_ids) | frozenset(sp.stop_token_ids)
        n0 = seq.num_output_tokens
        finish: Optional[FinishReason] = None
        n_acc = 0
        eos_hit = False
        for tok in toks:
            n_acc += 1
            n = n0 + n_acc
            if not sp.ignore_eos and tok in eos_ids and n >= sp.min_tokens:
                finish = FinishReason.STOP
                eos_hit = True
                break
            if n >= sp.max_tokens:
                finish = FinishReason.LENGTH
                break
        accepted = list(toks[:n_acc])
        seq.output_tokens.extend(accepted)
        self.metrics.tokens_decoded += n_acc
        if seq.first_token_time is None:
            seq.first_token_time = time.monotonic()

        # One incremental-detok call per window (excluding a finishing
        # EOS token, matching the per-token path's text semantics).
        visible = seq.output_tokens[:-1] if eos_hit else seq.output_tokens
        text = ""
        if len(visible) > n0:
            text, seq.detok_prefix_offset, seq.detok_read_offset = \
                self.tokenizer.decode_incremental(
                    visible, seq.detok_prefix_offset,
                    seq.detok_read_offset)
        seq.emitted_text_len += len(text)

        state = self._requests.get(seq.request.request_id)
        if state is not None and (text or accepted or finish is not None):
            state.out_queue.put(StreamChunk(
                request_id=seq.request.request_id, text=text,
                token_ids=accepted, finished=finish is not None,
                finish_reason=finish,
                prompt_tokens=seq.num_prompt_tokens,
                completion_tokens=seq.num_output_tokens))
        if finish is not None:
            seq.finish_reason = finish
            with self._lock:
                self._requests.pop(seq.request.request_id, None)
                self.metrics.requests_completed += 1
            self._retire_seq(seq)

    # ------------------------------------------------------------------
    def _finish_prompt_only(self, seq: Sequence) -> None:
        """Finish a max_tokens=0 request after its prefill: emit ONE
        final chunk carrying the assembled prompt logprobs (score mode)
        and release the sequence."""
        logprobs = None
        if seq.score_mode:
            logprobs = self._assemble_prompt_logprobs(seq)
        state = self._requests.get(seq.request.request_id)
        seq.finish_reason = FinishReason.LENGTH
        if state is not None:
            state.out_queue.put(StreamChunk(
                request_id=seq.request.request_id, text="",
                token_ids=[], finished=True,
                finish_reason=FinishReason.LENGTH,
                prompt_tokens=seq.num_prompt_tokens,
                completion_tokens=0, logprobs=logprobs))
        with self._lock:
            self._requests.pop(seq.request.request_id, None)
            self.metrics.requests_completed += 1
        self._retire_seq(seq)

    def _assemble_prompt_logprobs(self, seq: Sequence):
        """Stitch per-chunk score rows into per-prompt-token entries.

        Entry p holds the logprob of prompt token p given tokens < p
        (None at p=0), plus the argmax token at that position — enough
        for lm_eval's loglikelihood sum AND its is_greedy check.
        Chunk at `start` scored targets start+1 .. start+len."""
        n = seq.num_prompt_tokens
        lp = np.full(n, np.nan, np.float64)
        am = np.full(n, -1, np.int64)
        am_lp = np.full(n, np.nan, np.float64)
        for start in sorted(seq.score_parts):
            t_lp, t_am, t_am_lp = seq.score_parts[start]
            m = min(len(t_lp), n - 1 - start)   # last position: no target
            if m <= 0:
                continue
            lp[start + 1:start + 1 + m] = t_lp[:m]
            am[start + 1:start + 1 + m] = t_am[:m]
            am_lp[start + 1:start + 1 + m] = t_am_lp[:m]
        out = []
        for p in range(n):
            if p == 0 or np.isnan(lp[p]):
                out.append({"token_id": seq.prompt_tokens[p],
                            "logprob": None, "argmax_id": None,
                            "argmax_logprob": None})
            else:
                out.append({"token_id": seq.prompt_tokens[p],
                            "logprob": float(lp[p]),
                            "argmax_id": int(am[p]),
                            "argmax_logprob": float(am_lp[p])})
        return out

    # ------------------------------------------------------------------
    def _guided_sample(self, seq: Sequence, logits_row: np.ndarray) -> int:
        from ..sampling.host import sample_host
        mask = seq.guided_processor.allowed_mask(seq)
        rng = np.random.default_rng(
            (seq.request.sampling.seed or self.cfg.seed)
            + seq.num_output_tokens)
        tok = sample_host(logits_row, seq.request.sampling,
                          seq.all_tokens, rng, mask=mask)
        seq.guided_processor.advance(seq, tok)
        return tok

    # ------------------------------------------------------------------
    def _accept_token(self, seq: Sequence, token: int) -> None:
        state = self._requests.get(seq.request.request_id)
        seq.output_tokens.append(token)
        if seq.first_token_time is None:
            seq.first_token_time = time.monotonic()
        if seq.guided_fsm is not None:
            # Device-FSM path: keep the host shadow processor in sync
            # (drives is_complete + state re-init on re-admission). The
            # host-masking path advances inside _guided_sample instead.
            seq.guided_processor.advance(seq, token)

        sp = seq.request.sampling
        finish: Optional[FinishReason] = None
        eos_ids = set(self.tokenizer.eos_token_ids) \
            | set(sp.stop_token_ids)
        if not sp.ignore_eos and token in eos_ids \
                and seq.num_output_tokens >= sp.min_tokens:
            finish = FinishReason.STOP
        elif seq.num_output_tokens >= sp.max_tokens:
            finish = FinishReason.LENGTH
        elif seq.guided_processor is not None \
                and seq.guided_processor.is_complete(seq):
            finish = FinishReason.STOP

        # Incremental detokenization (skip the EOS token itself).
        text = ""
        if finish is None or token not in eos_ids:
            text, seq.detok_prefix_offset, seq.detok_read_offset = \
                self.tokenizer.decode_incremental(
                    seq.output_tokens, seq.detok_prefix_offset,
                    seq.detok_read_offset)

        # Stop strings: emit text up to (excluding) the stop match.
        if finish is None and sp.stop and text:
            emitted = seq.emitted_text_len
            candidate = self._full_text(seq)
            for stop_s in sp.stop:
                idx = candidate.find(stop_s, max(0, emitted - len(stop_s)))
                if idx >= 0:
                    text = candidate[emitted:idx]
                    finish = FinishReason.STOP
                    break

        seq.emitted_text_len += len(text)
        if state is not None and (text or finish is not None):
            state.out_queue.put(StreamChunk(
                request_id=seq.request.request_id, text=text,
                token_ids=[token], finished=finish is not None,
                finish_reason=finish,
                prompt_tokens=seq.num_prompt_tokens,
                completion_tokens=seq.num_output_tokens))
        if finish is not None:
            seq.finish_reason = finish
            with self._lock:
                self._requests.pop(seq.request.request_id, None)
                self.metrics.requests_completed += 1
            self._retire_seq(seq)

    def _retire_seq(self, seq: Sequence) -> None:
        """Release the sequence's slot + KV — deferred while an
        outstanding decode window may still write its blocks.

        Linear layout: release IMMEDIATELY. The slot's KV region is
        slot-owned (identity block table), so the zombie lane in the
        in-flight window can only write inside that region, and every
        state write for a replacement sequence (admit reset, prefill
        KV, FSM init) is dispatched AFTER the in-flight window —
        device-order makes slot reuse safe, and the replacement admits
        ~2 windows sooner (the steady-state TTFT floor under load)."""
        # Any outstanding window may still write this seq's lanes; defer
        # to the NEWEST covering window (processed last, FIFO).
        infl = next((w for w in reversed(self._inflight_q)
                     if seq.request.request_id in w.covered), None)
        if infl is not None and self.cfg.kv_layout != "linear":
            seq.phase = Phase.FINISHED   # excluded from future scheduling
            # Prompt KV blocks are immutable once prefilled — only
            # decode-token blocks may still be written by the in-flight
            # window. Publish them to the prefix cache NOW so a request
            # admitted before the window is fetched can reuse them
            # (scheduler.finish re-inserts idempotently on release).
            if self.prefix_cache is not None and seq.blocks is not None \
                    and seq.num_prompt_tokens >= self.pool.page_size:
                with self._lock:
                    self.prefix_cache.insert(seq.prompt_tokens,
                                             seq.blocks.blocks)
            infl.deferred.append(seq)
        else:
            with self._lock:
                self.scheduler.finish(seq)

    def _full_text(self, seq: Sequence) -> str:
        return self.tokenizer.decode(seq.output_tokens)

    def _drain_aborts(self) -> None:
        with self._lock:
            dead = [s for s in self._requests.values() if s.aborted]
            for state in dead:
                seq = state.seq
                if seq.phase in (Phase.PREFILLING, Phase.DECODING,
                                 Phase.WAITING, Phase.PREEMPTED):
                    if seq in self.scheduler.waiting:
                        self.scheduler.waiting.remove(seq)
                    infl = next((w for w in reversed(self._inflight_q)
                                 if seq.request.request_id in w.covered),
                                None)
                    if infl is not None \
                            and self.cfg.kv_layout != "linear":
                        # Slot/KV release deferred past the in-flight
                        # window that may still write its blocks
                        # (paged: blocks return to the shared pool;
                        # linear slot regions are reuse-safe, see
                        # _retire_seq).
                        seq.phase = Phase.FINISHED
                        infl.deferred.append(seq)
                    else:
                        self.scheduler.finish(seq)
                state.out_queue.put(StreamChunk(
                    request_id=seq.request.request_id, text="",
                    token_ids=[], finished=True,
                    finish_reason=FinishReason.ABORT,
                    prompt_tokens=seq.num_prompt_tokens,
                    completion_tokens=seq.num_output_tokens))
                self._requests.pop(seq.request.request_id, None)
