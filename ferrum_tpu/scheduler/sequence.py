"""Per-request sequence state (host side).

TPU-native analog of the reference engine's `SequenceState`
(crates/ferrum-engine/src/continuous_engine.rs:591-1797): prompt/output
tokens, phase, KV lease, sampling bookkeeping, stop logic. Device-side
per-slot state (sampling params, RNG keys) lives in the engine's slot
arrays; this object is the host mirror and owner.
"""

from __future__ import annotations

import enum
import time
from dataclasses import dataclass, field
from typing import List, Optional

from ..kv.block_pool import SequenceBlocks
from ..types import FinishReason, InferenceRequest


class Phase(enum.Enum):
    WAITING = "waiting"
    PREFILLING = "prefilling"
    DECODING = "decoding"
    PREEMPTED = "preempted"
    FINISHED = "finished"


class Sequence:
    def __init__(self, request: InferenceRequest, prompt_tokens: List[int]):
        self.request = request
        self.prompt_tokens: List[int] = list(prompt_tokens)
        self.output_tokens: List[int] = []
        self.phase = Phase.WAITING
        self.slot: Optional[int] = None
        self.blocks: Optional[SequenceBlocks] = None
        # Number of prefill-target tokens whose KV is already
        # computed/adopted (target = prompt, or prompt+outputs after a
        # recompute preemption — see prefill_target).
        self.prefilled = 0
        # True between a preemption with generated output and the end of
        # the recompute prefill: the KV for prompt AND outputs must be
        # rebuilt (the reference preempt_victim recompute semantics,
        # continuous_engine/inner/batch.rs:998; vLLM recompute policy).
        self.recompute = False
        # Prefix-cache adoption at admission time. For the linear layout
        # pending_prefix_copy holds (store_block_ids, covered) until the
        # engine dispatches the store→slot copy (kv/linear_prefix.py).
        self.prefix_reused_tokens = 0
        self.pending_prefix_copy = None
        self.preempt_count = 0
        # Timing
        self.first_token_time: Optional[float] = None
        self.finish_reason: Optional[FinishReason] = None
        # Incremental detokenization state (tokenizer module fills these).
        self.detok_prefix_offset = 0
        self.detok_read_offset = 0
        self.emitted_text_len = 0
        # Lazy cache of eos | stop_token_ids (engine._accept_seq_window:
        # per-token set construction measured in the host hot path).
        self.eos_cache = None
        # Guided decoding DFA state index (sampling/guided.py).
        self.guided_state: Optional[int] = None
        self.guided_processor = None
        # Device-FSM guided decoding (sampling/token_fsm.py): global row
        # offset of this request's FSM in the runner's stacked tables,
        # plus the TokenFsm itself (for state re-init on re-admission).
        self.guided_fsm = None
        self.guided_fsm_offset: Optional[int] = None
        # Prompt-logprob scoring (echo+logprobs): per-chunk score rows
        # keyed by chunk start — (target_lp, argmax_id, argmax_lp).
        self.score_mode = bool(request.echo
                               and request.sampling.logprobs is not None)
        self.score_parts: dict = {}

    # --- derived ---
    @property
    def num_prompt_tokens(self) -> int:
        return len(self.prompt_tokens)

    @property
    def num_output_tokens(self) -> int:
        return len(self.output_tokens)

    @property
    def total_tokens(self) -> int:
        return self.num_prompt_tokens + self.num_output_tokens

    @property
    def all_tokens(self) -> List[int]:
        return self.prompt_tokens + self.output_tokens

    @property
    def prefill_target(self) -> List[int]:
        """Tokens whose KV the prefill phase must produce. After a
        recompute preemption this includes already-generated outputs:
        decode resumes at position total_tokens-1 and attention reads
        every earlier position, so their KV must exist. The final
        chunk's sample then predicts position total_tokens — a genuinely
        NEW token, emitted normally (no duplicate suppression needed)."""
        return self.all_tokens if self.recompute else self.prompt_tokens

    @property
    def prefill_remaining(self) -> int:
        return len(self.prefill_target) - self.prefilled

    # Backwards-compatible alias (prompt == target outside recompute).
    @property
    def prompt_remaining(self) -> int:
        return self.prefill_remaining

    @property
    def is_prefill_done(self) -> bool:
        return self.prefilled >= len(self.prefill_target)

    def next_position(self) -> int:
        """Absolute position of the next token to decode."""
        return self.total_tokens - 1

    def reset_for_recompute(self) -> None:
        """Preemption: KV was dropped; prompt AND generated tokens will be
        re-prefilled on re-admission (the reference's recompute policy,
        continuous.rs:559-726)."""
        self.prefilled = 0
        self.prefix_reused_tokens = 0
        self.pending_prefix_copy = None
        self.slot = None
        self.phase = Phase.PREEMPTED
        self.preempt_count += 1
        self.recompute = bool(self.output_tokens)
