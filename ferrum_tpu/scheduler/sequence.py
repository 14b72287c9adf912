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
        # Number of prompt tokens whose KV is already computed/adopted.
        self.prefilled = 0
        # Prefix-cache adoption at admission time.
        self.prefix_reused_tokens = 0
        self.preempt_count = 0
        # Timing
        self.first_token_time: Optional[float] = None
        self.finish_reason: Optional[FinishReason] = None
        # Incremental detokenization state (tokenizer module fills these).
        self.detok_prefix_offset = 0
        self.detok_read_offset = 0
        self.emitted_text_len = 0
        # Guided decoding DFA state index (sampling/guided.py).
        self.guided_state: Optional[int] = None
        self.guided_processor = None

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
    def prompt_remaining(self) -> int:
        return self.num_prompt_tokens - self.prefilled

    @property
    def is_prefill_done(self) -> bool:
        return self.prefilled >= self.num_prompt_tokens

    def next_position(self) -> int:
        """Absolute position of the next token to decode."""
        return self.total_tokens - 1

    def reset_for_recompute(self) -> None:
        """Preemption: KV was dropped; prompt AND generated tokens will be
        re-prefilled on re-admission (the reference's recompute policy,
        continuous.rs:559-726)."""
        self.prefilled = 0
        self.prefix_reused_tokens = 0
        self.slot = None
        self.phase = Phase.PREEMPTED
        self.preempt_count += 1
