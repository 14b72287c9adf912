"""Shared data types: requests, responses, errors, metrics.

TPU-native analog of the reference's `ferrum-types` crate
(crates/ferrum-types/src/{requests.rs,config.rs,metrics.rs}).
Plain dataclasses — these cross no device boundary; device-side state is
kept separately as pytrees of jnp arrays (engine/state.py).
"""

from __future__ import annotations

import enum
import time
import uuid
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional


class FerrumError(Exception):
    """Base error taxonomy (ref: ferrum-types/src/error.rs)."""

    code = "internal_error"

    def __init__(self, message: str, *, param: Optional[str] = None):
        super().__init__(message)
        self.message = message
        self.param = param


class InvalidRequestError(FerrumError):
    """400-class: a request field failed validation (carries `param`)."""

    code = "invalid_request_error"


class ModelLoadError(FerrumError):
    code = "model_load_error"


class CapacityError(FerrumError):
    """Engine is out of KV blocks / request slots and cannot admit."""

    code = "capacity_error"


class NotSupportedError(FerrumError):
    code = "not_supported"


class EngineStoppedError(FerrumError):
    code = "engine_stopped"


class FinishReason(str, enum.Enum):
    STOP = "stop"            # EOS or stop string
    LENGTH = "length"        # max_tokens reached
    TOOL_CALLS = "tool_calls"
    ABORT = "abort"
    ERROR = "error"


@dataclass
class SamplingParams:
    """Per-request sampling configuration.

    Mirrors the knobs of the reference's logits-processor chain
    (ferrum-interfaces/src/sampler.rs:142-383): temperature, top-k,
    top-p, repetition penalty, then greedy/multinomial selection.
    temperature == 0.0 means greedy (argmax).
    """

    temperature: float = 0.0
    top_k: int = 0              # 0 = disabled
    top_p: float = 1.0          # 1.0 = disabled
    repetition_penalty: float = 1.0
    max_tokens: int = 512
    min_tokens: int = 0
    stop: List[str] = field(default_factory=list)
    stop_token_ids: List[int] = field(default_factory=list)
    seed: Optional[int] = None
    ignore_eos: bool = False
    logprobs: Optional[int] = None

    def validate(self) -> None:
        if self.temperature < 0.0:
            raise InvalidRequestError("temperature must be >= 0", param="temperature")
        if not (0.0 < self.top_p <= 1.0):
            raise InvalidRequestError("top_p must be in (0, 1]", param="top_p")
        if self.top_k < 0:
            raise InvalidRequestError("top_k must be >= 0", param="top_k")
        if self.max_tokens < 0:
            # 0 = prompt-only scoring (echo+logprobs, no generation).
            raise InvalidRequestError("max_tokens must be >= 0", param="max_tokens")
        if self.repetition_penalty <= 0.0:
            raise InvalidRequestError(
                "repetition_penalty must be > 0", param="repetition_penalty"
            )


@dataclass
class GuidedOptions:
    """Structured-output constraints (ref: ferrum-sampler/src/guided.rs).

    Exactly one of `regex` / `json_schema` / `json_mode` is typically set.
    """

    regex: Optional[str] = None
    json_schema: Optional[Dict[str, Any]] = None
    json_mode: bool = False
    # When the DFA is in an accepting state, allow EOS (ref guided.rs
    # "EOS-when-accepting").
    strict: bool = True


@dataclass
class InferenceRequest:
    """Engine-boundary request (ref: ferrum-types/src/requests.rs).

    `prompt_token_ids` may be pre-tokenized by the caller (server does
    this after chat-template rendering); otherwise `prompt` is tokenized
    by the engine.
    """

    prompt: Optional[str] = None
    prompt_token_ids: Optional[List[int]] = None
    sampling: SamplingParams = field(default_factory=SamplingParams)
    guided: Optional[GuidedOptions] = None
    # Prompt-logprob scoring (/v1/completions echo+logprobs with
    # max_tokens=0 — the lm_eval local-completions loglikelihood
    # contract): the engine returns per-prompt-position logprobs.
    echo: bool = False
    request_id: str = field(default_factory=lambda: f"req-{uuid.uuid4().hex[:16]}")
    priority: int = 0
    arrival_time: float = field(default_factory=time.monotonic)
    # LoRA adapter name, resolved by the engine's adapter registry.
    lora: Optional[str] = None


@dataclass
class StreamChunk:
    """One incremental output emission (ref: ferrum-types StreamChunk)."""

    request_id: str
    text: str
    token_ids: List[int]
    finished: bool = False
    finish_reason: Optional[FinishReason] = None
    # Usage accounting, populated on the final chunk.
    prompt_tokens: int = 0
    completion_tokens: int = 0
    logprobs: Optional[List[Dict[str, Any]]] = None


@dataclass
class InferenceResponse:
    request_id: str
    text: str
    token_ids: List[int]
    finish_reason: FinishReason
    prompt_tokens: int
    completion_tokens: int
    # Per-request latency breakdown in seconds.
    ttft: Optional[float] = None
    e2e_latency: Optional[float] = None
    logprobs: Optional[List[Dict[str, Any]]] = None


@dataclass
class EngineMetricsSnapshot:
    """Typed metrics snapshot (ref: ferrum-types/src/metrics.rs)."""

    iterations_total: int = 0
    requests_submitted: int = 0
    requests_completed: int = 0
    requests_preempted: int = 0
    tokens_prefilled: int = 0
    tokens_decoded: int = 0
    kv_blocks_total: int = 0
    kv_blocks_free: int = 0
    waiting_requests: int = 0
    running_requests: int = 0
    prefix_cache_hits: int = 0
    prefix_cache_misses: int = 0
    prefix_cache_saved_tokens: int = 0

    def to_dict(self) -> Dict[str, Any]:
        return dict(self.__dict__)
