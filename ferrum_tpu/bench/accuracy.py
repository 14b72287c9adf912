"""Accuracy gates: greedy self-determinism + quant token-divergence.

TPU-native analog of the reference's accuracy ladder
(crates/ferrum-cli/tests/quant_kl.rs: 100% greedy self-agreement and
INT4-vs-FP16 token-divergence rate < 0.10; scripts/lm_eval_light.sh:
lm-evaluation-harness subsets against /v1/completions with rtol vs a
committed baseline).

These run against real checkpoints; CI covers the structural analog on
tiny models (tests/test_quant.py int4 logit fidelity).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

from ..engine.engine import ContinuousBatchEngine
from ..types import InferenceRequest, SamplingParams

DEFAULT_PROMPTS = (
    "The capital of France is",
    "Water is composed of hydrogen and",
    "In computer science, a binary search runs in",
    "The first law of thermodynamics states that energy",
    "To bake bread you first mix flour with",
)


@dataclass
class DeterminismReport:
    prompts: int
    token_agreement: float          # must be 1.0 (100%)
    passed: bool


def greedy_self_determinism(engine: ContinuousBatchEngine,
                            prompts: Sequence[str] = DEFAULT_PROMPTS,
                            max_tokens: int = 64) -> DeterminismReport:
    """Two greedy runs per prompt must agree 100% (quant_kl.rs gate)."""
    agree = total = 0
    for p in prompts:
        runs = []
        for _ in range(2):
            req = InferenceRequest(
                prompt=p, sampling=SamplingParams(max_tokens=max_tokens,
                                                  ignore_eos=True))
            runs.append(engine.infer(req).token_ids)
        n = min(len(runs[0]), len(runs[1]))
        agree += sum(a == b for a, b in zip(runs[0][:n], runs[1][:n]))
        total += n
    rate = agree / max(total, 1)
    return DeterminismReport(prompts=len(prompts), token_agreement=rate,
                             passed=rate == 1.0)


@dataclass
class DivergenceReport:
    prompts: int
    tokens_compared: int
    divergence_rate: float          # gate: < 0.10
    passed: bool


def quant_token_divergence(engine_hi: ContinuousBatchEngine,
                           engine_lo: ContinuousBatchEngine,
                           prompts: Sequence[str] = DEFAULT_PROMPTS,
                           max_tokens: int = 64,
                           gate: float = 0.10) -> DivergenceReport:
    """Greedy token divergence between a high-precision engine and its
    quantized counterpart (INT4-vs-FP16 gate, quant_kl.rs:1-17)."""
    div = total = 0
    for p in prompts:
        a = engine_hi.infer(InferenceRequest(
            prompt=p, sampling=SamplingParams(max_tokens=max_tokens,
                                              ignore_eos=True))).token_ids
        b = engine_lo.infer(InferenceRequest(
            prompt=p, sampling=SamplingParams(max_tokens=max_tokens,
                                              ignore_eos=True))).token_ids
        n = min(len(a), len(b))
        div += sum(x != y for x, y in zip(a[:n], b[:n]))
        total += n
    rate = div / max(total, 1)
    return DivergenceReport(prompts=len(prompts), tokens_compared=total,
                            divergence_rate=rate, passed=rate < gate)


def lm_eval_light(base_url: str, tasks: Optional[Dict[str, int]] = None,
                  rtol: float = 0.05,
                  baseline: Optional[Dict[str, float]] = None) -> Dict:
    """lm-evaluation-harness subsets against a /v1/completions endpoint
    (mmlu 100q 5-shot, arc_easy 100q, gsm8k 50q — lm_eval_light.sh).

    Requires the `lm_eval` package and dataset access; in offline/CI
    environments this returns a skipped report rather than failing.
    """
    tasks = tasks or {"mmlu": 100, "arc_easy": 100, "gsm8k": 50}
    try:
        import lm_eval  # noqa: F401
    except ImportError:
        return {"skipped": "lm_eval not installed (offline environment)",
                "tasks": tasks}
    raise NotImplementedError(
        "wire lm_eval's local-completions model to base_url")
