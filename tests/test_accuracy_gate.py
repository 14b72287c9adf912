"""Accuracy-gate harness (VERDICT r3 #7): int4-vs-float greedy
divergence + self-determinism on architecture-true random weights.
Hardware-free check of the harness itself; the committed gate artifact
under gates/accuracy/ runs the same code on the chip (ref:
crates/ferrum-cli/tests/quant_kl.rs:1-17 divergence < 0.10)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from accuracy_gate import run_gate  # noqa: E402


def test_tiny_gate_passes_and_is_deterministic():
    report = run_gate(model="tiny-test", n_prompts=3, prompt_len=16,
                      gen_tokens=12, seed=0)
    assert report["schema"] == "ferrum-tpu-accuracy-gate/v1"
    assert report["self_determinism"] == 1.0
    assert report["divergence"] <= 0.10
    assert report["pass"] is True
    assert len(report["divergence_per_prompt"]) == 3
    # int4 is a quantization of the SAME weights: the gate measures
    # quantization error only, so the tiny model must stay well under
    # the product limit.
    assert report["first_divergence_frac"] > 0.5
