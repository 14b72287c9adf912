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

import json
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


def teacher_forced_logits(params, cfg, tokens: Sequence[int]):
    """Full-sequence causal logits [N, vocab] f32 for one token list.

    Pure-jnp reference forward (no KV cache, no engine): the oracle for
    offline quantization-error metrics. Supports GQA, sliding windows,
    and logit softcaps; refuses hybrid GDN configs (the gate targets
    the dense/MoE int4 path).
    """
    import jax
    import jax.numpy as jnp

    from ..models.llama_family import (
        forward_hidden, logits_from_hidden, make_rope_tables)

    if any(t == "linear_attention" for t in (cfg.layer_types or ())):
        raise NotImplementedError("teacher_forced_logits: dense/MoE only")

    toks = jnp.asarray(list(tokens), dtype=jnp.int32)
    n = toks.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    inv_g, inv_l = make_rope_tables(cfg)

    def attn(li, q, k, v):
        g = cfg.num_heads // cfg.num_kv_heads
        kf = jnp.repeat(k, g, axis=1).astype(jnp.float32)   # [N, Hq, D]
        vf = jnp.repeat(v, g, axis=1).astype(jnp.float32)
        s = jnp.einsum("qhd,khd->hqk", q.astype(jnp.float32), kf)
        s = s * cfg.attn_scale
        if cfg.attn_logit_softcap:
            s = cfg.attn_logit_softcap * jnp.tanh(s / cfg.attn_logit_softcap)
        mask = pos[None, :] <= pos[:, None]
        sw = cfg.layer_sliding_window(li)
        if sw is not None:
            mask = mask & (pos[None, :] > pos[:, None] - sw)
        s = jnp.where(mask[None, :, :], s, -1e30)
        w = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("hqk,khd->qhd", w, vf).astype(q.dtype)

    h = forward_hidden(params, cfg, toks, pos, attn,
                       inv_freq_global=inv_g, inv_freq_local=inv_l)
    return logits_from_hidden(params, cfg, h).astype(jnp.float32)


def quant_logit_metrics(logits_f, logits_q) -> Dict:
    """Tie-robust quantization-error metrics between float-oracle and
    quantized logits over the same teacher-forced positions [N, vocab].

    Greedy token divergence is structurally unpassable on random-init
    weights (near-uniform logits => near-tied argmax flips under any
    perturbation — VERDICT r4); these metrics measure the perturbation
    itself, which is what quantization quality is:

      kl_mean / kl_p95    per-position KL(p_float || p_int4), nats —
                          the reference test is literally named quant_kl
                          (crates/ferrum-cli/tests/quant_kl.rs)
      rel_err_mean / max  ||l_q - l_f||_2 / ||l_f - mean(l_f)||_2 per
                          position (shift-invariant relative logit error)
      top1_agree          raw greedy agreement (reported, tie-sensitive)
      margin_*            oracle top1-top2 logit gap stats: shows whether
                          disagreements happen at ties (margin ~ noise)
                          or at real preferences
      agree_at_margin     agreement restricted to positions whose oracle
                          margin exceeds 2x the median top1 perturbation
                          |l_q - l_f| — flips there are real errors, not
                          tie noise
    """
    import numpy as np

    lf = np.asarray(logits_f, dtype=np.float64)
    lq = np.asarray(logits_q, dtype=np.float64)

    def _logsoftmax(x):
        m = x.max(axis=-1, keepdims=True)
        z = x - m
        return z - np.log(np.exp(z).sum(axis=-1, keepdims=True))

    lsf, lsq = _logsoftmax(lf), _logsoftmax(lq)
    pf = np.exp(lsf)
    kl = (pf * (lsf - lsq)).sum(axis=-1)                   # [N]

    cf = lf - lf.mean(axis=-1, keepdims=True)
    d = lq - lf
    d = d - d.mean(axis=-1, keepdims=True)
    rel = np.linalg.norm(d, axis=-1) / np.maximum(
        np.linalg.norm(cf, axis=-1), 1e-9)

    top1f = lf.argmax(axis=-1)
    top1q = lq.argmax(axis=-1)
    agree = top1f == top1q
    part = np.partition(lf, -2, axis=-1)
    margin = part[:, -1] - part[:, -2]                     # oracle gap
    # Perturbation scale at the decision: |delta logit| of the oracle's
    # top-1 candidate (shift-corrected).
    pert = np.abs(d[np.arange(d.shape[0]), top1f])
    thresh = 2.0 * float(np.median(pert))
    big = margin > thresh
    # When quantization noise exceeds (nearly) every oracle margin, the
    # restricted metric carries no information — on a deep random-init
    # model the oracle simply has no confident decisions (near-uniform
    # logits). Report it as vacuous (None) instead of a number; the
    # gate then rides KL + weight-space error, which a broken path
    # still fails by an order of magnitude.
    vacuous = float(big.mean()) < 0.05
    agree_at_margin = None if vacuous else float(agree[big].mean())

    return {
        "positions": int(lf.shape[0]),
        "kl_mean": float(kl.mean()),
        "kl_p95": float(np.percentile(kl, 95)),
        "rel_err_mean": float(rel.mean()),
        "rel_err_max": float(rel.max()),
        "top1_agree": float(agree.mean()),
        "margin_median": float(np.median(margin)),
        "margin_p10": float(np.percentile(margin, 10)),
        "top1_pert_median": float(np.median(pert)),
        "margin_threshold": thresh,
        "frac_above_margin": float(big.mean()),
        "margin_vacuous": bool(vacuous),
        "agree_at_margin": agree_at_margin,
    }


def weight_quant_error(params_f, params_q) -> Dict:
    """Weight-space relative error of each dequantized int4 tensor vs
    its float source: ||dequant(Q(W)) - W||_2 / ||W||_2 per projection.

    The theory-backed "int4 path isn't broken" detector: int4 group-128
    quantization of gaussian weights has relative error
    ~= step/sqrt(12)/sigma ~= 0.10 (step = range(128 samples)/15 ~=
    0.36 sigma). A packing/scale/zero-point bug shows up as >= 3x that;
    the gate limit is 0.15. Unlike end-to-end logit error this does not
    compound with depth, so the limit holds at any model size.
    """
    import numpy as np

    from ..ops.linear import DenseLinearParams
    from ..ops.quant import QuantLinearParams, dequantize

    errs = {}
    for li, (lf, lq) in enumerate(zip(params_f.layers, params_q.layers)):
        for name in ("q", "k", "v", "o", "gate", "up", "down"):
            pf, pq = getattr(lf, name), getattr(lq, name)
            if not (isinstance(pf, DenseLinearParams)
                    and isinstance(pq, QuantLinearParams)):
                continue
            w = np.asarray(pf.w, dtype=np.float64)
            wq = np.asarray(dequantize(pq), dtype=np.float64)
            errs[f"layers[{li}].{name}"] = float(
                np.linalg.norm(wq - w) / max(np.linalg.norm(w), 1e-12))
    vals = np.array(list(errs.values()))
    return {
        "tensors": len(errs),
        "rel_err_mean": float(vals.mean()) if len(vals) else 0.0,
        "rel_err_max": float(vals.max()) if len(vals) else 0.0,
        "worst_tensor": (max(errs, key=errs.get) if errs else None),
    }


def completions_logprobs(base_url: str, prompt: str,
                         model: str = "ferrum",
                         timeout: float = 300.0) -> Dict:
    """POST /v1/completions with echo+logprobs+max_tokens=0 (the
    lm_eval local-completions loglikelihood contract) and return the
    OpenAI logprobs object ({tokens, token_logprobs, top_logprobs,
    text_offset}). Pure-stdlib client so the gate runs anywhere."""
    import urllib.request

    body = json.dumps({"model": model, "prompt": prompt,
                       "max_tokens": 0, "echo": True,
                       "logprobs": 1}).encode()
    req = urllib.request.Request(
        base_url.rstrip("/") + "/v1/completions", data=body,
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        out = json.loads(resp.read())
    return out["choices"][0]["logprobs"]


def loglikelihood(base_url: str, context: str, continuation: str,
                  model: str = "ferrum") -> Dict:
    """Sum of continuation-token logprobs given the context, plus the
    is_greedy flag — exactly what loglikelihood tasks (mmlu/arc) score.
    Continuation tokens are located by text offset (robust to the
    context/continuation boundary splitting a token: a boundary-
    straddling token counts toward the continuation, matching lm_eval's
    tokenizer-side behavior closely enough for gating)."""
    lp = completions_logprobs(base_url, context + continuation, model)
    cut = len(context)
    ll = 0.0
    greedy = True
    for off, tok_lp, top in zip(lp["text_offset"],
                                lp["token_logprobs"],
                                lp["top_logprobs"]):
        if off < cut or tok_lp is None:
            continue
        ll += tok_lp
        if top:
            best = max(top.values())
            greedy = greedy and tok_lp >= best - 1e-6
    return {"loglikelihood": ll, "is_greedy": greedy}


def perplexity(base_url: str, texts: Sequence[str],
               model: str = "ferrum") -> Dict:
    """Corpus perplexity over the scored positions — the BASELINE.md
    'within 0.1 perplexity of the reference INT4 path' gate. Returns
    {perplexity, tokens, total_logprob}."""
    import math

    total_lp = 0.0
    n = 0
    for t in texts:
        lp = completions_logprobs(base_url, t, model)
        for tok_lp in lp["token_logprobs"]:
            if tok_lp is not None:
                total_lp += tok_lp
                n += 1
    return {"perplexity": math.exp(-total_lp / max(n, 1)),
            "tokens": n, "total_logprob": total_lp}


def compare_to_baseline(results: Dict[str, float],
                        baseline: Dict[str, float],
                        rtol: float = 0.05) -> Dict:
    """Per-metric rtol comparison vs a committed baseline file (the
    docs/accuracy_runbook.md format). Missing baseline metrics are
    recorded, not failed."""
    report = {"rtol": rtol, "metrics": {}, "passed": True}
    for k, v in results.items():
        base = baseline.get(k)
        entry = {"value": v, "baseline": base}
        if base is not None:
            ok = abs(v - base) <= rtol * abs(base)
            entry["passed"] = ok
            report["passed"] = report["passed"] and ok
        report["metrics"][k] = entry
    return report


# Primary result metric per lm_eval task (lm_eval_light.sh ladder).
_TASK_METRIC = {"mmlu": "acc,none", "arc_easy": "acc,none",
                "gsm8k": "exact_match,strict-match"}


def lm_eval_light(base_url: str, tasks: Optional[Dict[str, int]] = None,
                  rtol: float = 0.05,
                  baseline: Optional[Dict[str, float]] = None,
                  model: str = "ferrum",
                  tokenizer: Optional[str] = None,
                  num_concurrent: int = 4) -> Dict:
    """lm-evaluation-harness subsets against a /v1/completions endpoint
    (mmlu 100q 5-shot, arc_easy 100q, gsm8k 50q — the reference's
    scripts/lm_eval_light.sh ladder), via lm_eval's local-completions
    model wired to `base_url`. Loglikelihood tasks ride the
    echo+logprobs scoring path this server implements.

    Requires the `lm_eval` package and dataset access; in offline/CI
    environments this returns a skipped report rather than failing
    (the request/scoring path itself is covered hardware-free by
    tests/test_logprobs_server.py). See docs/accuracy_runbook.md for
    the run recipe + baseline file format."""
    tasks = tasks or {"mmlu": 100, "arc_easy": 100, "gsm8k": 50}
    try:
        import lm_eval
    except ImportError:
        return {"skipped": "lm_eval not installed (offline environment)",
                "tasks": tasks}

    model_args = (
        f"base_url={base_url.rstrip('/')}/v1/completions,"
        f"model={model},num_concurrent={num_concurrent},max_retries=2")
    if tokenizer:
        model_args += f",tokenizer={tokenizer},tokenizer_backend=huggingface"

    results: Dict[str, float] = {}
    raw = {}
    for task, limit in tasks.items():
        out = lm_eval.simple_evaluate(
            model="local-completions", model_args=model_args,
            tasks=[task], limit=limit,
            num_fewshot=5 if task == "mmlu" else None)
        raw[task] = out["results"]
        metric = _TASK_METRIC.get(task, "acc,none")
        # mmlu aggregates subtasks; take the task's own row when
        # present, else the mean of its subtask rows.
        row = out["results"].get(task)
        if row is not None and metric in row:
            results[task] = float(row[metric])
        else:
            vals = [float(r[metric]) for r in out["results"].values()
                    if metric in r]
            results[task] = sum(vals) / max(len(vals), 1)

    report = {"tasks": tasks, "results": results}
    if baseline:
        report["gate"] = compare_to_baseline(results, baseline, rtol)
    return report
