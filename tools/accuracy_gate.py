#!/usr/bin/env python
"""INT4 accuracy gate: quantization-error metrics vs the float oracle
plus greedy self-determinism, on an architecture-true model.

Reference discipline:
  * `crates/ferrum-cli/tests/quant_kl.rs:1-17` — INT4 greedy token
    divergence vs the fp baseline must stay < 0.10 — **on real paired
    HF checkpoints**; the reference auto-skips the bound otherwise.
  * `scripts/lm_eval_light.sh:1-27` — lm_eval vs a committed baseline
    (needs real weights; runbook in docs/accuracy_runbook.md).

What runs HERE (works offline, CPU or chip): one set of float weights
is the ground truth; the int4 engine runs a QUANTIZATION OF THOSE SAME
WEIGHTS, so every difference measures quantization error and nothing
else. Two evidence classes, scoped by --weights:

  random (default — what this environment can produce):
    Greedy token divergence is structurally unpassable on random-init
    weights: near-uniform logits mean near-tied argmax that flips under
    any perturbation, so the 0.10 bound would measure logit ties, not
    quantization quality (VERDICT r4). The gate therefore measures the
    perturbation itself:
      weight_rel_err_max  ||dequant(Q(W)) - W|| / ||W|| per tensor
                     <= 0.15 — theory-backed: int4 g128 on gaussian
                     weights is ~0.10; a pack/scale bug is >= 3x that;
                     depth-independent, so the limit holds at any size
      kl_mean        mean per-position KL(p_float || p_int4),
                     teacher-forced over the same tokens    <= 0.10
      self_det       int4 greedy run 2 == run 1, exactly    == 1.0
      agree_at_margin  top-1 agreement where the oracle margin
                     exceeds 2x the median top-1 perturbation >= 0.90
                     when applicable — on deep random models the
                     oracle has (almost) no confident margins, so the
                     metric reports null/vacuous and does not gate
    Raw divergence, relative logit error and oracle tie-margin stats
    are reported so the numbers are interpretable, but not gated
    (end-to-end logit error compounds with depth through a random-
    weight network — measured 0.019 at 2 layers vs ~0.5 at 28 — so a
    universal logit-error limit is not justifiable; the weight-space
    metric covers brokenness with a depth-independent bound). Limits
    are derived in docs/accuracy_runbook.md ("Random-weight limits").

  trained (real checkpoints):
    the reference's bound applies: divergence < 0.10 AND self_det 1.0,
    with the KL/rel-err metrics reported alongside.

Writes the gate artifact JSON (gates/accuracy/<model>-int4.json).

Usage:
  python tools/accuracy_gate.py --model qwen3-0.6b --prompts 4 \
      --prompt-len 64 --gen-tokens 32 \
      --out gates/accuracy/qwen3-0.6b-int4.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The image's sitecustomize force-registers the tunneled TPU backend and
# overrides JAX_PLATFORMS; honor an explicit cpu request (the chip is
# exclusive — grabbing it while a bench owns it hangs silently).
if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

RANDOM_LIMITS = {"kl_mean": 0.10, "weight_rel_err_max": 0.15,
                 "agree_at_margin": 0.90, "self_determinism": 1.0}
TRAINED_LIMITS = {"divergence": 0.10, "self_determinism": 1.0}


def _gen_all(engine, prompts, gen_tokens):
    from ferrum_tpu.types import InferenceRequest, SamplingParams
    outs = []
    for ids in prompts:
        r = engine.infer(InferenceRequest(
            prompt_token_ids=list(ids),
            sampling=SamplingParams(temperature=0.0,
                                    max_tokens=gen_tokens,
                                    ignore_eos=True)))
        outs.append(list(r.token_ids))
    return outs


def _build(cfg, model_cfg, params):
    from ferrum_tpu.engine.builder import EngineBuilder
    return EngineBuilder(cfg).with_model(model_cfg, params).build()


def run_gate(model: str = "qwen3-0.6b", n_prompts: int = 4,
             prompt_len: int = 64, gen_tokens: int = 32,
             seed: int = 0, max_num_seqs: int = 4,
             weights: str = "random") -> dict:
    import jax.numpy as jnp
    import numpy as np

    from ferrum_tpu.bench.accuracy import (
        quant_logit_metrics, teacher_forced_logits, weight_quant_error)
    from ferrum_tpu.config import EngineConfig
    from ferrum_tpu.models.configs import preset
    from ferrum_tpu.models.llama_family import init_random_params
    from ferrum_tpu.models.quantize import quantize_model_params

    t0 = time.time()
    model_cfg = preset(model)
    rng = np.random.default_rng(seed)
    prompts = [rng.integers(4, min(model_cfg.vocab_size, 50000) - 4,
                            size=prompt_len).tolist()
               for _ in range(n_prompts)]

    max_len = 1 << (prompt_len + gen_tokens + 16).bit_length()
    base_cfg = dict(
        model="accuracy-gate", max_num_seqs=max_num_seqs,
        max_num_batched_tokens=1024, max_model_len=max_len,
        prefill_chunk_size=min(512, max_len), kv_block_size=16,
        kv_layout="linear", prefix_cache_blocks=0, seed=seed)

    # Float ground truth (fp32 on CPU for a stable oracle; bf16 on TPU
    # — the serving dtype whose quantization delta the gate bounds).
    import jax
    on_tpu = jax.default_backend() not in ("cpu",)
    fdtype = jnp.bfloat16 if on_tpu else jnp.float32
    fname = "bf16" if on_tpu else "f32"
    params_f = init_random_params(model_cfg, seed=seed, dtype=fdtype)

    def _say(msg):
        print(f"[accuracy-gate +{time.time() - t0:7.1f}s] {msg}",
              file=sys.stderr, flush=True)

    _say(f"backend={jax.default_backend()} oracle={fname} model={model}")
    eng = _build(EngineConfig.resolve(dtype=fname, kv_dtype=fname,
                                      **base_cfg), model_cfg, params_f)
    _say("oracle engine built")
    try:
        ref_tokens = _gen_all(eng, prompts, gen_tokens)
    finally:
        eng.stop()
    _say("oracle generation done")

    # Quantize THE SAME weights to int4 (group 128, GPTQ-convention).
    params_q = quantize_model_params(params_f, dtype=fdtype)

    # Weight-space error: theory-backed brokenness detector (int4 g128
    # on gaussian weights ~= 0.10 relative; a pack/scale bug >= 3x it).
    weight_metrics = weight_quant_error(params_f, params_q)
    _say(f"weight-space rel err: mean={weight_metrics['rel_err_mean']:.4f} "
         f"max={weight_metrics['rel_err_max']:.4f}")

    # Teacher-forced logit comparison over prompt + oracle continuation
    # — the tie-robust core of the gate. Same positions, same tokens,
    # only the weights differ (float vs their own int4 quantization).
    tf_seqs = [list(p) + list(r) for p, r in zip(prompts, ref_tokens)]
    lf_all, lq_all = [], []
    for i, seq in enumerate(tf_seqs):
        lf_all.append(np.asarray(
            teacher_forced_logits(params_f, model_cfg, seq)[prompt_len - 1:-1]))
        lq_all.append(np.asarray(
            teacher_forced_logits(params_q, model_cfg, seq)[prompt_len - 1:-1]))
        _say(f"teacher-forced logits {i + 1}/{len(tf_seqs)}")
    logit_metrics = quant_logit_metrics(
        np.concatenate(lf_all), np.concatenate(lq_all))
    del lf_all, lq_all
    _say(f"logit metrics: kl_mean={logit_metrics['kl_mean']:.5f} "
         f"rel_err_mean={logit_metrics['rel_err_mean']:.4f} "
         f"agree_at_margin={logit_metrics['agree_at_margin']}")

    del params_f, eng
    eng = _build(EngineConfig.resolve(dtype=fname, kv_dtype=fname,
                                      quantization="gptq_int4",
                                      **base_cfg), model_cfg, params_q)
    _say("int4 engine built")
    try:
        q1 = _gen_all(eng, prompts, gen_tokens)
        _say("int4 pass 1 done")
        q2 = _gen_all(eng, prompts, gen_tokens)
        _say("int4 pass 2 done")
    finally:
        eng.stop()
        del params_q, eng

    divs, firsts = [], []
    for ref, q in zip(ref_tokens, q1):
        n = min(len(ref), len(q)) or 1
        mism = [i for i in range(n) if ref[i] != q[i]]
        divs.append(len(mism) / n)
        firsts.append((mism[0] / n) if mism else 1.0)
    divergence = float(np.mean(divs))
    self_det = float(np.mean([a == b for a, b in zip(q1, q2)]))

    if weights == "trained":
        limits = dict(TRAINED_LIMITS)
        passed = divergence < limits["divergence"] and self_det == 1.0
    else:
        limits = dict(RANDOM_LIMITS)
        aam = logit_metrics["agree_at_margin"]
        passed = (
            logit_metrics["kl_mean"] <= limits["kl_mean"]
            and weight_metrics["rel_err_max"] <= limits["weight_rel_err_max"]
            # Vacuous margin metric (deep random model: the oracle has
            # no confident decisions) does not gate; when it applies,
            # it must clear 0.90.
            and (aam is None or aam >= limits["agree_at_margin"])
            and self_det == 1.0)

    report = {
        "schema": "ferrum-tpu-accuracy-gate/v2",
        "model": model,
        "weights": weights,
        "quant": "gptq_int4_g128",
        "oracle_dtype": fname,
        "backend": jax.default_backend(),
        "seed": seed,
        "n_prompts": n_prompts,
        "prompt_len": prompt_len,
        "gen_tokens": gen_tokens,
        "logit_metrics": {k: (round(v, 6) if isinstance(v, float) else v)
                          for k, v in logit_metrics.items()},
        "weight_metrics": {k: (round(v, 6) if isinstance(v, float) else v)
                           for k, v in weight_metrics.items()},
        "divergence": divergence,
        "divergence_gated": weights == "trained",
        "divergence_per_prompt": [round(d, 4) for d in divs],
        "first_divergence_frac": float(np.mean(firsts)),
        "self_determinism": self_det,
        "limits": limits,
        "pass": bool(passed),
        "wall_s": round(time.time() - t0, 1),
    }
    return report


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="qwen3-0.6b")
    ap.add_argument("--prompts", type=int, default=4)
    ap.add_argument("--prompt-len", type=int, default=64)
    ap.add_argument("--gen-tokens", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--weights", choices=("random", "trained"),
                    default="random")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    report = run_gate(model=args.model, n_prompts=args.prompts,
                      prompt_len=args.prompt_len,
                      gen_tokens=args.gen_tokens, seed=args.seed,
                      weights=args.weights)
    print(json.dumps(report, indent=2))
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
    return 0 if report["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
