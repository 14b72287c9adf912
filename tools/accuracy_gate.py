#!/usr/bin/env python
"""INT4 accuracy gate: greedy divergence vs the bf16 oracle + self-
determinism, on an architecture-true random model (VERDICT r3 #7).

Reference discipline:
  * `crates/ferrum-cli/tests/quant_kl.rs:1-17` — INT4 greedy token
    divergence vs the fp baseline must stay < 0.10;
  * `scripts/lm_eval_light.sh:1-27` — lm_eval vs a committed baseline
    (needs real weights; runbook stays in docs until a checkpoint is
    available in this environment).

What runs HERE (works offline, CPU or chip): one set of float weights
is the ground truth; the int4 engine runs a QUANTIZATION OF THOSE SAME
WEIGHTS, so token differences measure quantization error and nothing
else. Greedy decode, fixed seeds:

  divergence      = mean over prompts of (fraction of generated
                    positions where int4 != bf16)
  first_div_frac  = mean normalized position of the first mismatch
                    (1.0 = never diverged)
  self_determinism= int4 run 2 == int4 run 1, exactly (must be 1.0)

Writes the gate artifact JSON (gates/accuracy/<model>-int4.json).

Usage:
  python tools/accuracy_gate.py --model qwen3-4b --prompts 12 \
      --prompt-len 64 --gen-tokens 64 --out gates/accuracy/qwen3-4b-int4.json
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


def run_gate(model: str = "qwen3-4b", n_prompts: int = 12,
             prompt_len: int = 64, gen_tokens: int = 64,
             seed: int = 0, max_num_seqs: int = 4,
             divergence_limit: float = 0.10) -> dict:
    import jax.numpy as jnp
    import numpy as np

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
    _say("oracle pass done")

    # Quantize THE SAME weights to int4 (group 128, GPTQ-convention).
    params_q = quantize_model_params(params_f, dtype=fdtype)
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
    self_det = float(np.mean([a == b for a, b in zip(q1, q2)]))

    report = {
        "schema": "ferrum-tpu-accuracy-gate/v1",
        "model": model,
        "quant": "gptq_int4_g128",
        "oracle_dtype": fname,
        "backend": jax.default_backend(),
        "seed": seed,
        "n_prompts": n_prompts,
        "prompt_len": prompt_len,
        "gen_tokens": gen_tokens,
        "divergence": float(np.mean(divs)),
        "divergence_per_prompt": [round(d, 4) for d in divs],
        "first_divergence_frac": float(np.mean(firsts)),
        "self_determinism": self_det,
        "limits": {"divergence": divergence_limit,
                   "self_determinism": 1.0},
        "pass": bool(np.mean(divs) < divergence_limit
                     and self_det == 1.0),
        "wall_s": round(time.time() - t0, 1),
    }
    return report


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="qwen3-4b")
    ap.add_argument("--prompts", type=int, default=12)
    ap.add_argument("--prompt-len", type=int, default=64)
    ap.add_argument("--gen-tokens", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--divergence-limit", type=float, default=0.10)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    report = run_gate(model=args.model, n_prompts=args.prompts,
                      prompt_len=args.prompt_len,
                      gen_tokens=args.gen_tokens, seed=args.seed,
                      divergence_limit=args.divergence_limit)
    print(json.dumps(report, indent=2))
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
    return 0 if report["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
