#!/usr/bin/env python
"""Driver benchmark: full-engine serving throughput on the real chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tok/s", "vs_baseline": N}

North star (BASELINE.md): reference cuda gate output tok/s at c=32,
random 256/128. Current flagship lane: dense Llama/Qwen3-class model,
INT4 weights, full continuous-batching engine on one TPU v5e chip.
Baseline for this lane: cuda-llama-dense c=32 = 745.6 tok/s
(Meta-Llama-3.1-8B-GPTQ-INT4 on RTX 4090, BASELINE.md).

Model weights are random (architecture-true); decode throughput is
weight-value independent. Size is selected to fit the chip's HBM
honestly (weights resident + KV pool), scaling down only if the chip
reports less memory.

Cold-path discipline (round-3 failure: the driver ran this from an
EMPTY XLA cache and timed out before any cell finished — BENCH_r03
rc=124). Measured r4: the persistent XLA compilation cache does NOT
work across processes on the remote-compile axon stack (a second
process recompiles despite an identical-key cache entry on disk), so
the ONLY lever is compiling few enough programs to fit the budget:
  * The warm surface is trimmed to what this workload can dispatch:
    prefill_chunk_size == input_len (one mixed-window p_rows variant),
    bucket 2 dropped, and FERRUM_BENCH_* knobs for tighter trims.
  * The HEADLINE c=32 cell runs FIRST and its JSON line is printed the
    moment it completes; the rest of the ladder is best-effort inside
    FERRUM_BENCH_BUDGET_S (default 1200 s) and never blocks the line.
  * bench_report.json is (re)written after EVERY cell, so even a
    killed run leaves a valid partial report.
  * Progress timestamps go to stderr (`# t=...`) so a timed-out driver
    log still shows where the time went.
"""

import json
import os
import sys
import time

BASELINE_C32 = 745.6      # cuda-llama-dense gate, c=32 (BASELINE.md)
BASELINE_MOE_C32 = 706.0  # cuda-full Qwen3-30B-A3B gate, c=32
                          # (docs/release/g0/0.7.7/cuda-full/summary.json)

REPO = os.path.dirname(os.path.abspath(__file__))


def _cache_dir() -> str:
    # Same-process reuse only (cross-process cache loads do not work
    # over remote compile — see module docstring); kept for the repeat
    # case and for any future stack where loads do work.
    d = (os.environ.get("FERRUM_XLA_CACHE")
         or os.path.expanduser("~/.cache/ferrum-tpu/xla-cache"))
    os.makedirs(d, exist_ok=True)
    return d


def main() -> None:
    import jax

    # Persistent compilation cache: repeat bench runs skip the multi-
    # minute (remote) compiles entirely. Repo-local so it survives to
    # the driver's end-of-round run (see module docstring).
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir())
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from ferrum_tpu.config import EngineConfig
    from ferrum_tpu.engine.builder import EngineBuilder
    from ferrum_tpu.bench.bench_engine import ScalarStats, run_cell, env_hash
    from ferrum_tpu.models.configs import preset
    from ferrum_tpu.models.llama_family import init_random_params
    from ferrum_tpu.models.quantize import (
        init_random_quant_params, quantize_model_params,
    )

    t0 = time.time()
    budget_s = float(os.environ.get("FERRUM_BENCH_BUDGET_S", "1200"))
    model_name = os.environ.get("FERRUM_BENCH_MODEL", "llama-3.1-8b")
    quant = os.environ.get("FERRUM_BENCH_QUANT", "int4")
    c_list = tuple(int(x) for x in os.environ.get(
        "FERRUM_BENCH_CONCURRENCY", "1,4,16,32").split(","))
    n_req = int(os.environ.get("FERRUM_BENCH_REQUESTS", "64"))
    n_rep = int(os.environ.get("FERRUM_BENCH_REPEATS", "2"))
    # Long-context / workload-shape overrides (VERDICT r2 weak #9: the
    # 4k cell runs 2048/128 at c=8 with int8 KV so the pool fits HBM).
    max_len = int(os.environ.get("FERRUM_BENCH_MAXLEN", "1024"))
    in_len = int(os.environ.get("FERRUM_BENCH_INPUT", "256"))
    out_len = int(os.environ.get("FERRUM_BENCH_OUTPUT", "128"))
    n_seqs = int(os.environ.get("FERRUM_BENCH_SEQS", "32"))
    out_override = os.environ.get("FERRUM_BENCH_REPORT", "")

    model_cfg = preset(model_name)
    # resolve() applies the governed FERRUM_* env registry on top of the
    # bench defaults (e.g. FERRUM_DECODE_MULTI_STEP sweeps).
    cfg = EngineConfig.resolve(
        model="bench", max_num_seqs=n_seqs, max_num_batched_tokens=2048,
        max_model_len=max_len,
        # Chunk == input_len: every chunk the workload produces is
        # exactly in_len tokens, so the mixed-window warmer compiles ONE
        # p_rows variant per (bucket, T) instead of two (cold-path
        # compile budget; see module docstring).
        prefill_chunk_size=max(16, min(in_len, 512)),
        kv_block_size=32,
        kv_layout="linear",   # slot-contiguous serving fast path
        # Minimal bucket ladder {1, 8, top}: every bucket × T × p_rows
        # variant is a multi-minute remote compile, and the driver's
        # cold run must compile everything it dispatches (cross-process
        # cache loads don't work — module docstring). 1 serves the c=1
        # cell, 8 the c=4 cell + drain tails, top the headline.
        decode_bucket_spec="1,8",
        # One window length: the adaptive doubled/halved variants cost
        # 2 more compiles per bucket than they return in a 128-token
        # closed-loop cell.
        adaptive_windows=False,
        # Random-prompt cells can't hit the prefix store; its extent +
        # per-iteration flush only cost HBM headroom here (observed
        # RESOURCE_EXHAUSTED at this 8B/32-slot config). Reuse evidence:
        # tools/bench_prefix_ttft.py. FERRUM_PREFIX_CACHE_BLOCKS
        # overrides.
        prefix_cache_blocks=0,
        # T=8 windows at c>=8: the fixed per-dispatch cost (~16-19 ms
        # over the tunnel) dominates short windows — T=8 is +13% at
        # c=32 vs T=4 (NOTES_ROUND3), and T=16 measured ~6% WORSE at
        # c=32 (970 vs 1037 — gates/perf r5: per-step device time is
        # T-independent, admission/drain dynamics favor shorter
        # windows). Bucket 1 runs T=32 (decode_t_spec): c=1 is
        # device-bound at 10.3 ms/step, so long windows amortize the
        # dispatch tax to ~0.5 ms/tok (TPOT 11.7 -> 10.4 ms, r5b).
        # Same compiled-program count as flat T=8 (one T per bucket).
        decode_multi_step=8,
        decode_t_spec="1:32",
        # MXU-assisted unpack decode kernels (w4a8_gd default "mxu"):
        # +10.5% c=32 vs the per-group-f32 path (chip_session A/B).
        dtype="bf16", kv_dtype="bf16", seed=0)

    label = f"{model_name}-random"
    if quant == "int4":
        # Direct packed-int4 random init: throughput is weight-value
        # independent and this avoids minutes of float RNG on 8B values.
        # FERRUM_BENCH_SQUEEZE=1: int8 embeddings + int4 untied lm_head
        # (docs/fit_30b_v5e.md "maximum squeeze" — the single-chip
        # true-30B demonstration posture; pair with FERRUM_KV_DTYPE=int8
        # and a small c<=16 workload).
        squeeze = os.environ.get("FERRUM_BENCH_SQUEEZE", "0") == "1"
        params = init_random_quant_params(model_cfg, seed=0,
                                          squeeze_embeddings=squeeze)
        label += "-int4g128" + ("-squeeze" if squeeze else "")
    else:
        params = init_random_params(model_cfg, seed=0, dtype=jnp.bfloat16)

    engine = (EngineBuilder(cfg)
              .with_model(model_cfg, params)
              .build())

    moe = model_cfg.moe is not None
    baseline = BASELINE_MOE_C32 if moe else BASELINE_C32
    out_json = out_override or (
        "bench_report_moe.json" if moe else "bench_report.json")

    report = {
        "schema": "ferrum-tpu-bench/v1",
        "model": label,
        "workload": {"input_len": in_len, "output_len": out_len,
                     "mode": "closed-loop"},
        "env_hash": env_hash({"model": label}),
        "cells": [],
    }

    def flush_report():
        report["total_bench_s"] = time.time() - t0
        with open(out_json, "w") as f:
            json.dump(report, f, indent=2)

    def left() -> float:
        return budget_s - (time.time() - t0)

    def measure(c: int, reps: int) -> dict:
        n = min(n_req, max(2 * c, 8)) if c < max(c_list) else n_req
        runs = []
        for rep in range(max(1, reps)):
            runs.append(run_cell(
                engine, concurrency=c, num_requests=n,
                input_len=in_len, output_len=out_len,
                seed=rep, warmup=2 if rep == 0 else 0))
            # Repeats past the first only while budget remains.
            if left() < 120:
                break
        cell = dict(runs[-1])
        if len(runs) > 1:
            for k in ("output_tok_s", "ttft_p50_ms", "ttft_p95_ms",
                      "tpot_p50_ms", "itl_p95_ms", "e2e_p50_ms"):
                st = ScalarStats.of([r[k] for r in runs])
                cell[k] = st.mean
                cell[k + "_stats"] = {
                    "mean": st.mean, "stddev": st.stddev,
                    "ci95_hw": st.ci95_hw, "n": len(runs)}
        return cell

    def note(msg: str) -> None:
        print(f"# t={time.time() - t0:7.1f}s {msg} "
              f"(compiles={engine.runner.compilations})",
              file=sys.stderr, flush=True)

    line_out = None
    try:
        note("engine built")
        # --- headline cell FIRST: its warmup covers every smaller
        # bucket (warm_decode_buckets cascades downward), and the JSON
        # line prints the moment it lands.
        c_head = max(c_list)
        head = measure(c_head, n_rep)
        note(f"headline c={c_head} done: "
             f"{head['output_tok_s']:.1f} tok/s")
        report["cells"].append(head)
        flush_report()
        value = round(head["output_tok_s"], 1)
        line_out = json.dumps({
            "metric": (f"output_tok_s_c{c_head}_{label}"
                       f"_{in_len}x{out_len}"),
            "value": value,
            "unit": "tok/s",
            "vs_baseline": round(value / baseline, 3),
        })
        print(line_out, flush=True)

        # --- rest of the ladder, best-effort inside the budget.
        for c in sorted(set(c_list) - {c_head}):
            if left() < 150:
                print(f"# budget: skipping c={c} "
                      f"({left():.0f}s left)", file=sys.stderr)
                continue
            report["cells"].append(measure(c, 1))
            note(f"cell c={c} done")
            flush_report()
        report["cells"].sort(key=lambda x: x["concurrency"])
        flush_report()

        # --- optional long-context cell (VERDICT r3 #5: >=2048-ctx with
        # int8 KV in the committed ladder). Same process (the chip claim
        # and backend init are paid), fresh engine: 2048/128 at c=8, KV
        # pool in int8 so 8 slots x 4096 tokens fit beside the weights.
        _run_longctx = (os.environ.get("FERRUM_BENCH_LONGCTX", "0")
                        == "1" and left() > 420)
        if _run_longctx:
          try:
            engine.stop()
            # Release the ladder engine's device state (KV pool ~4.3
            # GiB + slot arrays) BEFORE the long-ctx pool allocates:
            # weights + two KV pools OOM the chip (observed).
            engine.runner.kv = None
            engine.runner.prefix_store = None
            import gc
            gc.collect()
            note("building long-ctx engine (2048/128, int8 KV)")
            cfg2 = EngineConfig.resolve(
                model="bench-longctx", max_num_seqs=8,
                max_num_batched_tokens=2048, max_model_len=4096,
                prefill_chunk_size=512, kv_block_size=32,
                kv_layout="linear", decode_bucket_spec="8",
                adaptive_windows=False, prefix_cache_blocks=0,
                decode_multi_step=8, dtype="bf16", kv_dtype="int8",
                seed=0)
            eng2 = EngineBuilder(cfg2).with_model(model_cfg, params).build()
            try:
                cell = run_cell(eng2, concurrency=8, num_requests=16,
                                input_len=2048, output_len=128, seed=0,
                                warmup=1)
                cell["workload"] = {"input_len": 2048, "output_len": 128,
                                    "kv_dtype": "int8"}
                report["cells"].append(cell)
                note(f"long-ctx cell done: {cell['output_tok_s']:.1f} tok/s")
                flush_report()
            finally:
                eng2.stop()
          except Exception as e:  # best-effort: the ladder + line landed
            print(f"# long-ctx cell failed: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
    finally:
        engine.stop()
        if line_out is None:
            # Headline cell never landed: say so in-band rather than
            # leaving the driver a null.
            print(json.dumps({
                "metric": f"bench_incomplete_{label}", "value": 0.0,
                "unit": "tok/s", "vs_baseline": 0.0}), flush=True)


if __name__ == "__main__":
    main()
