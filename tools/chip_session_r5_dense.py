#!/usr/bin/env python
"""Round-5 dense-lane chip session (VERDICT r4 #3 + #6), one process:

  P1  Engine at the production-candidate config (T=16, depth 2,
      buckets {1,8,32}, mxu kernels): full ladder c=32/16/4/1 via
      run_cell, plus depth=3 re-run of c=32 (no new compiles — depth
      is host-side).
  P2  Device-side decomposition: K chained windows (dispatch W+1
      before fetching W results, sync once at the end) at c=32 and
      c=1 — the engine-vs-device gap VERDICT #3c asks to itemize.
  P3  c=1 latency probe with T=32 windows (bucket-1-only engine;
      ~3 extra compiles): does doubling the window again push TPOT
      toward the ~7 ms weight-stream floor?

Writes gates/perf/<ts>-dense-r5.json after every phase (a killed run
leaves valid partial evidence). In-process budget guard; NEVER kill
this process externally (a killed chip client wedges the claim
~10-15 min — NOTES_ROUND4).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

T0 = time.time()
BUDGET_S = float(os.environ.get("FERRUM_CHIP_BUDGET_S", "2700"))


def left() -> float:
    return BUDGET_S - (time.time() - T0)


def say(msg: str) -> None:
    print(f"# t={time.time() - T0:7.1f}s {msg}", file=sys.stderr, flush=True)


def main() -> None:
    import jax

    cache_dir = os.path.expanduser("~/.cache/ferrum-tpu/xla-cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import numpy as np

    from ferrum_tpu.bench.bench_engine import env_hash, run_cell
    from ferrum_tpu.config import EngineConfig
    from ferrum_tpu.engine.builder import EngineBuilder
    from ferrum_tpu.models.configs import preset
    from ferrum_tpu.models.quantize import init_random_quant_params

    ts = time.strftime("%Y%m%d-%H%M%S")
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "gates", "perf", f"{ts}-dense-r5.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    report = {
        "schema": "ferrum-tpu-perf-session/v1",
        "session": "r5-dense-T16",
        "model": "llama-3.1-8b-random-int4g128",
        "env_hash": env_hash({"session": "r5-dense"}),
        "cells": [],
        "decomposition": {},
        "notes": [],
    }

    def flush():
        report["total_s"] = round(time.time() - T0, 1)
        with open(out_path, "w") as f:
            json.dump(report, f, indent=2)

    model_name = os.environ.get("FERRUM_SESSION_MODEL", "llama-3.1-8b")
    nscale = float(os.environ.get("FERRUM_SESSION_NSCALE", "1"))
    report["model"] = f"{model_name}-random-int4g128"
    model_cfg = preset(model_name)
    params = init_random_quant_params(model_cfg, seed=0)
    say("params ready")

    def build(t_steps: int, bucket_spec: str, depth: int = 2):
        cfg = EngineConfig.resolve(
            model=f"r5-T{t_steps}", max_num_seqs=32,
            max_num_batched_tokens=2048, max_model_len=1024,
            prefill_chunk_size=256, kv_block_size=32,
            kv_layout="linear", prefix_cache_blocks=0,
            decode_bucket_spec=bucket_spec, adaptive_windows=False,
            decode_multi_step=t_steps, pipeline_depth=depth,
            dtype="bf16", kv_dtype="bf16", seed=0)
        return EngineBuilder(cfg).with_model(model_cfg, params).build()

    def cell(engine, c, n, tag, reps=1):
        n = max(c, int(n * nscale))
        runs = []
        for rep in range(reps):
            runs.append(run_cell(engine, concurrency=c, num_requests=n,
                                 input_len=256, output_len=128, seed=rep,
                                 warmup=2 if rep == 0 else 0))
            if left() < 240:
                break
        r = dict(runs[-1])
        if len(runs) > 1:
            r["output_tok_s"] = float(np.mean(
                [x["output_tok_s"] for x in runs]))
            r["reps"] = [round(x["output_tok_s"], 1) for x in runs]
        r["tag"] = tag
        report["cells"].append(r)
        say(f"{tag}: {r['output_tok_s']:.1f} tok/s "
            f"ttft_p50={r['ttft_p50_ms']:.0f}ms "
            f"tpot_p50={r['tpot_p50_ms']:.2f}ms "
            f"compiles={r['compilations_during_cell']}")
        flush()
        return r

    # ---------------- P1: T=16 ladder --------------------------------
    eng = build(16, "1,8", depth=2)
    say(f"engine T=16 built (compiles={eng.runner.compilations})")
    try:
        cell(eng, 32, 64, "T16-d2-c32", reps=2)
        if left() > 500:
            cell(eng, 16, 32, "T16-d2-c16")
        if left() > 450:
            cell(eng, 4, 16, "T16-d2-c4")
        if left() > 400:
            cell(eng, 1, 8, "T16-d2-c1")

        # depth=3 at c=32: host-side only, no new compiles.
        if left() > 350:
            eng.cfg.pipeline_depth = 3
            cell(eng, 32, 64, "T16-d3-c32")
            eng.cfg.pipeline_depth = 2
    finally:
        # Stop the background loop BEFORE poking scheduler/runner
        # directly (the decomposition below must not race the loop);
        # the runner and its compiled programs stay live.
        eng.stop()

    # ------------- P2: device-side decomposition ---------------------
    # K windows chained on device (each dispatched with prev=last, sync
    # once at the end). Engine-level cells above vs this = the
    # host/dispatch tax itemized (VERDICT r4 #3c).
    from ferrum_tpu.scheduler.sequence import Sequence
    from ferrum_tpu.types import InferenceRequest, SamplingParams

    def device_chain(n_lanes: int, t_steps: int, k_windows: int):
        sched = eng.scheduler
        runner = eng.runner
        rng = np.random.default_rng(0)
        for i in range(n_lanes):
            req = InferenceRequest(
                prompt_token_ids=rng.integers(10, 1000, 256).tolist(),
                sampling=SamplingParams(max_tokens=512, temperature=0.0,
                                        ignore_eos=True))
            sched.submit(Sequence(req, req.prompt_token_ids))
        for _ in range(64):
            batch = sched.next_batch()
            for s in batch.admitted:
                runner.admit_slot(s)
            for ch in batch.prefill_chunks:
                runner.run_prefill(ch)
                sched.note_prefill_done(ch)
            if not sched.waiting and all(
                    s.phase.value == "decoding" for s in sched.running):
                break
        live = list(sched.running)[:n_lanes]
        # warm one window (program already compiled by the cells)
        w = runner.start_decode_window(live, t_steps)
        runner.sync_window(w)
        t1 = time.time()
        for _ in range(k_windows):
            w = runner.start_decode_window(live, t_steps, prev=w)
        runner.sync_window(w)
        dt = time.time() - t1
        per_win = dt / k_windows
        toks = len(live) * t_steps * k_windows
        for s in live:
            sched.finish(s)
        return {
            "lanes": len(live), "t_steps": t_steps,
            "k_windows": k_windows,
            "ms_per_window": round(per_win * 1e3, 2),
            "ms_per_step": round(per_win / t_steps * 1e3, 3),
            "device_tok_s": round(toks / dt, 1),
        }

    if left() > 300:
        try:
            d32 = device_chain(32, 16, 8)
            report["decomposition"]["c32_T16"] = d32
            e32 = next((c for c in report["cells"]
                        if c["tag"] == "T16-d2-c32"), None)
            if e32:
                report["decomposition"]["engine_vs_device_c32"] = round(
                    e32["output_tok_s"] / d32["device_tok_s"], 3)
            say(f"device chain c=32: {d32['device_tok_s']} tok/s "
                f"({d32['ms_per_step']} ms/step)")
            flush()
        except Exception as e:
            report["notes"].append(
                f"device_chain c32 failed: {type(e).__name__}: {e}")
            flush()

    eng.runner.kv = None
    eng.runner.prefix_store = None
    import gc
    gc.collect()

    # ---------------- P3: T=32 c=1 probe -----------------------------
    if left() > 420:
        try:
            eng2 = build(32, "1", depth=2)
            say(f"engine T=32/bucket-1 built")
            try:
                cell(eng2, 1, 8, "T32-d2-c1")
            finally:
                eng2.stop()
        except Exception as e:
            report["notes"].append(
                f"P3 failed: {type(e).__name__}: {e}")
            flush()
    else:
        report["notes"].append(f"P3 skipped (budget, {left():.0f}s left)")

    flush()
    say(f"done -> {out_path}")
    print(json.dumps({"out": out_path,
                      "cells": [(c["tag"], round(c["output_tok_s"], 1))
                                for c in report["cells"]]}))


if __name__ == "__main__":
    main()
