#!/usr/bin/env python
"""Round-5 chip session B: validate the batched window-accept host fix
(engine._accept_seq_window) + per-bucket T spec against session A's
numbers (gates/perf/*-dense-r5.json: engine 970 tok/s = 48% of the
2019 tok/s device-side at c=32/T=16; c=1 TPOT 10.8 ms).

One engine: T=16 at buckets 8/32, T=32 at bucket 1 (decode_t_spec —
same compiled-program count). Cells: c=32 (reps 2), c=16, c=4, c=1;
device-side chained windows at c=32 AND c=1 (the c=1 step-time floor
session A did not measure). Writes gates/perf/<ts>-dense-r5b.json.

NEVER kill this process externally (chip claim wedges ~10-15 min).
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
BUDGET_S = float(os.environ.get("FERRUM_CHIP_BUDGET_S", "2400"))


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
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = os.path.join(repo, "gates", "perf", f"{ts}-dense-r5b.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    report = {
        "schema": "ferrum-tpu-perf-session/v1",
        "session": "r5b-host-fix",
        "model": "llama-3.1-8b-random-int4g128",
        "config": {"decode_multi_step": 16, "decode_t_spec": "1:32",
                   "buckets": "1,8,32", "pipeline_depth": 2},
        "baseline_session": "r5 (pre-fix): c32 970.2 (0.481 of device), "
                            "c1 tpot 10.80ms",
        "env_hash": env_hash({"session": "r5b"}),
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
    model_cfg = preset(model_name)
    params = init_random_quant_params(model_cfg, seed=0)
    say("params ready")

    cfg = EngineConfig.resolve(
        model="r5b", max_num_seqs=32, max_num_batched_tokens=2048,
        max_model_len=1024, prefill_chunk_size=256, kv_block_size=32,
        kv_layout="linear", prefix_cache_blocks=0,
        decode_bucket_spec="1,8", adaptive_windows=False,
        decode_multi_step=16, decode_t_spec="1:32", pipeline_depth=2,
        dtype="bf16", kv_dtype="bf16", seed=0)
    eng = EngineBuilder(cfg).with_model(model_cfg, params).build()
    say("engine built")

    def cell(c, n, tag, reps=1):
        n = max(c, int(n * nscale))
        runs = []
        for rep in range(reps):
            runs.append(run_cell(eng, concurrency=c, num_requests=n,
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

    try:
        cell(32, 64, "fix-c32", reps=2)
        if left() > 500:
            cell(16, 32, "fix-c16")
        if left() > 450:
            cell(4, 16, "fix-c4")
        if left() > 400:
            cell(1, 8, "fix-c1-T32")
    finally:
        eng.stop()

    # Device-side chained windows (loop stopped; runner still live).
    from ferrum_tpu.scheduler.sequence import Sequence
    from ferrum_tpu.types import InferenceRequest, SamplingParams

    def device_chain(n_lanes, t_steps, k_windows):
        sched, runner = eng.scheduler, eng.runner
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
        w = runner.start_decode_window(live, t_steps)
        runner.sync_window(w)
        t1 = time.time()
        for _ in range(k_windows):
            w = runner.start_decode_window(live, t_steps, prev=w)
        runner.sync_window(w)
        dt = time.time() - t1
        for s in live:
            sched.finish(s)
        return {"lanes": len(live), "t_steps": t_steps,
                "k_windows": k_windows,
                "ms_per_window": round(dt / k_windows * 1e3, 2),
                "ms_per_step": round(dt / k_windows / t_steps * 1e3, 3),
                "device_tok_s": round(
                    len(live) * t_steps * k_windows / dt, 1)}

    for lanes, t_w, k, tag in ((32, 16, 8, "c32_T16"), (1, 32, 6, "c1_T32")):
        if left() < 150:
            break
        try:
            d = device_chain(lanes, t_w, k)
            report["decomposition"][tag] = d
            say(f"device chain {tag}: {d['device_tok_s']} tok/s "
                f"({d['ms_per_step']} ms/step)")
        except Exception as e:
            report["notes"].append(
                f"device_chain {tag} failed: {type(e).__name__}: {e}")
        flush()

    e32 = next((c for c in report["cells"] if c["tag"] == "fix-c32"), None)
    d32 = report["decomposition"].get("c32_T16")
    if e32 and d32:
        report["decomposition"]["engine_vs_device_c32"] = round(
            e32["output_tok_s"] / d32["device_tok_s"], 3)
    flush()
    say(f"done -> {out_path}")
    print(json.dumps({"out": out_path,
                      "cells": [(c["tag"], round(c["output_tok_s"], 1))
                                for c in report["cells"]],
                      "decomp": report["decomposition"]}))


if __name__ == "__main__":
    main()
