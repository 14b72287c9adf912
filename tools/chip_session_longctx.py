#!/usr/bin/env python
"""Standalone long-context bench cell (VERDICT r4 #5): 2048/128 at c=8
with int8 KV on the dense 8B int4 model — ONLY the long-ctx engine, so
the compile surface is the handful of ctx-4096 programs instead of the
full dense ladder (which a slow remote-compile day can eat the whole
budget with — observed: 2374 s for the 11-program ladder surface).

Appends the cell to bench_report_longctx.json. NEVER kill externally.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")


def main() -> None:
    import jax

    cache_dir = os.path.expanduser("~/.cache/ferrum-tpu/xla-cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from ferrum_tpu.bench.bench_engine import run_cell
    from ferrum_tpu.config import EngineConfig
    from ferrum_tpu.engine.builder import EngineBuilder
    from ferrum_tpu.models.configs import preset
    from ferrum_tpu.models.quantize import init_random_quant_params

    t0 = time.time()

    def say(msg):
        print(f"# t={time.time() - t0:7.1f}s {msg}", file=sys.stderr,
              flush=True)

    model_cfg = preset(os.environ.get("FERRUM_BENCH_MODEL", "llama-3.1-8b"))
    params = init_random_quant_params(model_cfg, seed=0)
    say("params ready")
    # Same config as bench.py's long-ctx cell (2048/128, int8 KV, c=8).
    cfg = EngineConfig.resolve(
        model="bench-longctx", max_num_seqs=8,
        max_num_batched_tokens=2048, max_model_len=4096,
        prefill_chunk_size=512, kv_block_size=32,
        kv_layout="linear", decode_bucket_spec="8",
        adaptive_windows=False, prefix_cache_blocks=0,
        decode_multi_step=8, dtype="bf16", kv_dtype="int8", seed=0)
    eng = EngineBuilder(cfg).with_model(model_cfg, params).build()
    say("engine built")
    try:
        cell = run_cell(eng, concurrency=8, num_requests=16,
                        input_len=2048, output_len=128, seed=0, warmup=1)
        cell["workload"] = {"input_len": 2048, "output_len": 128,
                            "kv_dtype": "int8"}
        say(f"long-ctx cell: {cell['output_tok_s']:.1f} tok/s "
            f"ttft_p50={cell['ttft_p50_ms']:.0f}ms "
            f"compiles={cell['compilations_during_cell']}")
    finally:
        eng.stop()

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench_report_longctx.json")
    try:
        with open(out) as f:
            report = json.load(f)
    except Exception:
        report = {"schema": "ferrum-tpu-bench/v1",
                  "model": "llama-3.1-8b-random-int4g128", "cells": []}
    report["cells"].append(cell)
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({"long_ctx_tok_s": round(cell["output_tok_s"], 1),
                      "out": out}))


if __name__ == "__main__":
    main()
