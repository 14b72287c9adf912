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
"""

import json
import os
import sys
import time

BASELINE_C32 = 745.6      # cuda-llama-dense gate, c=32 (BASELINE.md)
BASELINE_MOE_C32 = 706.0  # cuda-full Qwen3-30B-A3B gate, c=32
                          # (docs/release/g0/0.7.7/cuda-full/summary.json)


def main() -> None:
    import jax

    # Persistent compilation cache: repeat bench runs skip the multi-
    # minute (remote) compiles entirely.
    cache_dir = os.path.expanduser("~/.cache/ferrum-tpu/xla-cache")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from ferrum_tpu.config import EngineConfig
    from ferrum_tpu.engine.builder import EngineBuilder
    from ferrum_tpu.bench.bench_engine import run_bench
    from ferrum_tpu.models.configs import preset
    from ferrum_tpu.models.llama_family import init_random_params
    from ferrum_tpu.models.quantize import (
        init_random_quant_params, quantize_model_params,
    )

    t0 = time.time()
    model_name = os.environ.get("FERRUM_BENCH_MODEL", "llama-3.1-8b")
    quant = os.environ.get("FERRUM_BENCH_QUANT", "int4")
    c_list = tuple(int(x) for x in os.environ.get(
        "FERRUM_BENCH_CONCURRENCY", "1,4,16,32").split(","))
    n_req = int(os.environ.get("FERRUM_BENCH_REQUESTS", "64"))
    n_rep = int(os.environ.get("FERRUM_BENCH_REPEATS", "3"))
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
        max_model_len=max_len, prefill_chunk_size=512, kv_block_size=32,
        kv_layout="linear",   # slot-contiguous serving fast path
        # Random-prompt cells can't hit the prefix store; its extent +
        # per-iteration flush only cost HBM headroom here (observed
        # RESOURCE_EXHAUSTED at this 8B/32-slot config). Reuse evidence:
        # tools/bench_prefix_ttft.py. FERRUM_PREFIX_CACHE_BLOCKS
        # overrides.
        prefix_cache_blocks=0,
        # T=8 windows: the fixed per-dispatch cost (~16-19 ms over the
        # tunnel) dominates short windows — T=8 is +13% at c=32 and
        # +14% at c=1 vs T=4 (NOTES_ROUND3 T-sweep); the engine doubles
        # to 16 at low occupancy.
        decode_multi_step=8,
        dtype="bf16", kv_dtype="bf16", seed=0)

    label = f"{model_name}-random"
    if quant == "int4":
        # Direct packed-int4 random init: throughput is weight-value
        # independent and this avoids minutes of float RNG on 8B values.
        params = init_random_quant_params(model_cfg, seed=0)
        label += "-int4g128"
    else:
        params = init_random_params(model_cfg, seed=0, dtype=jnp.bfloat16)

    engine = (EngineBuilder(cfg)
              .with_model(model_cfg, params)
              .build())
    try:
        report = run_bench(engine, concurrencies=c_list,
                           num_requests_per_cell={
                               c: min(n_req, max(2 * c, 8)) if c < 32
                               else n_req for c in c_list},
                           input_len=in_len, output_len=out_len,
                           model_label=label, n_repeats=n_rep)
    finally:
        engine.stop()

    report["total_bench_s"] = time.time() - t0
    moe = model_cfg.moe is not None
    out_json = out_override or (
        "bench_report_moe.json" if moe else "bench_report.json")
    with open(out_json, "w") as f:
        json.dump(report, f, indent=2)

    baseline = BASELINE_MOE_C32 if moe else BASELINE_C32
    main_cell = report["cells"][-1]
    value = round(main_cell["output_tok_s"], 1)
    line = {
        "metric": (f"output_tok_s_c{main_cell['concurrency']}_{label}"
                   f"_{in_len}x{out_len}"),
        "value": value,
        "unit": "tok/s",
        "vs_baseline": round(value / baseline, 3),
    }
    print(json.dumps(line))


if __name__ == "__main__":
    main()
