#!/usr/bin/env python
"""(T, pipeline_depth) sweep at full occupancy on the real chip.

One process, one engine build: decode_multi_step and pipeline_depth
are read from cfg at each iteration, so cells re-run with different
values without rebuilding (new T variants compile once, in-session).
Output: one JSON line per cell to stderr-safe stdout.

Usage: python tools/bench_depth_sweep.py [c] [n_requests]
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
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    except Exception:
        pass

    from ferrum_tpu.config import EngineConfig
    from ferrum_tpu.engine.builder import EngineBuilder
    from ferrum_tpu.bench.bench_engine import run_cell
    from ferrum_tpu.models.configs import preset
    from ferrum_tpu.models.quantize import init_random_quant_params

    c = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_req = int(sys.argv[2]) if len(sys.argv) > 2 else 48

    model_cfg = preset("llama-3.1-8b")
    cfg = EngineConfig.resolve(
        model="sweep", max_num_seqs=32, max_num_batched_tokens=2048,
        max_model_len=1024, prefill_chunk_size=256, kv_block_size=32,
        kv_layout="linear", prefix_cache_blocks=0,
        decode_bucket_spec="1,8", adaptive_windows=False,
        decode_multi_step=8, dtype="bf16", kv_dtype="bf16", seed=0)
    params = init_random_quant_params(model_cfg, seed=0)
    engine = EngineBuilder(cfg).with_model(model_cfg, params).build()

    grid = [(8, 1), (8, 2), (8, 3), (16, 2), (16, 1)]
    try:
        first = True
        for t_steps, depth in grid:
            cfg.decode_multi_step = t_steps
            cfg.pipeline_depth = depth
            t0 = time.time()
            cell = run_cell(engine, concurrency=c, num_requests=n_req,
                            input_len=256, output_len=128, seed=0,
                            warmup=2 if first else 1)
            first = False
            print(json.dumps({
                "T": t_steps, "depth": depth,
                "output_tok_s": round(cell["output_tok_s"], 1),
                "ttft_p50_ms": round(cell["ttft_p50_ms"]),
                "itl_p95_ms": round(cell["itl_p95_ms"], 1),
                "compiles_in_cell": cell["compilations_during_cell"],
                "cell_wall_s": round(time.time() - t0, 1),
            }), flush=True)
    finally:
        engine.stop()


if __name__ == "__main__":
    main()
