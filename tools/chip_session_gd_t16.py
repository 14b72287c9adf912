#!/usr/bin/env python
"""One chip claim, two experiments (VERDICT r3 #2 and #4):

  A. Honest window-level A/B of the group-dot decode kernel: full
     engine serving cells at c=32 with w4a8_gd in {off, all, down}.
     (The r3 'wash' verdict was measured with the deduped-dispatch
     methodology — kernel-level honest numbers now say gd is 1.39x
     at m=64, so re-judge at window level.)
  B. (T, pipeline_depth) completion: the r4 sweep got cut before T=16.

Engines are rebuilt per variant IN PROCESS (the builder re-applies the
trace-time kernel mode; weights are regenerated on device — cheap).
Each cell reports output tok/s via the real run_cell path.

Env: C (default 32), NREQ (default 48), MODES (default off,all,down),
TGRID (default '8:2,16:1,16:2').
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")


def build(model_cfg, params, gd_mode: str, t_steps: int, depth: int):
    from ferrum_tpu.config import EngineConfig
    from ferrum_tpu.engine.builder import EngineBuilder

    cfg = EngineConfig.resolve(
        model=f"gd-{gd_mode}-t{t_steps}d{depth}", max_num_seqs=32,
        max_num_batched_tokens=2048, max_model_len=1024,
        prefill_chunk_size=256, kv_block_size=32, kv_layout="linear",
        prefix_cache_blocks=0, decode_bucket_spec="1,8",
        adaptive_windows=False, decode_multi_step=t_steps,
        pipeline_depth=depth, w4a8_gd=gd_mode,
        dtype="bf16", kv_dtype="bf16", seed=0)
    # params SHARED across rebuilds: a second on-device init alongside
    # the first engine's live weights + KV pool OOMs the chip.
    return EngineBuilder(cfg).with_model(model_cfg, params).build()


def main() -> None:
    import jax
    cache_dir = os.path.expanduser("~/.cache/ferrum-tpu/xla-cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)

    from ferrum_tpu.bench.bench_engine import run_cell
    from ferrum_tpu.models.configs import preset

    from ferrum_tpu.models.quantize import init_random_quant_params

    model_cfg = preset(os.environ.get("FERRUM_BENCH_MODEL", "llama-3.1-8b"))
    params = init_random_quant_params(model_cfg, seed=0)
    c = int(os.environ.get("C", "32"))
    n_req = int(os.environ.get("NREQ", "48"))
    modes = os.environ.get("MODES", "off,all,down").split(",")
    tgrid = [tuple(int(v) for v in td.split(":"))
             for td in os.environ.get("TGRID", "8:2,16:1,16:2").split(",")
             if td]

    t_start = time.time()

    def cell(engine, tag):
        t0 = time.time()
        r = run_cell(engine, concurrency=c, num_requests=n_req,
                     input_len=256, output_len=128, seed=0, warmup=2)
        print(json.dumps({
            "tag": tag,
            "output_tok_s": round(r["output_tok_s"], 1),
            "ttft_p50_ms": round(r["ttft_p50_ms"]),
            "itl_p95_ms": round(r["itl_p95_ms"], 1),
            "compiles_in_cell": r["compilations_during_cell"],
            "cell_wall_s": round(time.time() - t0, 1),
            "t_total_s": round(time.time() - t_start, 1),
        }), flush=True)

    import gc

    # A: gd modes at the production (T=8, depth=2) window shape
    for mode in modes:
        eng = build(model_cfg, params, mode, 8, 2)
        try:
            cell(eng, f"gd={mode} T=8 d=2")
        finally:
            eng.stop()
            del eng
            gc.collect()

    # B: T/depth grid at gd=off (or winner — rerun with MODES after A)
    best_mode = os.environ.get("BMODE", "off")
    for t_steps, depth in tgrid:
        eng = build(model_cfg, params, best_mode, t_steps, depth)
        try:
            cell(eng, f"gd={best_mode} T={t_steps} d={depth}")
        finally:
            eng.stop()
            del eng
            gc.collect()


if __name__ == "__main__":
    main()
