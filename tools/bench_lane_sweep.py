#!/usr/bin/env python
"""Decode-window cost vs occupancy (lane bucket), on the real chip.

For each active-sequence count c in the sweep, dispatches a chain of
fused decode windows exactly as the engine does (start_decode_window
with prev-chaining, one sync at the end) and reports ms/window,
ms/step and tok/s. This is the ground truth for VERDICT r2 weak #1
(occupancy scaling) and for the r3 lane-compaction regression hunt.

Env: FERRUM_BENCH_MODEL (default llama-3.1-8b), SWEEP (default
"1,2,4,8,16,32"), NWIN (default 16), CTX (prompt len, default 256).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    cache_dir = os.path.expanduser("~/.cache/ferrum-tpu/xla-cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from ferrum_tpu.config import EngineConfig
    from ferrum_tpu.engine.builder import EngineBuilder
    from ferrum_tpu.models.configs import preset
    from ferrum_tpu.models.quantize import init_random_quant_params
    from ferrum_tpu.scheduler.sequence import Sequence
    from ferrum_tpu.types import InferenceRequest, SamplingParams

    model_cfg = preset(os.environ.get("FERRUM_BENCH_MODEL", "llama-3.1-8b"))
    cfg = EngineConfig.resolve(
        model="bench", max_num_seqs=32, max_num_batched_tokens=2048,
        max_model_len=1024, prefill_chunk_size=512, kv_block_size=32,
        kv_layout="linear", decode_multi_step=4,
        dtype="bf16", kv_dtype="bf16", seed=0)
    t0 = time.time()
    params = init_random_quant_params(model_cfg, seed=0)
    engine = EngineBuilder(cfg).with_model(model_cfg, params).build()
    runner = engine.runner
    sched = engine.scheduler
    print(f"build: {time.time()-t0:.1f}s", flush=True)

    ctx = int(os.environ.get("CTX", "256"))
    # Admit + prefill 32 sequences through the real scheduler.
    for i in range(32):
        req = InferenceRequest(
            prompt_token_ids=list(np.random.default_rng(i).integers(
                10, 1000, ctx)),
            sampling=SamplingParams(max_tokens=600, temperature=0.0))
        sched.submit(seq := Sequence(req, req.prompt_token_ids))
    t0 = time.time()
    while any(s.phase.value != "decoding" for s in sched.running) \
            or sched.waiting:
        batch = sched.next_batch()
        if batch.is_empty:
            break
        for s in batch.admitted:
            runner.admit_slot(s)
        for chunk in batch.prefill_chunks:
            tok = runner.run_prefill(chunk)
            if tok is not None:
                np.asarray(tok)
            sched.note_prefill_done(chunk)
    print(f"prefill all: {time.time()-t0:.1f}s", flush=True)

    all_seqs = list(sched.running)
    T = max(1, cfg.decode_multi_step)
    n_win = int(os.environ.get("NWIN", "16"))
    sweep = [int(x) for x in
             os.environ.get("SWEEP", "1,2,4,8,16,32").split(",")]

    for c in sweep:
        seqs = all_seqs[:c]
        # warm/compile + establish the chain
        w = runner.start_decode_window(seqs, T)
        runner.sync_window(w)
        w = runner.start_decode_window(seqs, T, prev=w)
        runner.sync_window(w)
        t0 = time.time()
        for _ in range(n_win):
            w = runner.start_decode_window(seqs, T, prev=w)
        runner.sync_window(w)
        dt = time.time() - t0
        ms_win = dt / n_win * 1e3
        print(f"c={c:3d} s_pad={runner.lane_bucket(c):3d}: "
              f"{ms_win:6.2f} ms/window  {ms_win/T:6.2f} ms/step  "
              f"{c*T*n_win/dt:7.1f} tok/s", flush=True)
        # rewind positions so each sweep point sees the same ctx depth
        for s in seqs:
            pass  # positions advance ~n_win*T (<1 ctx bucket at 600 max)

    engine.stop()


if __name__ == "__main__":
    main()
