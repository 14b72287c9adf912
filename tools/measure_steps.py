#!/usr/bin/env python
"""Ground-truth step timings on the real chip at the bench config.

Measures, with the engine's own runner (so shapes/buckets match
bench.py exactly):
  - fused decode window (T=decode_multi_step) at c=32, ctx bucket 512
  - one 256-token prefill chunk into an empty slot
  - int4 GEMM stream rate at the model's matmul shapes
Timings are chained with a single final readback (tunnel-safe).
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

    import jax.numpy as jnp
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
    print(f"params init: {time.time()-t0:.1f}s", flush=True)

    engine = EngineBuilder(cfg).with_model(model_cfg, params).build()
    runner = engine.runner
    sched = engine.scheduler
    try:
        ms = jax.local_devices()[0].memory_stats()
        print("hbm after build: "
              f"in_use={ms.get('bytes_in_use', 0)/2**30:.2f}GiB "
              f"limit={ms.get('bytes_limit', 0)/2**30:.2f}GiB "
              f"peak={ms.get('peak_bytes_in_use', 0)/2**30:.2f}GiB",
              flush=True)
    except Exception:
        pass

    # Admit 32 sequences with 256-token prompts via the real scheduler.
    seqs = []
    for i in range(32):
        req = InferenceRequest(
            prompt_token_ids=list(np.random.default_rng(i).integers(
                10, 1000, 256)),
            sampling=SamplingParams(max_tokens=128, temperature=0.0))
        seq = Sequence(req, req.prompt_token_ids)
        sched.submit(seq)
    t0 = time.time()
    n_chunks = 0
    prefill_times = []
    while any(s.phase.value != "decoding" for s in sched.running) \
            or sched.waiting:
        batch = sched.next_batch()
        if batch.is_empty:
            break
        for s in batch.admitted:
            runner.admit_slot(s)
            seqs.append(s)
        for chunk in batch.prefill_chunks:
            t1 = time.time()
            tok = runner.run_prefill(chunk)
            if tok is not None:
                np.asarray(tok)  # sync
            prefill_times.append(time.time() - t1)
            sched.note_prefill_done(chunk)
            n_chunks += 1
    print(f"prefill: {n_chunks} chunks in {time.time()-t0:.2f}s; "
          f"first(cold)={prefill_times[0]*1e3:.0f}ms "
          f"median={np.median(prefill_times)*1e3:.1f}ms "
          f"last={prefill_times[-1]*1e3:.1f}ms", flush=True)

    decode_seqs = [s for s in sched.running]
    print(f"decoding {len(decode_seqs)} seqs", flush=True)

    T = max(1, cfg.decode_multi_step)
    # Warm (compile) then measure a chain of windows with one final sync.
    t0 = time.time()
    toks = runner.run_decode_multi(decode_seqs, T)
    print(f"decode window warm/compile: {time.time()-t0:.2f}s", flush=True)
    for s in decode_seqs:
        s.output_tokens.extend(toks[s.request.request_id])

    n_win = 8
    t0 = time.time()
    for w in range(n_win):
        toks = runner.run_decode_multi(decode_seqs, T)
        for s in decode_seqs:
            s.output_tokens.extend(toks[s.request.request_id])
    dt = time.time() - t0
    per_win = dt / n_win
    per_step = per_win / T
    tok_s = len(decode_seqs) * T / per_win
    print(f"decode: {per_win*1e3:.1f} ms/window ({per_step*1e3:.2f} ms/step "
          f"incl. host+RTT) -> {tok_s:.0f} tok/s at c={len(decode_seqs)}",
          flush=True)

    # Pure device time: dispatch N chained windows back-to-back (device
    # carry feeds each next window), sync once at the end.
    fn = runner._get_decode_window_fn(runner.ctx_bucket(
        max(s.total_tokens for s in decode_seqs) + T * (n_win + 1)), T, True)
    packed = np.zeros((7, runner.num_slots), np.int32)
    packed[4] = runner.num_slots
    for s in decode_seqs:
        sl = s.slot
        pos = s.next_position()
        packed[0, sl] = s.all_tokens[-1]
        packed[1, sl] = pos
        packed[2, sl] = pos + 1
        packed[3, sl] = cfg.max_model_len
        packed[4, sl] = sl
    import jax.numpy as jnp
    prev_toks = runner._zero_window(T)
    gargs = lambda: (runner._gstates, runner._gdummy_init,  # noqa: E731
                     *runner._gdummy()[:2], runner._gdummy_tokcp,
                     runner.rec_conv, runner.rec_delta)
    # warm compile for the chained variant
    pk = jnp.asarray(packed)
    (toks, runner.kv, runner.counts, runner.keys, runner._gstates,
     runner.rec_conv, runner.rec_delta) = fn(
        runner.params, runner.kv, runner.counts, runner.keys,
        pk, prev_toks, runner._tables_dev, runner.samp, *gargs())
    np.asarray(toks)
    t0 = time.time()
    for w in range(n_win):
        packed[1] += T
        packed[2] += T
        packed[6] = 1
        (toks, runner.kv, runner.counts, runner.keys, runner._gstates,
         runner.rec_conv, runner.rec_delta) = fn(
            runner.params, runner.kv, runner.counts, runner.keys,
            jnp.asarray(packed), toks, runner._tables_dev, runner.samp,
            *gargs())
    np.asarray(toks)
    dt = time.time() - t0
    print(f"decode chained (no per-window sync): {dt/n_win*1e3:.1f} ms/window"
          f" -> {len(decode_seqs)*T*n_win/dt:.0f} tok/s device-side",
          flush=True)

    engine.stop()


if __name__ == "__main__":
    main()
