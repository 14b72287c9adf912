#!/usr/bin/env python
"""Decompose the decode step + prefill chunk at bench shapes.

Times chained windows under the attn_impl diagnostic ladder:
  skip        = trunk matmuls + sampling only (no attention, no append)
  append_only = + KV append
  linear      = full production step
and a single-sequence 256-token prefill chunk (m=256) under the same
ladder. All timings chained on device with one final readback
(tunnel-safe; see NOTES_ROUND1).
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
    from ferrum_tpu.engine.runner import ModelRunner
    from ferrum_tpu.models.configs import preset
    from ferrum_tpu.models.llama_family import PagedKvCache
    from ferrum_tpu.models.quantize import init_random_quant_params

    from ferrum_tpu.ops.pallas import quant_matmul as _qm
    _qm.set_w4a8(os.environ.get("W4A8", "1") == "1")

    model_cfg = preset(os.environ.get("FERRUM_BENCH_MODEL", "llama-3.1-8b"))
    cfg = EngineConfig.resolve(
        model="bench", max_num_seqs=32, max_num_batched_tokens=2048,
        max_model_len=int(os.environ.get("MAXLEN", 1024)),
        prefill_chunk_size=512, kv_block_size=32,
        kv_layout="linear", dtype="bf16", kv_dtype="bf16", seed=0)
    params = init_random_quant_params(model_cfg, seed=0)
    if os.environ.get("TL", "1") == "1":
        from ferrum_tpu.engine.builder import apply_two_level
        params = apply_two_level(params)
    if os.environ.get("FUSE", "1") == "1":
        from ferrum_tpu.engine.builder import fuse_projections
        params = fuse_projections(params)
    T = int(os.environ.get("T", cfg.decode_multi_step or 8))
    n_win = int(os.environ.get("NWIN", 10))
    impls = os.environ.get("IMPLS", "skip,append_only,linear").split(",")

    for impl in impls:
        kv = PagedKvCache.create(model_cfg, cfg.max_num_seqs
                                 * cfg.max_blocks_per_seq,
                                 cfg.kv_block_size, dtype=jnp.bfloat16)
        runner = ModelRunner(model_cfg, cfg, params, kv, attn_impl=impl)
        s_full = runner.num_slots
        s = int(os.environ.get("LANES", s_full))   # occupancy bucket
        ctx_pad = 512
        fn = runner._get_decode_window_fn(ctx_pad, T, s, True)
        packed = np.zeros((7, s), np.int32)
        for sl in range(s):
            packed[0, sl] = 17
            packed[1, sl] = 255
            packed[2, sl] = 256
            packed[3, sl] = cfg.max_model_len
            packed[4, sl] = sl
        runner._tables_np[:] = np.arange(
            s_full * runner.max_pages).reshape(s_full, runner.max_pages)
        runner._tables_dev = jnp.asarray(runner._tables_np)
        def gargs():
            return (runner._gstates, runner._gdummy_init,
                    *runner._gdummy()[:2], runner._gdummy_tokcp,
                    runner.rec_conv, runner.rec_delta)
        def run(pk):
            out = fn(runner.params, runner.kv, runner.counts,
                     runner.keys, pk, runner._last_toks,
                     runner._tables_dev, runner.samp, *gargs())
            (toks, runner._last_toks, runner.kv, runner.counts,
             runner.keys, runner._gstates, runner.rec_conv,
             runner.rec_delta) = out[:8]
            return toks
        toks = run(jnp.asarray(packed))
        np.asarray(toks)
        packed[6] = 1
        pk2 = jnp.asarray(packed)
        t0 = time.time()
        for _ in range(n_win):
            toks = run(pk2)
        np.asarray(toks)
        dt = time.time() - t0
        print(f"decode[{impl:12s}] lanes={s} {dt/n_win*1e3:7.1f} ms/window "
              f"({dt/n_win/T*1e3:5.2f} ms/step) -> "
              f"{s*T*n_win/dt:5.0f} tok/s", flush=True)
        del runner, kv

    # --- prefill chunk m=256, singleton vs batched B=8 ---
    from ferrum_tpu.models.llama_family import OOB_SENTINEL
    for impl in impls:
        kv = PagedKvCache.create(model_cfg, cfg.max_num_seqs
                                 * cfg.max_blocks_per_seq,
                                 cfg.kv_block_size, dtype=jnp.bfloat16)
        runner = ModelRunner(model_cfg, cfg, params, kv, attn_impl=impl)
        runner._tables_np[:] = np.arange(
            runner.num_slots * runner.max_pages).reshape(
            runner.num_slots, runner.max_pages)
        runner._tables_dev = jnp.asarray(runner._tables_np)
        v = model_cfg.vocab_size
        for b in (1, 8):
            t_pad, ctx_pad = 256, 256
            fn = runner._get_prefill_batch_fn(b, t_pad, ctx_pad, True,
                                              False, False, 0)
            packed = np.zeros((b, 5, t_pad), np.int32)
            packed[:, 1] = v
            for i in range(b):
                packed[i, 0, :] = 17
                packed[i, 1, :] = 17
                packed[i, 2, :] = np.arange(256)
                packed[i, 3, :] = (np.arange(256)
                                   + i * runner.max_pages * runner.page)
                packed[i, 4, :5] = [i, 255, 256, 0, 1]
            def gargs():
                return (runner._gstates, runner._gdummy_init,
                        *runner._gdummy()[:2], runner._gdummy_tokcp,
                        runner.rec_conv, runner.rec_delta)
            pk = jnp.asarray(packed)
            out = fn(runner.params, runner.kv, runner.counts, runner.keys,
                     pk, runner._tables_dev, runner.samp, *gargs())
            toks = out[0]
            (runner.kv, runner.counts, runner.keys, runner._gstates,
             runner.rec_conv, runner.rec_delta) = out[1:7]
            np.asarray(toks)
            n_it = 8
            t0 = time.time()
            for _ in range(n_it):
                out = fn(runner.params, runner.kv, runner.counts,
                         runner.keys, pk, runner._tables_dev,
                         runner.samp, *gargs())
                (runner.kv, runner.counts, runner.keys, runner._gstates,
                 runner.rec_conv, runner.rec_delta) = out[1:7]
            np.asarray(out[0])
            dt = time.time() - t0
            print(f"prefill[{impl:12s}] B={b} {dt/n_it*1e3:7.1f} ms/call "
                  f"({dt/n_it/b*1e3:6.1f} ms/seq)", flush=True)
        del runner, kv


if __name__ == "__main__":
    main()
