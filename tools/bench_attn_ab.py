#!/usr/bin/env python
"""Paged decode attention A/B on the real chip (VERDICT r3 #6).

VERDICT RENDERED (round 5, real chip, llama-8B int4, ctx 2048, c=4,
T=8, 12 windows): ref (XLA gather) 160.42 ms/window vs pallas
(DMA-ring ragged kernel) 1238.03 ms/window — a 7.7x LOSS for the
kernel at exactly the long-context regime it was aimed at. The (S,)
per-sequence grid serializes on the v5e's single TensorCore, and the
page-granular DMA ring cannot beat XLA's fused gather + flash
composition. The kernel was REMOVED (ops/pallas/paged_attention.py);
the linear slot-contiguous layout remains the serving fast path and
the XLA gather path serves the paged layout. Artifact:
gates/perf/*-attn-ab.json. Tool retained (IMPLS=ref) as the in-engine
long-context window probe and as the bar for any future kernel.

Env: CTX (default 2048), C (lanes, default 8), T (default 8),
NWIN (default 16), FERRUM_BENCH_MODEL (default llama-3.1-8b).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np


def run_impl(attn_impl: str, model_cfg, ctx: int, c: int, t_steps: int,
             n_win: int, kv_dtype: str):
    import jax

    from ferrum_tpu.config import EngineConfig
    from ferrum_tpu.engine.builder import EngineBuilder
    from ferrum_tpu.models.quantize import init_random_quant_params
    from ferrum_tpu.scheduler.sequence import Sequence
    from ferrum_tpu.types import InferenceRequest, SamplingParams

    cfg = EngineConfig.resolve(
        model=f"attn-ab-{attn_impl}", max_num_seqs=c,
        max_num_batched_tokens=2048,
        max_model_len=1 << (ctx + 256).bit_length(),
        prefill_chunk_size=512, kv_block_size=32,
        kv_layout="paged", kv_num_blocks=c * ((ctx + 512) // 32),
        prefix_cache_blocks=0,
        decode_bucket_spec=str(c), adaptive_windows=False,
        decode_multi_step=t_steps, dtype="bf16", kv_dtype=kv_dtype,
        seed=0)
    if model_cfg.hidden_size >= 256:
        params = init_random_quant_params(model_cfg, seed=0)
    else:  # tiny smoke shapes can't int4-quantize at group 128
        from ferrum_tpu.models.llama_family import init_random_params
        params = init_random_params(model_cfg, seed=0)
    b = EngineBuilder(cfg).with_model(model_cfg, params)
    b.attn_impl = attn_impl
    engine = b.build()
    runner = engine.runner
    sched = engine.scheduler
    assert runner.attn_impl == attn_impl, runner.attn_impl

    t0 = time.time()
    for i in range(c):
        req = InferenceRequest(
            prompt_token_ids=list(np.random.default_rng(i).integers(
                10, 1000, ctx)),
            sampling=SamplingParams(max_tokens=t_steps * (n_win + 8),
                                    temperature=0.0, ignore_eos=True))
        sched.submit(Sequence(req, req.prompt_token_ids))
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
    print(f"  [{attn_impl}] prefill {c}x{ctx}: {time.time()-t0:.1f}s",
          flush=True)

    seqs = list(sched.running)[:c]
    w = runner.start_decode_window(seqs, t_steps)
    runner.sync_window(w)
    w = runner.start_decode_window(seqs, t_steps, prev=w)
    runner.sync_window(w)
    t0 = time.time()
    for _ in range(n_win):
        w = runner.start_decode_window(seqs, t_steps, prev=w)
    runner.sync_window(w)
    dt = time.time() - t0
    ms_win = dt / n_win * 1e3
    print(f"  [{attn_impl}] ctx~{ctx}: {ms_win:6.2f} ms/window  "
          f"{ms_win / t_steps:6.2f} ms/step  "
          f"{c * t_steps * n_win / dt:7.1f} tok/s", flush=True)
    engine.stop()
    del engine, runner, sched, params
    return ms_win


def main():
    from ferrum_tpu.models.configs import preset

    import jax
    cache_dir = os.path.expanduser("~/.cache/ferrum-tpu/xla-cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)

    model_cfg = preset(os.environ.get("FERRUM_BENCH_MODEL", "llama-3.1-8b"))
    ctx = int(os.environ.get("CTX", "2048"))
    c = int(os.environ.get("C", "8"))
    t_steps = int(os.environ.get("T", "8"))
    n_win = int(os.environ.get("NWIN", "16"))
    kv_dtype = os.environ.get("KV", "bf16")
    impls = os.environ.get("IMPLS", "ref").split(",")
    res = {}
    for impl in impls:
        res[impl] = run_impl(impl, model_cfg, ctx, c, t_steps, n_win,
                             kv_dtype)
    if len(res) > 1:
        ks = list(res)
        print(f"A/B: {ks[0]}={res[ks[0]]:.2f} ms/win vs "
              f"{ks[1]}={res[ks[1]]:.2f} ms/win -> "
              f"{'WIN' if res[ks[1]] < res[ks[0]] else 'LOSS'} for {ks[1]}",
              flush=True)


if __name__ == "__main__":
    main()
