"""`ferrum` CLI: run / serve / bench / bench-serve / list / pull / stop.

TPU-native analog of the reference's single-binary CLI
(crates/ferrum-cli/src/main.rs:34-77): one entry point drives the
interactive REPL (`run`), the OpenAI-compatible server (`serve`),
offline and serving benchmarks, model listing/download, plus the
embed/transcribe/tts modality lanes (gated on the loaded model).

Usage: python -m ferrum_tpu <subcommand> [...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import Any, Dict, Optional

from .config import EngineConfig
from .types import FerrumError, InferenceRequest, SamplingParams


def _add_engine_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("model", help="checkpoint dir, preset name, or random:<preset>")
    p.add_argument("--max-num-seqs", type=int, default=None)
    p.add_argument("--max-num-batched-tokens", type=int, default=None)
    p.add_argument("--max-model-len", type=int, default=None)
    p.add_argument("--kv-capacity", type=int, default=None,
                   help="KV blocks (0 = autosize from HBM)")
    p.add_argument("--kv-block-size", type=int, default=None)
    p.add_argument("--kv-dtype", default=None, choices=["bf16", "f32", "int8"])
    p.add_argument("--kv-layout", default=None,
                   choices=["paged", "linear", "auto"],
                   help="auto (default): linear fast path when the "
                        "per-slot reservation fits HBM, else paged")
    p.add_argument("--quantization", default=None,
                   choices=["none", "gptq_int4", "gguf_q4k"])
    p.add_argument("--enable-prefix-cache", action="store_true", default=None)
    p.add_argument("--no-prefix-cache", dest="enable_prefix_cache",
                   action="store_false")
    p.add_argument("--scheduler", default=None,
                   choices=["continuous", "fifo", "priority"])
    p.add_argument("--prefill-chunk", type=int, default=None)
    p.add_argument("--decode-multi-step", type=int, default=None)
    p.add_argument("--tp", type=int, default=None, dest="tensor_parallel")
    p.add_argument("--spec-draft", default=None, dest="spec_draft_model",
                   help="draft model for speculative decoding "
                        "(checkpoint dir or random:<preset>)")
    p.add_argument("--spec-k", type=int, default=None,
                   dest="spec_num_tokens",
                   help="speculative draft length (tokens per round)")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--config", default="ferrum.toml",
                   help="ferrum.toml path (CLI > env > file precedence)")
    # Observability product (utils/profile.py locked schema; ref
    # observability_product.rs flag surface).
    p.add_argument("--profile-jsonl", default=None, dest="profile_path",
                   help="write sampled profile events (JSONL, schema v2)")
    p.add_argument("--profile-detail", default=None,
                   choices=["off", "basic", "debug", "full"])
    p.add_argument("--profile-sample-rate", type=float, default=None)
    p.add_argument("--memory-profile-jsonl", default=None,
                   dest="memory_profile_path",
                   help="separate sink for periodic memory snapshots")


def _build_engine(args) -> "Any":
    from .engine.builder import EngineBuilder

    overrides: Dict[str, Any] = {
        "model": args.model,
        "max_num_seqs": args.max_num_seqs,
        "max_num_batched_tokens": args.max_num_batched_tokens,
        "max_model_len": args.max_model_len,
        "kv_num_blocks": args.kv_capacity,
        "kv_block_size": args.kv_block_size,
        "kv_dtype": args.kv_dtype,
        "kv_layout": args.kv_layout,
        "quantization": args.quantization,
        "enable_prefix_cache": args.enable_prefix_cache,
        "scheduler": args.scheduler,
        "prefill_chunk_size": args.prefill_chunk,
        "decode_multi_step": args.decode_multi_step,
        "tensor_parallel": args.tensor_parallel,
        "spec_draft_model": args.spec_draft_model,
        "spec_num_tokens": args.spec_num_tokens,
        "seed": args.seed,
        "profile_path": getattr(args, "profile_path", None),
        "profile_detail": getattr(args, "profile_detail", None),
        "profile_sample_rate": getattr(args, "profile_sample_rate", None),
        "memory_profile_path": getattr(args, "memory_profile_path", None),
    }
    # Base layer (lowest precedence): the CLI serves the fast path by
    # default — env/toml/flags still override.
    cfg = EngineConfig.resolve(cli_overrides=overrides,
                               toml_path=args.config, kv_layout="auto")
    builder = EngineBuilder(cfg)
    if getattr(args, "tensor_parallel", None) and args.tensor_parallel > 1:
        from .parallel.mesh import make_mesh
        builder.with_mesh(make_mesh(tp=args.tensor_parallel))
    return builder.build()


# ---------------------------------------------------------------------------
# run — interactive REPL (ref: commands/run.rs: /exit /clear /system,
# one-shot --prompt, text/json output)
# ---------------------------------------------------------------------------

def cmd_run(args) -> int:
    engine = _build_engine(args)
    from .server.chat_template import ChatTemplateRenderer

    renderer = ChatTemplateRenderer(
        template=engine.tokenizer.chat_template,
        family=engine.runner.model_cfg.family)
    sampling = SamplingParams(temperature=args.temperature,
                              top_p=args.top_p, max_tokens=args.max_tokens)

    def generate(messages):
        prompt = renderer.render(messages)
        req = InferenceRequest(
            prompt_token_ids=engine.tokenizer.encode(prompt),
            sampling=sampling)
        t0 = time.monotonic()
        n_tok = 0
        out = []
        for chunk in engine.infer_stream(req):
            if chunk.text:
                if not args.json:
                    print(chunk.text, end="", flush=True)
                out.append(chunk.text)
            n_tok = chunk.completion_tokens
        dt = time.monotonic() - t0
        print("" if not args.json else "", flush=True)
        print(f"[{n_tok} tokens, {n_tok / max(dt, 1e-9):.1f} tok/s]",
              file=sys.stderr)
        return "".join(out)

    try:
        if args.prompt is not None:  # one-shot
            msgs = []
            if args.system:
                msgs.append({"role": "system", "content": args.system})
            msgs.append({"role": "user", "content": args.prompt})
            text = generate(msgs)
            if args.json:
                print(json.dumps({"response": text}))
            return 0

        # REPL
        history = []
        system = args.system
        print("ferrum-tpu REPL — /exit, /clear, /system <msg>",
              file=sys.stderr)
        while True:
            try:
                line = input(">>> ")
            except (EOFError, KeyboardInterrupt):
                return 0
            if line.strip() == "/exit":
                return 0
            if line.strip() == "/clear":
                history.clear()
                continue
            if line.startswith("/system"):
                system = line[len("/system"):].strip()
                continue
            history.append({"role": "user", "content": line})
            msgs = ([{"role": "system", "content": system}] if system else []) \
                + history
            reply = generate(msgs)
            history.append({"role": "assistant", "content": reply})
    finally:
        engine.stop()


# ---------------------------------------------------------------------------
# serve — OpenAI-compatible HTTP server (ref: commands/serve.rs)
# ---------------------------------------------------------------------------

def cmd_replay(args) -> int:
    """Re-run a captured request bundle deterministically and compare
    against its observed tokens (ref: commands/replay_bundle.rs +
    scripts/release/request_replay_bundle_gate.py)."""
    from .utils.replay import replay_bundle

    engine = _build_engine(args)
    try:
        record = replay_bundle(args.bundle, engine)
        print(json.dumps(record, indent=2))
        return 0 if record["matches_observed"] else 2
    finally:
        engine.stop()


def cmd_route(args) -> int:
    """Multi-host serving front (parallel/router.py): least-loaded DP
    forwarding over per-host engine frontends."""
    from .parallel.router import run_router
    workers = [w.strip() for w in args.workers.split(",") if w.strip()]
    print(f"routing over {len(workers)} workers on "
          f"{args.host}:{args.port}", flush=True)
    run_router(workers, host=args.host, port=args.port)
    return 0


def cmd_serve(args) -> int:
    engine = _build_engine(args)
    from .server.app import serve

    asr = None
    if getattr(args, "asr_model", None):
        from .engine.asr import AsrEngine
        asr = AsrEngine(args.asr_model)
        print(f"ASR lane: {args.asr_model}", file=sys.stderr)
    tts = None
    if getattr(args, "tts_model", None):
        from .engine.tts import TtsEngine
        tts = TtsEngine(args.tts_model)
        print(f"TTS lane: {args.tts_model}", file=sys.stderr)
    if getattr(args, "embed_model", None):
        # Dedicated encoder checkpoint for /v1/embeddings: BERT (text)
        # or CLIP (text+image), detected from architectures.
        import json as _json
        import os as _os
        with open(_os.path.join(args.embed_model, "config.json")) as f:
            archs = _json.load(f).get("architectures") or []
        if any("CLIP" in a for a in archs):
            from .engine.embedding import ClipEmbeddingEngine
            emb = ClipEmbeddingEngine(args.embed_model)
        else:
            from .engine.embedding import BertEmbeddingEngine
            emb = BertEmbeddingEngine(args.embed_model)
        print(f"embeddings lane: {args.embed_model}", file=sys.stderr)
    else:
        # Default: mean-pooled embeddings from the serving model.
        from .engine.embedding import EmbeddingEngine
        emb = EmbeddingEngine(engine.runner.model_cfg,
                              engine.runner.params, engine.tokenizer)
    print(f"serving {args.model} on http://{args.host}:{args.port}",
          file=sys.stderr)
    try:
        serve(engine, model_name=args.served_model_name or args.model,
              host=args.host, port=args.port, api_key=args.api_key,
              asr_engine=asr, embedding_engine=emb, tts_engine=tts)
    finally:
        engine.stop()
    return 0


def cmd_tts(args) -> int:
    """One-shot speech synthesis → WAV file (ref: ferrum-cli tts)."""
    from .engine.tts import TtsEngine

    eng = TtsEngine(args.model)
    wav = eng.synthesize_wav(args.text, voice=args.voice,
                             max_frames=args.max_frames)
    with open(args.out, "wb") as f:
        f.write(wav)
    print(f"wrote {args.out} ({len(wav)} bytes, "
          f"{eng.sample_rate} Hz)", file=sys.stderr)
    return 0


def cmd_transcribe(args) -> int:
    """One-shot WAV transcription (ref: ferrum-cli transcribe)."""
    from .engine.asr import AsrEngine

    eng = AsrEngine(args.model)
    with open(args.audio, "rb") as f:
        data = f.read()
    result = eng.transcribe_bytes(data, max_new_tokens=args.max_tokens)
    if args.json:
        print(json.dumps(result))
    else:
        print(result["text"] if result["text"]
              else f"[token ids] {result['token_ids']}")
    return 0


# ---------------------------------------------------------------------------
# bench — offline engine benchmark; bench-serve — HTTP-level benchmark
# ---------------------------------------------------------------------------

def cmd_bench(args) -> int:
    engine = _build_engine(args)
    from .bench.bench_engine import run_bench, run_cell_open_loop

    try:
        if getattr(args, "open_loop_rps", None):
            report = run_cell_open_loop(
                engine, rate_rps=args.open_loop_rps,
                duration_s=args.duration, input_len=args.input_len,
                output_len=args.output_len)
        else:
            report = run_bench(
                engine,
                concurrencies=tuple(int(c)
                                    for c in args.concurrency.split(",")),
                num_requests_per_cell={int(c): args.num_requests
                                       for c in args.concurrency.split(",")},
                input_len=args.input_len, output_len=args.output_len,
                model_label=args.model)
    finally:
        engine.stop()
    out = json.dumps(report, indent=2)
    if args.output:
        with open(args.output, "w") as f:
            f.write(out)
    print(out)
    return 0


def cmd_bench_serve(args) -> int:
    from .bench.bench_serve import run_bench_serve

    report = run_bench_serve(
        base_url=args.base_url, model=args.model,
        concurrencies=tuple(int(c) for c in args.concurrency.split(",")),
        num_requests=args.num_requests, input_len=args.input_len,
        output_len=args.output_len, n_repeats=args.n_repeats)
    out = json.dumps(report, indent=2)
    if args.output:
        with open(args.output, "w") as f:
            f.write(out)
    print(out)
    return 0


# ---------------------------------------------------------------------------
# embed — embedding modality lane (ref: commands embed; transcribe/tts
# land with the Whisper/TTS executors)
# ---------------------------------------------------------------------------

def cmd_embed(args) -> int:
    engine = _build_engine(args)
    from .engine.embedding import EmbeddingEngine

    emb = EmbeddingEngine(engine.runner.model_cfg, engine.runner.params,
                          engine.tokenizer)
    try:
        texts = args.text or [line.strip() for line in sys.stdin
                              if line.strip()]
        vecs, total = emb.embed(texts)
        out = {"model": args.model, "usage": {"prompt_tokens": total},
               "data": [{"index": i, "embedding": v.tolist()}
                        for i, v in enumerate(vecs)]}
        print(json.dumps(out))
    finally:
        engine.stop()
    return 0


# ---------------------------------------------------------------------------
# list / pull / stop
# ---------------------------------------------------------------------------

def cmd_list(args) -> int:
    from .models.configs import preset

    names = ["llama-3.1-8b", "qwen3-0.6b", "qwen3-4b", "qwen3-8b",
             "qwen3-30b-a3b"]
    rows = []
    for n in names:
        c = preset(n)
        rows.append((n, c.family, f"{c.num_layers}L/{c.hidden_size}H",
                     "moe" if c.moe else "dense"))
    cache = os.path.expanduser(os.environ.get(
        "FERRUM_MODELS_DIR", "~/.cache/ferrum-tpu/models"))
    local = []
    if os.path.isdir(cache):
        local = [d for d in sorted(os.listdir(cache))
                 if os.path.isdir(os.path.join(cache, d))]
    print(f"{'PRESET':24} {'FAMILY':10} {'SHAPE':14} KIND")
    for r in rows:
        print(f"{r[0]:24} {r[1]:10} {r[2]:14} {r[3]}")
    if local:
        print("\nlocal checkpoints under", cache)
        for d in local:
            print(" ", d)
    return 0


def cmd_pull(args) -> int:
    from .models.hf_download import download_model

    dest = download_model(args.model, revision=args.revision,
                          token=os.environ.get("HF_TOKEN"))
    print(dest)
    return 0


def cmd_stop(args) -> int:
    import urllib.request

    try:
        req = urllib.request.Request(f"{args.base_url}/admin/stop",
                                     method="POST")
        urllib.request.urlopen(req, timeout=5)
        print("stopped")
    except Exception as e:
        print(f"no server reachable at {args.base_url}: {e}",
              file=sys.stderr)
        return 1
    return 0


# ---------------------------------------------------------------------------

def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="ferrum-tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("run", help="interactive chat / one-shot generation")
    _add_engine_flags(p)
    p.add_argument("--prompt", default=None)
    p.add_argument("--system", default=None)
    p.add_argument("--temperature", type=float, default=0.7)
    p.add_argument("--top-p", type=float, default=0.95)
    p.add_argument("--max-tokens", type=int, default=512)
    p.add_argument("--json", action="store_true")
    p.set_defaults(fn=cmd_run)

    p = sub.add_parser("transcribe", help="transcribe a WAV file (Whisper)")
    p.add_argument("model", help="whisper checkpoint dir")
    p.add_argument("audio", help="WAV file (16-bit PCM)")
    p.add_argument("--max-tokens", type=int, default=224)
    p.add_argument("--json", action="store_true")
    p.set_defaults(fn=cmd_transcribe)

    p = sub.add_parser("tts", help="synthesize speech to a WAV file")
    p.add_argument("model", help="TTS checkpoint dir")
    p.add_argument("text", help="text to synthesize")
    p.add_argument("--out", default="out.wav")
    p.add_argument("--voice", default="default")
    p.add_argument("--max-frames", type=int, default=None)
    p.set_defaults(fn=cmd_tts)

    p = sub.add_parser("serve", help="OpenAI-compatible HTTP server")
    _add_engine_flags(p)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--api-key", default=None)
    p.add_argument("--served-model-name", default=None)
    p.add_argument("--asr-model", default=None,
                   help="whisper checkpoint dir for /v1/audio/transcriptions")
    p.add_argument("--tts-model", default=None,
                   help="TTS checkpoint dir for /v1/audio/speech")
    p.add_argument("--embed-model", default=None,
                   help="BERT checkpoint dir for /v1/embeddings "
                        "(default: mean-pooled from the serving model)")
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("bench", help="offline engine benchmark")
    _add_engine_flags(p)
    p.add_argument("--concurrency", default="1,4,16,32")
    p.add_argument("--num-requests", type=int, default=64)
    p.add_argument("--input-len", type=int, default=256)
    p.add_argument("--output-len", type=int, default=128)
    p.add_argument("--output", default=None)
    p.add_argument("--open-loop-rps", type=float, default=None,
                   help="Poisson arrival rate (req/s): open-loop mode — "
                        "TTFT under offered load instead of closed-loop "
                        "concurrency cells")
    p.add_argument("--duration", type=float, default=30.0,
                   help="open-loop launch window in seconds")
    p.set_defaults(fn=cmd_bench)

    p = sub.add_parser("bench-serve",
                       help="HTTP serving benchmark (vLLM bench-serve compatible)")
    p.add_argument("--base-url", default="http://127.0.0.1:8000")
    p.add_argument("--model", default="default")
    p.add_argument("--concurrency", default="1,4,16,32")
    p.add_argument("--num-requests", type=int, default=64)
    p.add_argument("--input-len", type=int, default=256)
    p.add_argument("--output-len", type=int, default=128)
    p.add_argument("--n-repeats", type=int, default=1)
    p.add_argument("--output", default=None)
    p.set_defaults(fn=cmd_bench_serve)

    p = sub.add_parser("embed", help="embed text(s) with the loaded model")
    _add_engine_flags(p)
    p.add_argument("--text", action="append", default=None,
                   help="text to embed (repeatable; default: stdin lines)")
    p.set_defaults(fn=cmd_embed)

    p = sub.add_parser("list", help="list model presets + local checkpoints")
    p.set_defaults(fn=cmd_list)

    p = sub.add_parser("pull", help="download a model from HuggingFace")
    p.add_argument("model")
    p.add_argument("--revision", default="main")
    p.set_defaults(fn=cmd_pull)

    p = sub.add_parser("stop", help="stop a running server")
    p.add_argument("--base-url", default="http://127.0.0.1:8000")
    p.set_defaults(fn=cmd_stop)

    p = sub.add_parser(
        "replay", help="re-run a captured request bundle (repro gate)")
    _add_engine_flags(p)
    p.add_argument("--bundle", required=True, help="bundle JSON path")
    p.set_defaults(fn=cmd_replay)

    p = sub.add_parser(
        "route", help="multi-host DP router over worker engines")
    p.add_argument("--workers", required=True,
                   help="comma-separated worker base URLs "
                        "(one `ferrum serve` per host)")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=9000)
    p.set_defaults(fn=cmd_route)

    args = parser.parse_args(argv)
    try:
        return args.fn(args)
    except FerrumError as e:
        print(f"error: {e.message}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    raise SystemExit(main())
