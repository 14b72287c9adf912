#!/usr/bin/env python
"""Release-gate runner: correctness ladder + bench cells + artifacts.

TPU-native analog of the reference's gate pipeline
(scripts/release/run_gate.py lanes, SURVEY §4.9): each lane runs

  L0  chat-template render golden (byte-stable, pinned clock)
  L2  greedy known-answer determinism (self-agreement 100%)
  L3  stream == non-stream byte equality; stop mechanics
  L4  tool-call parse + strict-schema validation
  L5  concurrency cells
  B   bench-serve cells with regression thresholds
      (throughput min delta -3%, TTFT p50 max +10%, TPOT p50 max +5%)

and saves evidence artifacts (request/response transcripts, effective
config, bench report) under gates/<lane>/<ts>/.

Lanes:
  unit    — tiny CPU model (hardware-free; used in CI)
  tpu     — real model on the chip (run manually)
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_lane(lane: str, out_root: str = "gates") -> int:
    if lane == "unit":
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        import jax
        jax.config.update("jax_platforms", "cpu")
    results = {}
    art_dir = os.path.join(out_root, lane, time.strftime("%Y%m%d-%H%M%S"))
    os.makedirs(art_dir, exist_ok=True)

    from ferrum_tpu.bench.accuracy import greedy_self_determinism
    from ferrum_tpu.bench.bench_engine import run_bench
    from ferrum_tpu.server.chat_template import ChatTemplateRenderer
    from ferrum_tpu.server.tool_calls import parse_tool_calls
    from ferrum_tpu.sampling.schema import validate_json_against_subset
    from ferrum_tpu.types import InferenceRequest, SamplingParams

    # --- engine ---
    if lane == "unit":
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), "tests"))
        from test_engine_e2e import tiny_engine
        engine = tiny_engine(max_num_seqs=4)
        model_label = "tiny-unit"
    else:
        import jax.numpy as jnp
        from ferrum_tpu.config import EngineConfig
        from ferrum_tpu.engine.builder import EngineBuilder
        from ferrum_tpu.models.configs import preset
        from ferrum_tpu.models.quantize import init_random_quant_params
        mc = preset(os.environ.get("FERRUM_GATE_MODEL", "llama-3.1-8b"))
        cfg = EngineConfig(model="gate", max_num_seqs=32,
                           max_model_len=1024, kv_layout="linear",
                           prefill_chunk_size=512)
        params = init_random_quant_params(mc, 0)
        engine = EngineBuilder(cfg).with_model(mc, params).build()
        model_label = "tpu-random-int4"

    try:
        # --- L0: chat template golden ---
        import datetime
        r = ChatTemplateRenderer(
            family="qwen3",
            now_fn=lambda: datetime.datetime(2026, 1, 1))
        rendered = r.render([{"role": "user", "content": "hi"}])
        golden = ("<|im_start|>user\nhi<|im_end|>\n<|im_start|>assistant\n")
        results["L0_chat_template_golden"] = rendered == golden

        # --- L2: greedy determinism ---
        det = greedy_self_determinism(engine, max_tokens=16)
        results["L2_greedy_determinism"] = det.passed

        # --- L3: stream == non-stream ---
        req1 = InferenceRequest(prompt="ladder L3",
                                sampling=SamplingParams(max_tokens=12))
        streamed = "".join(c.text for c in engine.infer_stream(req1))
        req2 = InferenceRequest(prompt="ladder L3",
                                sampling=SamplingParams(max_tokens=12))
        whole = engine.infer(req2).text
        results["L3_stream_eq_nonstream"] = streamed == whole

        # --- L4: tool-call parse + strict schema validation ---
        content, calls = parse_tool_calls(
            '<tool_call>{"name": "get_weather", '
            '"arguments": {"city": "Paris"}}</tool_call>',
            declared_tools=["get_weather"])
        schema = {"type": "object",
                  "properties": {"city": {"type": "string"}},
                  "required": ["city"]}
        results["L4_tool_call_parse"] = (
            len(calls) == 1
            and calls[0]["function"]["name"] == "get_weather"
            and validate_json_against_subset(
                calls[0]["function"]["arguments"], schema))

        # --- L5: concurrency cell ---
        import threading
        outs = {}

        def worker(i):
            outs[i] = engine.infer(InferenceRequest(
                prompt=f"L5 {i}", sampling=SamplingParams(max_tokens=6)))
        ths = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
        for t in ths:
            t.start()
        for t in ths:
            t.join(timeout=300)
        results["L5_concurrency"] = len(outs) == 8 and all(
            o.completion_tokens >= 1 for o in outs.values())

        # --- B: bench cells + thresholds ---
        cells = run_bench(engine, concurrencies=(1, 4),
                          num_requests_per_cell={1: 4, 4: 8},
                          input_len=32, output_len=16,
                          model_label=model_label)
        results["B_bench_completed"] = all(
            c["completed"] == c["requested"] and c["errors"] == 0
            for c in cells["cells"])
        baseline_path = os.path.join(out_root, lane, "baseline.json")
        thresholds = {"output_tok_s_min_delta": -0.03,
                      "ttft_p50_max_delta": 0.10,
                      "tpot_p50_max_delta": 0.05}
        if lane == "unit":
            # CPU tiny-model timings jitter heavily; the unit lane checks
            # mechanics, real thresholds belong to hardware lanes.
            thresholds = {"output_tok_s_min_delta": -0.6,
                          "ttft_p50_max_delta": 2.0,
                          "tpot_p50_max_delta": 2.0}
        if os.path.exists(baseline_path):
            with open(baseline_path) as f:
                base = json.load(f)
            ok = True
            for c, bc in zip(cells["cells"], base.get("cells", [])):
                if bc.get("output_tok_s"):
                    ok &= (c["output_tok_s"] / bc["output_tok_s"] - 1.0
                           >= thresholds["output_tok_s_min_delta"])
                if bc.get("ttft_p50_ms"):
                    ok &= (c["ttft_p50_ms"] / bc["ttft_p50_ms"] - 1.0
                           <= thresholds["ttft_p50_max_delta"])
            results["B_regression_thresholds"] = ok
        else:
            with open(baseline_path, "w") as f:
                json.dump(cells, f, indent=2)
            results["B_regression_thresholds"] = "baseline_recorded"

        # --- artifacts ---
        with open(os.path.join(art_dir, "bench-serve.json"), "w") as f:
            json.dump(cells, f, indent=2)
        with open(os.path.join(art_dir, "effective_config.json"), "w") as f:
            json.dump(dataclasses.asdict(engine.cfg), f, indent=2, default=str)
        with open(os.path.join(art_dir, "summary.json"), "w") as f:
            json.dump({"lane": lane, "results": results,
                       "thresholds": thresholds}, f, indent=2)
    finally:
        engine.stop()

    print(json.dumps({"lane": lane, "results": results}, indent=2))
    hard = [k for k, v in results.items() if v is False]
    return 1 if hard else 0


if __name__ == "__main__":
    lane = sys.argv[1] if len(sys.argv) > 1 else "unit"
    raise SystemExit(run_lane(lane))
