"""Open-loop Poisson bench mode (VERDICT r3 #9; ref: ferrum-bench-core
open-loop arrival process, crates/ferrum-bench-core/src/lib.rs:1-40).

The open-loop cell launches requests on a fixed Exp(rate) schedule
regardless of completions, so queueing delay lands in TTFT — checked
here hardware-free on the tiny engine."""

import pytest

from tests.test_engine_e2e import tiny_engine

from ferrum_tpu.bench.bench_engine import run_cell_open_loop


@pytest.fixture(scope="module")
def engine():
    eng = tiny_engine(max_num_seqs=4)
    yield eng
    eng.stop()


@pytest.mark.slow  # 30s Poisson completion sweep
def test_open_loop_cell_completes_all_launched(engine):
    cell = run_cell_open_loop(
        engine, rate_rps=4.0, duration_s=2.0,
        input_len=8, output_len=4, seed=0, warmup=1)
    assert cell["mode"] == "open-loop"
    assert cell["launched"] >= 1
    assert cell["completed"] == cell["launched"]
    assert cell["errors"] == 0
    assert cell["ttft_p50_ms"] > 0.0
    assert cell["output_tok_s"] > 0.0
    # The arrival schedule is deterministic per seed and independent of
    # service rate (open loop): a re-run launches the same count.
    again = run_cell_open_loop(
        engine, rate_rps=4.0, duration_s=2.0,
        input_len=8, output_len=4, seed=0, warmup=0)
    assert again["launched"] == cell["launched"]


def test_open_loop_ttft_grows_with_offered_load(engine):
    # At an offered load far above capacity, queueing delay must show
    # up in p95 TTFT vs a trickle load (the whole point of open loop).
    light = run_cell_open_loop(
        engine, rate_rps=1.0, duration_s=2.0,
        input_len=8, output_len=4, seed=1, warmup=0)
    heavy = run_cell_open_loop(
        engine, rate_rps=50.0, duration_s=2.0,
        input_len=8, output_len=4, seed=1, warmup=0)
    assert heavy["launched"] > light["launched"]
    assert heavy["ttft_p95_ms"] > light["ttft_p95_ms"]
