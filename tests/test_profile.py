"""Observability product: locked profile schema + detail gating +
engine emission + analyzer round-trip (VERDICT r3 missing #6; ref:
crates/ferrum-types/src/observability_profile.rs:10-45 schema lock,
crates/ferrum-cli/src/observability_product.rs wiring,
scripts/release/analyze_ferrum_profile.py analyzer)."""

import dataclasses
import json
import sys
from pathlib import Path

import pytest

from ferrum_tpu.utils import profile as prof

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
import analyze_profile  # noqa: E402


# ---------------------------------------------------------------------------
# Schema lock: these field names/vocabularies are product API. If this
# test fails you MUST bump SCHEMA_VERSION and update the analyzer.
# ---------------------------------------------------------------------------

def test_schema_is_locked():
    fields = [f.name for f in dataclasses.fields(prof.ProfileEvent)]
    assert fields == ["event", "entrypoint", "kind", "status",
                      "t_start", "duration_s", "attrs", "schema"]
    assert prof.SCHEMA_VERSION == 2
    assert prof.KINDS == ("instant", "timed_span", "resource",
                          "memory", "error")
    assert prof.STATUSES == ("ok", "failure", "diagnostic_only")
    assert prof.DETAILS == ("off", "basic", "debug", "full")
    assert analyze_profile.EXPECTED_SCHEMA == prof.SCHEMA_VERSION


def test_parse_vocabularies():
    assert prof.parse_entrypoint("bench-serve") == "bench_serve"
    assert prof.parse_entrypoint("SERVE") == "serve"
    assert prof.parse_entrypoint("nope") is None
    assert prof.parse_detail("Debug".lower()) == "debug"
    assert prof.parse_detail("verbose") is None


# ---------------------------------------------------------------------------
# Detail gating
# ---------------------------------------------------------------------------

def _sink(tmp_path, detail, rate=1.0):
    return prof.ProfileSink(str(tmp_path / f"p_{detail}.jsonl"),
                            entrypoint="synthetic", sample_rate=rate,
                            detail=detail)


def _read(path):
    return [json.loads(x) for x in open(path) if x.strip()]


def test_detail_off_emits_nothing(tmp_path):
    s = _sink(tmp_path, "off")
    s.emit("engine.iteration", 0.01)
    s.emit_error("error", "boom")
    s.close()
    assert _read(s.path) == []


def test_detail_basic_gates_debug_events(tmp_path):
    s = _sink(tmp_path, "basic")
    s.emit("engine.iteration", 0.01)          # basic event: kept
    s.emit("window.dispatch", 0.01)           # debug event: gated
    s.emit_error("error", "boom")             # errors always kept
    s.emit_memory()                           # memory always kept
    s.close()
    evs = _read(s.path)
    assert [e["event"] for e in evs] == ["engine.iteration", "error",
                                         "engine.memory"]
    assert s.events_detail_gated == 1
    err = evs[1]
    assert err["kind"] == "error" and err["status"] == "failure"
    assert err["attrs"]["message"] == "boom"


def test_detail_debug_admits_window_spans(tmp_path):
    s = _sink(tmp_path, "debug")
    s.emit("window.dispatch", 0.002, {"steps": 8})
    s.emit("sched.decision", 0.0, kind="instant", force=True)
    s.close()
    assert [e["event"] for e in _read(s.path)] == ["window.dispatch",
                                                   "sched.decision"]


def test_full_forces_sample_rate_one(tmp_path):
    s = _sink(tmp_path, "full", rate=0.0)
    for _ in range(10):
        s.emit("anything.at.all", 0.001)
    s.close()
    assert len(_read(s.path)) == 10


def test_sampling_gates_spans_but_not_forced(tmp_path):
    s = _sink(tmp_path, "basic", rate=0.0)
    for _ in range(10):
        s.emit("engine.iteration", 0.001)
    s.emit("engine.iteration", 0.001, force=True)
    s.close()
    assert len(_read(s.path)) == 1
    assert s.events_sampled_out == 10


def test_memory_snapshot_has_host_rss():
    snap = prof.snapshot_memory()
    assert snap.get("host_rss_bytes", 0) > 0


def test_separate_memory_sink(tmp_path):
    mp = str(tmp_path / "mem.jsonl")
    s = prof.ProfileSink(str(tmp_path / "p.jsonl"), detail="basic",
                         memory_path=mp)
    s.emit("engine.iteration", 0.01, force=True)
    s.emit_memory()
    s.close()
    assert [e["event"] for e in _read(s.path)] == ["engine.iteration"]
    assert [e["event"] for e in _read(mp)] == ["engine.memory"]


# ---------------------------------------------------------------------------
# Engine emission + analyzer round trip (hardware-free)
# ---------------------------------------------------------------------------

def test_engine_emits_and_analyzer_reports(tmp_path):
    from tests.test_engine_e2e import tiny_engine
    from ferrum_tpu.types import InferenceRequest, SamplingParams

    path = str(tmp_path / "engine_profile.jsonl")
    prof.configure_global_profile(path, entrypoint="serve",
                                  sample_rate=1.0, detail="debug")
    try:
        eng = tiny_engine()
        try:
            eng.infer(InferenceRequest(
                prompt_token_ids=[1, 2, 3, 4],
                sampling=SamplingParams(temperature=0.0, max_tokens=4,
                                        ignore_eos=True)))
        finally:
            eng.stop()
    finally:
        prof.configure_global_profile(None)

    events = analyze_profile.load(path)
    names = {e["event"] for e in events}
    assert "engine.iteration" in names
    assert "engine.compile" in names          # build compiles surfaced
    report = analyze_profile.analyze(events)
    assert report["n_events"] == len(events) > 0
    assert report["compile_audit"]["total"] >= 1
    assert report["iterations"]["iterations"] >= 1
    text = analyze_profile.render(report)
    assert "engine.iteration" in text and "compiles:" in text
