#!/usr/bin/env python
"""Offline analyzer for ferrum-tpu profile JSONL (schema v2).

TPU-native analog of the reference's profile analyzer
(scripts/release/analyze_ferrum_profile.py): consumes the locked
ProfileEvent schema (ferrum_tpu/utils/profile.py) and reports

  * per-event aggregates: count, total, mean, p50, p95, max duration
  * iteration economics: iterations/s, mean occupancy, fraction of
    wall time inside engine.iteration spans (host-loop utilization)
  * compile audit: every engine.compile instant with its site/key —
    any compile after the first request is a warmup hole
  * memory high-water: peak device bytes_in_use / host RSS over the
    run, plus the last snapshot

Usage:
  python tools/analyze_profile.py profile.jsonl [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import sys
from collections import defaultdict
from typing import Any, Dict, List

import numpy as np

EXPECTED_SCHEMA = 2


def load(path: str) -> List[Dict[str, Any]]:
    events = []
    with open(path) as f:
        for i, line in enumerate(f):
            line = line.strip()
            if not line:
                continue
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                print(f"warning: line {i + 1} unparseable, skipped",
                      file=sys.stderr)
                continue
            if ev.get("schema") != EXPECTED_SCHEMA:
                print(f"warning: line {i + 1} schema "
                      f"{ev.get('schema')} != {EXPECTED_SCHEMA}",
                      file=sys.stderr)
            events.append(ev)
    return events


def _pct(xs: List[float], p: float) -> float:
    return float(np.percentile(np.asarray(xs), p)) if xs else 0.0


def analyze(events: List[Dict[str, Any]]) -> Dict[str, Any]:
    by_event: Dict[str, List[Dict]] = defaultdict(list)
    for ev in events:
        by_event[ev.get("event", "?")].append(ev)

    aggregates = {}
    for name, evs in sorted(by_event.items()):
        durs = [e.get("duration_s", 0.0) for e in evs
                if e.get("kind") == "timed_span"]
        aggregates[name] = {
            "count": len(evs),
            "kinds": sorted({e.get("kind", "?") for e in evs}),
            "total_s": float(sum(durs)),
            "mean_ms": (1e3 * sum(durs) / len(durs)) if durs else 0.0,
            "p50_ms": _pct(durs, 50) * 1e3,
            "p95_ms": _pct(durs, 95) * 1e3,
            "max_ms": max(durs, default=0.0) * 1e3,
        }

    # Iteration economics.
    iters = by_event.get("engine.iteration", [])
    iter_info: Dict[str, Any] = {}
    if iters:
        t0 = min(e["t_start"] for e in iters)
        t1 = max(e["t_start"] + e["duration_s"] for e in iters)
        wall = max(t1 - t0, 1e-9)
        busy = sum(e["duration_s"] for e in iters)
        occ = [e["attrs"].get("decode", 0) for e in iters]
        iter_info = {
            "iterations": len(iters),
            "wall_s": wall,
            "iterations_per_s": len(iters) / wall,
            "host_loop_utilization": min(busy / wall, 1.0),
            "mean_decode_occupancy": float(np.mean(occ)) if occ else 0.0,
        }

    # Compile audit: compiles after the first iteration are suspect.
    compiles = by_event.get("engine.compile", [])
    first_iter_t = min((e["t_start"] for e in iters), default=None)
    compile_audit = {
        "total": len(compiles),
        "after_first_iteration": sum(
            1 for c in compiles
            if first_iter_t is not None and c["t_start"] > first_iter_t),
        "sites": sorted({c["attrs"].get("site", "?") for c in compiles}),
    }

    # Memory high-water.
    mems = by_event.get("engine.memory", [])
    mem_info: Dict[str, Any] = {}
    if mems:
        dev = [m["attrs"].get("device_bytes_in_use") for m in mems
               if m["attrs"].get("device_bytes_in_use") is not None]
        rss = [m["attrs"].get("host_rss_bytes") for m in mems
               if m["attrs"].get("host_rss_bytes") is not None]
        mem_info = {
            "snapshots": len(mems),
            "peak_device_bytes": max(dev, default=None),
            "peak_host_rss_bytes": max(rss, default=None),
            "last": mems[-1]["attrs"],
        }

    errors = [e for e in events if e.get("kind") == "error"]
    return {
        "schema": EXPECTED_SCHEMA,
        "n_events": len(events),
        "aggregates": aggregates,
        "iterations": iter_info,
        "compile_audit": compile_audit,
        "memory": mem_info,
        "errors": {"count": len(errors),
                   "samples": [e["attrs"].get("message", "")
                               for e in errors[:5]]},
    }


def render(report: Dict[str, Any]) -> str:
    lines = [f"profile: {report['n_events']} events "
             f"(schema v{report['schema']})"]
    it = report["iterations"]
    if it:
        lines.append(
            f"  iterations: {it['iterations']} over {it['wall_s']:.1f}s "
            f"({it['iterations_per_s']:.1f}/s), host-loop util "
            f"{100 * it['host_loop_utilization']:.0f}%, mean occupancy "
            f"{it['mean_decode_occupancy']:.1f}")
    ca = report["compile_audit"]
    lines.append(f"  compiles: {ca['total']} "
                 f"({ca['after_first_iteration']} after first iteration"
                 f"{' <-- WARMUP HOLE' if ca['after_first_iteration'] else ''})")
    if report["memory"]:
        m = report["memory"]
        pk = m.get("peak_device_bytes")
        lines.append(
            "  memory: "
            + (f"device peak {pk / 2**30:.2f} GiB, " if pk else "")
            + f"host RSS peak "
            f"{(m.get('peak_host_rss_bytes') or 0) / 2**30:.2f} GiB "
            f"({m['snapshots']} snapshots)")
    if report["errors"]["count"]:
        lines.append(f"  ERRORS: {report['errors']['count']} "
                     f"(first: {report['errors']['samples'][:1]})")
    lines.append("  per-event (timed spans):")
    for name, a in report["aggregates"].items():
        if a["total_s"] > 0:
            lines.append(
                f"    {name:<24} n={a['count']:<6} mean "
                f"{a['mean_ms']:.2f}ms p95 {a['p95_ms']:.2f}ms "
                f"max {a['max_ms']:.2f}ms total {a['total_s']:.2f}s")
        else:
            lines.append(f"    {name:<24} n={a['count']}")
    return "\n".join(lines)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--json", default=None, help="also write a JSON report")
    args = ap.parse_args()
    events = load(args.path)
    report = analyze(events)
    print(render(report))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=2)
    # Exit nonzero when the profile shows errors (gate-friendly).
    return 1 if report["errors"]["count"] else 0


if __name__ == "__main__":
    sys.exit(main())
