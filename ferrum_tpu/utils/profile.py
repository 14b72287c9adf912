"""Locked structured profile events (JSONL) + global sink.

TPU-native analog of the reference's profile-event pipeline
(crates/ferrum-bench-core/src/profile.rs `configure_global_profile`/
`global_profile`; product schema ferrum-types/src/
observability_profile.rs:10-45): schema v1 events with entrypoint,
sampled at a configurable rate, appended to a JSONL sink. Engine/runner
hot paths emit into it; offline analyzers consume it.
"""

from __future__ import annotations

import json
import os
import random
import threading
import time
from dataclasses import asdict, dataclass, field
from typing import Any, Dict, Optional

SCHEMA_VERSION = 1


@dataclass
class ProfileEvent:
    event: str                      # e.g. "engine.iteration", "decode.step"
    entrypoint: str                 # run | serve | bench_serve | synthetic
    t_start: float
    duration_s: float
    attrs: Dict[str, Any] = field(default_factory=dict)
    schema: int = SCHEMA_VERSION


class ProfileSink:
    def __init__(self, path: Optional[str], entrypoint: str = "synthetic",
                 sample_rate: float = 0.01, seed: int = 0):
        self.path = path
        self.entrypoint = entrypoint
        self.sample_rate = sample_rate
        self._rng = random.Random(seed)
        self._lock = threading.Lock()
        self._fh = open(path, "a") if path else None
        self.events_emitted = 0
        self.events_sampled_out = 0

    def emit(self, event: str, duration_s: float,
             attrs: Optional[Dict[str, Any]] = None,
             force: bool = False) -> None:
        if self._fh is None:
            return
        if not force and self._rng.random() > self.sample_rate:
            self.events_sampled_out += 1
            return
        ev = ProfileEvent(event=event, entrypoint=self.entrypoint,
                          t_start=time.time() - duration_s,
                          duration_s=duration_s, attrs=attrs or {})
        with self._lock:
            self._fh.write(json.dumps(asdict(ev)) + "\n")
            self._fh.flush()
            self.events_emitted += 1

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None


_global_lock = threading.Lock()
_global_sink: Optional[ProfileSink] = None


def configure_global_profile(path: Optional[str],
                             entrypoint: str = "synthetic",
                             sample_rate: float = 0.01) -> ProfileSink:
    global _global_sink
    with _global_lock:
        if _global_sink is not None:
            _global_sink.close()
        _global_sink = ProfileSink(path, entrypoint, sample_rate)
        return _global_sink


def global_profile() -> Optional[ProfileSink]:
    return _global_sink


def emit(event: str, duration_s: float,
         attrs: Optional[Dict[str, Any]] = None, force: bool = False) -> None:
    sink = _global_sink
    if sink is not None:
        sink.emit(event, duration_s, attrs, force)
