"""Profiling / tracing hooks (aux subsystem the reference lacks; SURVEY §5).

Wraps jax.profiler: trace contexts for whole runs, named step annotations
for the hot loops, and a tiny wall-clock timer registry for host-side stages
(decode, ETL). Traces are TensorBoard/Perfetto-compatible.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax

_timers: Dict[str, list] = defaultdict(list)


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Device trace context: ``with trace('/tmp/zns_trace'): step(...)``."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region visible in the device trace timeline."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def timer(name: str) -> Iterator[None]:
    """Host wall-clock timer; aggregate with ``timing_summary()``."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _timers[name].append(time.perf_counter() - t0)


def timing_summary(reset: bool = False) -> Dict[str, Dict[str, float]]:
    out = {}
    for name, vals in _timers.items():
        out[name] = {
            "count": len(vals),
            "total_s": sum(vals),
            "mean_ms": 1000.0 * sum(vals) / max(1, len(vals)),
        }
    if reset:
        _timers.clear()
    return out


def dump_timings(path: str):
    with open(path, "w") as fh:
        json.dump(timing_summary(), fh, indent=2)
