"""Scoped profiling timers with PROFILING_DATUM-compatible output.

Replaces the reference's CSDSTimer (inc/csds_timer.h, src/csds_timer.cpp):
an RAII scoped timer placed at nearly every function entry, emitting lines

    PROFILING_DATUM("name", "context", ms, "C++")

that the experiment pipeline greps and SQL-aggregates
(scripts/experiments/analyse.sh:16-40). This module emits the same greppable
format (language tag "Python") so any reference post-processing keeps
working, plus optional nesting markers (PFTimerStart/PFTimerEnd, the
TREE_PERF protocol of src/csds_timer.cpp:50-58).

Device-side timing: JAX has no per-launch event clocks like OpenCL
profiling queues (inc/harness.h:79); instead the harness times
``block_until_ready`` walls and can attach ``jax.profiler`` traces for
kernel-level detail.
"""

from __future__ import annotations

import contextlib
import functools
import os
import sys
import time
from typing import Optional, TextIO

_stream: Optional[TextIO] = None
_tree_perf = os.environ.get("SPARSEHARNESS_TPU_TREE_PERF", "0") == "1"


def set_trace_stream(stream: Optional[TextIO]) -> None:
    """Direct PROFILING_DATUM lines somewhere (None → stderr when enabled)."""
    global _stream
    _stream = stream


def _emit(line: str) -> None:
    out = _stream
    if out is None:
        if os.environ.get("SPARSEHARNESS_TPU_TRACE", "0") != "1":
            return
        out = sys.stderr
    out.write(line + "\n")


def report_timing(name: str, context: str, ms: float, lang: str = "Python") -> None:
    """Inject an externally measured duration into the trace stream — the
    analogue of CSDSTimer::ReportTiming for OpenCL event times
    (inc/csds_timer.h:13, inc/harness.h:191)."""
    _emit(f'PROFILING_DATUM("{name}", "{context}", {ms:.6f}, "{lang}")')


class ScopedTimer(contextlib.AbstractContextManager):
    """with ScopedTimer("encode", "sparse_matrix"): ...  — RAII analogue."""

    def __init__(self, name: str, context: str = ""):
        self.name = name
        self.context = context
        self.ms: Optional[float] = None

    def __enter__(self):
        if _tree_perf:
            _emit(f"PFTimerStart({self.name}, {self.context})")
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.ms = (time.perf_counter() - self._t0) * 1e3
        report_timing(self.name, self.context, self.ms)
        if _tree_perf:
            _emit(f"PFTimerEnd({self.name}, {self.context})")
        return False


def timed(context: str = ""):
    """Decorator form — the start_timer(name, ctx) macro analogue
    (inc/csds_timer.h:10)."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            with ScopedTimer(fn.__qualname__, context):
                return fn(*args, **kwargs)

        return wrapper

    return deco
