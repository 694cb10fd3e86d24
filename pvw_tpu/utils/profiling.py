"""Observability: timing spans, structured logging, and profiler capture.

The reference has no in-library tracing (SURVEY.md §5 — only criterion and
example wall-clocks); pvw-tpu provides the subsystem the rebuild owes:

- :class:`spans` / :func:`span`: nestable wall-clock spans with structured
  (JSON-able) records, enabled via ``PVW_TPU_TRACE=1`` or programmatically;
- :func:`trace_to`: context manager around ``jax.profiler`` so any region
  can be captured for TensorBoard / xprof;
- :func:`device_summary`: one-line environment fingerprint for reports.

Library code stays silent by default — spans are no-ops unless enabled
(observability in the harness, not the hot path).
"""

from __future__ import annotations

import contextlib
import json
import os
import sys
import time
from dataclasses import dataclass


@dataclass
class SpanRecord:
    name: str
    start: float
    elapsed_s: float
    meta: dict


class _Tracer:
    def __init__(self) -> None:
        from ..config import settings

        self.enabled = settings.trace
        self.records: list[SpanRecord] = []
        self.sink = sys.stderr

    def enable(self, sink=None) -> None:
        self.enabled = True
        if sink is not None:
            self.sink = sink

    def disable(self) -> None:
        self.enabled = False

    def emit(self, rec: SpanRecord) -> None:
        self.records.append(rec)
        print(
            json.dumps(
                {"span": rec.name, "ms": round(rec.elapsed_s * 1000, 3),
                 **rec.meta}
            ),
            file=self.sink,
            flush=True,
        )

    def clear(self) -> list[SpanRecord]:
        out, self.records = self.records, []
        return out


tracer = _Tracer()


@contextlib.contextmanager
def span(name: str, **meta):
    """Wall-clock span; records + emits one JSON line when tracing is on."""
    if not tracer.enabled:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        tracer.emit(SpanRecord(name, t0, time.perf_counter() - t0, meta))


@contextlib.contextmanager
def trace_to(logdir: str):
    """Capture a jax.profiler trace (TensorBoard/xprof format) for the
    enclosed region."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_summary() -> str:
    import jax

    devs = jax.devices()
    kinds = {}
    for d in devs:
        kinds[d.device_kind] = kinds.get(d.device_kind, 0) + 1
    return ", ".join(f"{v}x {k}" for k, v in kinds.items())


def enable_compilation_cache(path: str | None = None) -> None:
    """Turn on JAX's persistent compilation cache for bench harnesses.

    Over the axon tunnel a cold compile of the fused encryption program
    costs 50-700 s (high variance); the on-disk cache roughly halves the
    cold start of a fresh process (the remainder is device program load,
    not compilation). Call BEFORE the first traced computation. Tests do
    not use this (they pin the CPU backend, where compiles are fast).
    """
    import jax

    from ..config import settings

    path = path or settings.jax_cache_dir or os.path.join(
        os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
