"""Tracing / profiling / debug hooks (SURVEY.md §5 aux subsystems).

The reference has only epoch-time prints; here: jax.profiler trace context
(TensorBoard-compatible), a per-step timer with JSONL export, and a NaN-check
mode (jax_debug_nans) as the race/sanitizer equivalent for a functional
runtime.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enable: bool = True) -> Iterator[None]:
    """NaN-fail-fast mode (the functional runtime's sanitizer)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


class StepTimer:
    """Wall-clock step timing with blocking, JSONL-exportable."""

    def __init__(self, jsonl_path: Optional[str] = None):
        self.records: List[Dict] = []
        self.jsonl_path = jsonl_path

    @contextlib.contextmanager
    def step(self, name: str, **meta) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        rec = {"name": name, "seconds": dt, **meta}
        self.records.append(rec)
        if self.jsonl_path:
            from bbbp_tpu.reporting.metrics_io import append_jsonl

            append_jsonl(self.jsonl_path, rec)

    def timed(self, name: str, fn, *args, block: bool = True, **meta):
        t0 = time.perf_counter()
        out = fn(*args)
        if block:
            out = jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        rec = {"name": name, "seconds": dt, **meta}
        self.records.append(rec)
        if self.jsonl_path:
            from bbbp_tpu.reporting.metrics_io import append_jsonl

            append_jsonl(self.jsonl_path, rec)
        return out

    def summary(self) -> Dict[str, float]:
        out: Dict[str, List[float]] = {}
        for r in self.records:
            out.setdefault(r["name"], []).append(r["seconds"])
        return {k: sum(v) / len(v) for k, v in out.items()}
