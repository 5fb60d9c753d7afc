"""Tracing and profiling.

The reference has no profiling story (SURVEY.md §5.1 — only tqdm bars).
This module provides:
  * StageTimer — hierarchical wall-clock timing of pipeline stages with a
    printed summary (the pipeline orchestrators wrap each stage);
  * trace() — a context manager around jax.profiler for on-demand XLA traces
    (TensorBoard-compatible), enabled via ETUDE_TRACE_DIR or CLI flags;
  * annotate() — jax.profiler.TraceAnnotation pass-through for custom spans.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, List, Optional

import jax

from .logger import logger


class StageTimer:
    """Collects named wall-clock spans and prints a summary table."""

    def __init__(self):
        self.spans: List[Dict] = []

    @contextlib.contextmanager
    def span(self, name: str, nested: bool = False):
        """nested=True marks a span contained in another span's wall time
        (e.g. stages running concurrently under a combined span): it is
        reported but excluded from the summary total."""
        start = time.perf_counter()
        try:
            yield
        finally:
            self.spans.append({
                "name": name,
                "seconds": time.perf_counter() - start,
                "nested": nested,
            })

    def summary(self) -> Dict[str, float]:
        return {s["name"]: s["seconds"] for s in self.spans}

    def print_summary(self, title: str = "Timing") -> None:
        if not self.spans:
            return
        total = sum(s["seconds"] for s in self.spans if not s.get("nested"))
        logger.stage(f"{title} ({total:.2f}s total)")
        for s in self.spans:
            share = 100.0 * s["seconds"] / total if total else 0.0
            name = ("  ∟ " if s.get("nested") else "") + s["name"]
            logger.info(f"{name:<32s} {s['seconds']:>8.2f}s  {share:5.1f}%")


def maybe_span(timer: Optional[StageTimer], name: str):
    """Nested span on `timer`, or a no-op when no timer is threaded through
    (library call sites stay uninstrumented unless the orchestrator asks)."""
    if timer is None:
        return contextlib.nullcontext()
    return timer.span(name, nested=True)


@contextlib.contextmanager
def trace(trace_dir: Optional[str] = None):
    """XLA profiler trace around a block; no-op when no directory is given
    (explicitly or via ETUDE_TRACE_DIR)."""
    trace_dir = trace_dir or os.environ.get("ETUDE_TRACE_DIR")
    if not trace_dir:
        yield
        return
    logger.info(f"profiler trace → {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span visible in profiler traces."""
    return jax.profiler.TraceAnnotation(name)
