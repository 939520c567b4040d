"""Structured per-stage timers and metric logging (SURVEY.md §5.1/§5.5).

The reference's only observability is print statements with wall-clock
strings; the rebuild records structured per-stage timings and scalar metric
curves to a JSONL stream, and can dump a JAX profiler trace on demand
(MNESLAM_TRACE_DIR=...).
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict, Optional


class StageTimers:
    """Accumulating named wall-clock timers with JSONL export."""

    def __init__(self, log_path: Optional[str] = None):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.log_path = log_path
        self._fh = None
        if log_path:
            os.makedirs(os.path.dirname(log_path) or ".", exist_ok=True)
            self._fh = open(log_path, "a")

    @contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def log_scalars(self, step: int, scalars: Dict[str, float], kind: str = "metric"):
        if self._fh is not None:
            self._fh.write(json.dumps(
                {"step": step, "kind": kind,
                 **{k: float(v) for k, v in scalars.items()}}) + "\n")
            self._fh.flush()

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": round(self.totals[name], 3),
                "count": self.counts[name],
                "mean_ms": round(1e3 * self.totals[name] / max(self.counts[name], 1), 2),
            }
            for name in self.totals
        }

    def report(self) -> str:
        lines = [f"{'stage':28s} {'count':>7s} {'mean ms':>9s} {'total s':>9s}"]
        for name, s in sorted(self.summary().items()):
            lines.append(f"{name:28s} {s['count']:7d} {s['mean_ms']:9.2f} {s['total_s']:9.2f}")
        return "\n".join(lines)


@contextmanager
def maybe_profile(tag: str):
    """JAX profiler trace when MNESLAM_TRACE_DIR is set."""
    trace_dir = os.environ.get("MNESLAM_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(os.path.join(trace_dir, tag)):
        yield
