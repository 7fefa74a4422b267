"""Lightweight stage timing + optional JAX profiler traces.

The reference's only observability is glog + Ceres' BriefReport
(SURVEY.md §5.1/§5.5); here per-stage wall-clock stats are first-class and
an XLA trace can be captured around any region for xprof.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

__all__ = ["StageTimer", "trace_region"]


class StageTimer:
    """Accumulates per-stage wall time and call counts."""

    def __init__(self):
        self.total: Dict[str, float] = defaultdict(float)
        self.count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.total[name] += time.perf_counter() - t0
            self.count[name] += 1

    def summary(self) -> str:
        rows = sorted(self.total.items(), key=lambda kv: -kv[1])
        return "\n".join(
            f"{name:24s} {tot:8.3f}s  x{self.count[name]:<6d} "
            f"({1e3 * tot / max(self.count[name], 1):7.2f} ms/call)"
            for name, tot in rows)

    def as_dict(self):
        return {k: {"total_s": self.total[k], "count": self.count[k]}
                for k in self.total}


@contextlib.contextmanager
def trace_region(log_dir: str):
    """Capture a JAX profiler trace (view with xprof/tensorboard)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
