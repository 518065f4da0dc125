"""Profiling and tracing (SURVEY.md §5: the reference has only wall-clock
FPS; the TPU-native equivalent is `jax.profiler` traces + phase timers)."""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/bbx-trace"):
    """Capture a jax.profiler trace (view with TensorBoard or Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Wall-clock phase accounting (rollout / update / logging ...)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "total_s": v,
                "mean_ms": v / max(self.counts[k], 1) * 1e3,
                "count": self.counts[k],
            }
            for k, v in self.totals.items()
        }

    def report(self) -> str:
        rows = sorted(self.totals.items(), key=lambda kv: -kv[1])
        total = sum(self.totals.values()) or 1.0
        lines = ["phase timing:"]
        for k, v in rows:
            lines.append(
                f"  {k:<16} {v:8.2f}s  {v / total * 100:5.1f}%  "
                f"({self.counts[k]}x, {v / max(self.counts[k], 1) * 1e3:.1f} ms)"
            )
        return "\n".join(lines)
