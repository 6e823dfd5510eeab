"""Profiling / observability hooks (new capability vs the reference, which
has none — SURVEY.md section 5 "Tracing/profiling: none").

- ``trace(dir)``: context manager around ``jax.profiler`` emitting an xplane
  trace viewable in XProf/TensorBoard.
- ``Timer`` / ``timed``: lightweight wall-clock registry for host-side
  phases (meta-fit, refit, acquisition), reportable as one dict.
"""

from __future__ import annotations

import contextlib
import json
import logging
import time
from collections import defaultdict
from typing import Dict

logger = logging.getLogger("scamlgp_tpu")


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Capture a device trace: ``with profiling.trace('/tmp/xplane'): ...``"""
    import jax

    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Accumulating wall-clock timer keyed by phase name."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {k: {"total_s": round(self.totals[k], 4),
                    "count": self.counts[k],
                    "mean_s": round(self.totals[k] / max(self.counts[k], 1),
                                    4)}
                for k in sorted(self.totals)}

    def log(self, level: int = logging.INFO) -> None:
        logger.log(level, "phase timings: %s", json.dumps(self.report()))


#: Process-global default timer (the BO driver records phases here).
GLOBAL_TIMER = Timer()
