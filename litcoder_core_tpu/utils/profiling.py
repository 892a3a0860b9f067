"""Tracing / profiling utilities (SURVEY.md §5.1: the reference has none —
only tqdm bars; this is the TPU-native observability tier).

- StageTimer: lightweight per-stage wall-clock accounting with a report.
- trace(): context manager around jax.profiler.trace for TensorBoard-viewable
  device traces.
- annotate(): named TraceAnnotation for marking regions inside a stage.
"""

import logging
import time
from contextlib import contextmanager
from typing import Dict, List, Tuple

logger = logging.getLogger(__name__)


class StageTimer:
    """Accumulates wall-clock per named pipeline stage.

    Usage:
        timer = StageTimer()
        with timer.stage("extract"):
            ...
        with timer.stage("fit"):
            ...
        timer.report()   # logs a table; returns {stage: seconds}
    """

    def __init__(self, sync_fn=None):
        # sync_fn lets callers pass jax.block_until_ready-style barriers so
        # async dispatch doesn't attribute device time to the wrong stage.
        self._sync_fn = sync_fn
        self._stages: List[Tuple[str, float]] = []

    @contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self._sync_fn is not None:
                self._sync_fn()
            self._stages.append((name, time.perf_counter() - t0))

    def totals(self) -> Dict[str, float]:
        out: Dict[str, float] = {}
        for name, dt in self._stages:
            out[name] = out.get(name, 0.0) + dt
        return out

    def report(self) -> Dict[str, float]:
        totals = self.totals()
        total = sum(totals.values()) or 1.0
        for name, dt in sorted(totals.items(), key=lambda kv: -kv[1]):
            logger.info("stage %-24s %8.3fs  (%4.1f%%)", name, dt,
                        100.0 * dt / total)
        logger.info("stage %-24s %8.3fs", "TOTAL", total)
        return totals


@contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Capture a jax.profiler device trace into `log_dir`
    (view with TensorBoard's profile plugin)."""
    import jax

    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region annotation visible in device traces."""
    import jax

    return jax.profiler.TraceAnnotation(name)
