"""Profiling / tracing subsystem.

The reference has no profiling beyond wall-clock timing (SURVEY §5); this is a
first-class TPU addition: ``jax.profiler`` trace capture plus lightweight
named phase timers that block on async dispatch so times are real.
"""

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax


__all__ = ["Profiler", "trace", "annotate"]


@contextlib.contextmanager
def trace(log_dir: str, *, create_perfetto_link: bool = False):
    """Capture a device trace viewable in TensorBoard/Perfetto.

    Usage::

        with rlaopt_tpu.utils.trace("/tmp/rlaopt_trace"):
            model.solve(...)
    """
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named annotation visible in profiler traces (``TraceAnnotation``)."""
    return jax.profiler.TraceAnnotation(name)


class Profiler:
    """Accumulating named phase timer.

    ``block=True`` inserts a ``block_until_ready`` on exit of each phase so
    wall-clock times attribute async device work to the right phase.
    """

    def __init__(self, block: bool = True):
        self.block = block
        self.times: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, result=None):
        t0 = time.perf_counter()
        out = {}
        try:
            yield out
        finally:
            if self.block:
                sync_on = out.get("sync", result)
                if sync_on is not None:
                    jax.block_until_ready(sync_on)
            self.times[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, dict]:
        return {
            k: {"total_s": self.times[k], "count": self.counts[k]}
            for k in self.times
        }

    def reset(self) -> None:
        self.times.clear()
        self.counts.clear()
