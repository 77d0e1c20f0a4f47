"""Profiling & tracing utilities.

Reference:
  * ScopedStopwatch RAII timer under the PROFILING define
    (Util/ScopedStopwatch.cs:6-24).
  * Unity ProfilerMarkers around world rebuild / BVH build phases
    (Raytracer.cs:75-76,1171-1177; BvhNodeData.cs:111-113).
  * MRays/s wall-clock instrumentation via RecordTimeJob timestamps
    (Runtime/Jobs/UtilJobs.cs:78-88).

TPU-native form: host-side scoped timers (these measure dispatch + device
wall time when the body ends with block_until_ready), plus a thin wrapper
over jax.profiler for xprof device traces.
"""

from __future__ import annotations

import contextlib
import logging
import time

import jax

logger = logging.getLogger("raytracing_in_one_weekend_tpu")

# PROFILING "define" (CompileTimeOptions.cs analog): module-level switch;
# timers are no-ops unless enabled.
enabled = False


class ScopedStopwatch:
    """RAII wall-clock timer (ScopedStopwatch.cs:6-24).

    >>> with ScopedStopwatch("BVH build"):
    ...     build()
    """

    def __init__(self, label: str, block_on=None):
        self.label = label
        self.block_on = block_on

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.block_on is not None:
            jax.block_until_ready(self.block_on)
        self.elapsed = time.perf_counter() - self.start
        if enabled:
            logger.info("%s: %.3f ms", self.label, self.elapsed * 1e3)
        return False


@contextlib.contextmanager
def device_trace(logdir: str):
    """xprof device trace around a block (ProfilerMarker analog, but on the
    TPU timeline): view with tensorboard/xprof pointed at `logdir`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up on the xprof timeline
    (jax.profiler.TraceAnnotation passthrough)."""
    return jax.profiler.TraceAnnotation(name)
