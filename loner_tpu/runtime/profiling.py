"""Profiling hooks: jax.profiler traces + wall-clock CSV logs.

TPU-native counterpart of the reference's profiling subsystem
(SURVEY §5.1): ``debug.profile`` wraps the whole run in a trace
(reference loner.py:175-186), ``debug.profile_optimizer`` traces the
keyframe optimization (optimizer.py:158-176), and the lightweight timing
CSVs (timing.csv / track_times.csv / map_times.csv) are written by the
respective modules. Traces land in ``<logdir>/profile/`` and open in
TensorBoard / Perfetto.
"""
from __future__ import annotations

import os
import time
from contextlib import contextmanager
from typing import Optional


class RunProfiler:
    """Whole-run trace (reference's debug.profile)."""

    def __init__(self, log_directory: str, enabled: bool = False) -> None:
        self._enabled = enabled
        self._dir = os.path.join(log_directory, "profile", "trace")
        self._started = False

    def start(self) -> None:
        if not self._enabled or self._started:
            return
        import jax

        os.makedirs(self._dir, exist_ok=True)
        jax.profiler.start_trace(self._dir)
        self._started = True

    def stop(self) -> None:
        if not self._started:
            return
        import jax

        jax.profiler.stop_trace()
        self._started = False


@contextmanager
def optimizer_trace(log_directory: Optional[str], enabled: bool):
    """Scoped trace around one keyframe optimization
    (reference's debug.profile_optimizer)."""
    if not enabled or log_directory is None:
        yield
        return
    import jax

    trace_dir = os.path.join(log_directory, "profile", "optimizer")
    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        yield


class IterationTimer:
    """its/sec reporting like the reference's per-KF prints
    (optimizer.py:176,189)."""

    def __init__(self) -> None:
        self._t0 = time.time()

    def report(self, num_iterations: int) -> str:
        elapsed = time.time() - self._t0
        per = elapsed / max(num_iterations, 1)
        return (
            f"Elapsed Time: {elapsed:.3f}. Per Iteration: {per:.4f}, "
            f"Its/Sec: {1.0 / max(per, 1e-9):.2f}"
        )
