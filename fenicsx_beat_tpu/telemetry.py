"""Performance monitors (tracing / profiling subsystem).

TPU-native counterpart of reference ``src/beat/telemetry.py``: the same
strategy-pattern monitor API (``track_time`` context manager, ``record_ksp``,
``advance_step``) is injected into the PDE, ODE and splitting solvers.
Instead of PETSc KSP objects, ``record_ksp`` accepts the in-repo CG solver's
:class:`~fenicsx_beat_tpu.ops.cg.CGInfo` (iterations / residual /
convergence flag).  Timings of jitted sections are wall-clock around
``block_until_ready`` calls; deeper kernel-level profiles come from
``jax.profiler`` (see ``start_trace``/``stop_trace`` helpers).
"""

from __future__ import annotations

import abc
import json
import logging
import time
from contextlib import contextmanager
from pathlib import Path
from typing import Dict, Union

logger = logging.getLogger(__name__)

__all__ = [
    "BaseMonitor",
    "NullMonitor",
    "PerformanceMonitor",
    "start_trace",
    "stop_trace",
    "trace",
]


def start_trace(logdir: Union[str, Path]) -> None:
    """Start a ``jax.profiler`` device trace (kernel-level timeline, viewable
    in Perfetto/TensorBoard) — the deep-profiling layer under the wall-clock
    section timings of :class:`PerformanceMonitor`."""
    import jax

    jax.profiler.start_trace(str(logdir))


def stop_trace() -> None:
    import jax

    jax.profiler.stop_trace()


@contextmanager
def trace(logdir: Union[str, Path]):
    """Context manager around ``start_trace``/``stop_trace``."""
    start_trace(logdir)
    try:
        yield
    finally:
        stop_trace()


class BaseMonitor(abc.ABC):
    @abc.abstractmethod
    @contextmanager
    def track_time(self, name: str):
        yield

    @abc.abstractmethod
    def record_ksp(self, info) -> None:
        pass

    @abc.abstractmethod
    def advance_step(self, t0: float, t1: float) -> None:
        pass


class NullMonitor(BaseMonitor):
    @contextmanager
    def track_time(self, name: str):
        yield

    def record_ksp(self, info) -> None:
        pass

    def advance_step(self, t0: float, t1: float) -> None:
        pass


class PerformanceMonitor(BaseMonitor):
    """Accumulates per-section wall times and linear-solver stats, logging
    them every ``log_frequency`` steps; mirrors reference
    ``telemetry.py:42-136`` (rank gating becomes process-index gating)."""

    def __init__(self, log_frequency: int = 1, comm=None):
        self.log_frequency = log_frequency
        self.comm = comm
        self.step_counter = 0
        self.timings: Dict[str, float] = {}

        self.ksp_total_iterations = 0
        self.ksp_max_iterations = 0
        self.ksp_last_iterations = 0
        self.ksp_last_residual_norm = 0.0
        self.ksp_last_converged_reason = 0

    @property
    def _rank(self) -> int:
        try:
            import jax

            return jax.process_index()
        except Exception:
            return 0

    @contextmanager
    def track_time(self, name: str):
        tic = time.perf_counter()
        try:
            yield
        finally:
            toc = time.perf_counter()
            self.timings[name] = self.timings.get(name, 0.0) + (toc - tic)

    def record_ksp(self, info) -> None:
        """Record stats from a CGInfo (or any object with .iterations /
        .residual_norm / .converged — duck-typed like the PETSc KSP
        accessors in reference ``telemetry.py:67-76``)."""
        try:
            iterations = int(info.iterations)
            self.ksp_last_iterations = iterations
            self.ksp_total_iterations += iterations
            self.ksp_max_iterations = max(self.ksp_max_iterations, iterations)
            self.ksp_last_residual_norm = float(info.residual_norm)
            self.ksp_last_converged_reason = int(bool(info.converged))
        except (AttributeError, TypeError):
            pass

    def advance_step(self, t0: float, t1: float) -> None:
        self.step_counter += 1
        if self.log_frequency <= 0 or self.step_counter % self.log_frequency != 0:
            return
        timing_text = ", ".join(f"{name}={value:.6f}s" for name, value in self.timings.items())
        logger.info(
            f"PDE step timing step={self.step_counter}, "
            f"t=({t0:.5f}, {t1:.5f}), "
            f"ksp_iterations={self.ksp_last_iterations}, "
            f"ksp_residual_norm={self.ksp_last_residual_norm:.6e}, "
            f"ksp_converged_reason={self.ksp_last_converged_reason}, "
            f"{timing_text}",
        )

    def display_summary(self) -> None:
        if self._rank != 0:
            return
        summary = ["\n" + "=" * 50]
        summary.append(f"{'PERFORMANCE SUMMARY':^50}")
        summary.append("=" * 50)
        summary.append(f"Total Steps:           {self.step_counter}")
        summary.append(f"KSP Total Iterations:  {self.ksp_total_iterations}")
        summary.append(f"KSP Max Iterations:    {self.ksp_max_iterations}")
        summary.append("-" * 50)
        summary.append(f"{'Metric':<35} | {'Time (s)':>10}")
        summary.append("-" * 50)
        for name, duration in sorted(self.timings.items(), key=lambda x: x[1], reverse=True):
            summary.append(f"{name:<35} | {duration:>10.4f}")
        summary.append("=" * 50 + "\n")
        logger.info("\n".join(summary))

    def save_summary(self, filepath: Union[str, Path]) -> None:
        if self._rank != 0:
            return
        data = {
            "total_steps": self.step_counter,
            "ksp": {
                "total_iterations": self.ksp_total_iterations,
                "max_iterations": self.ksp_max_iterations,
            },
            "timings": self.timings,
        }
        filepath = Path(filepath)
        filepath.parent.mkdir(parents=True, exist_ok=True)
        with open(filepath, "w") as f:
            json.dump(data, f, indent=4)
        logger.info(f"Performance summary saved to {filepath}")
