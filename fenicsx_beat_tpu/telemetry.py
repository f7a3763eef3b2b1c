"""Observability: section timers, linear-solver stats, device traces.

Keeps the reference's monitor strategy pattern (``src/beat/telemetry.py``:
``BaseMonitor`` / ``NullMonitor`` / ``PerformanceMonitor`` injected into the
PDE, ODE and splitting solvers) but is built for the JAX execution model:

* section timings are host wall-clock and therefore only meaningful around
  blocking boundaries — the solvers call ``block_until_ready`` before
  closing a section;
* ``record_ksp`` consumes the in-repo CG solver's result object
  (:class:`~fenicsx_beat_tpu.ops.cg.CGInfo`: ``iterations`` /
  ``residual_norm`` / ``converged``) where the reference reads a live
  ``PETSc.KSP``;
* kernel-level timelines come from ``jax.profiler`` via
  :func:`start_trace` / :func:`stop_trace` / :func:`trace`, the layer the
  reference has no equivalent of;
* "rank 0" gating becomes ``jax.process_index() == 0`` for multi-host runs.

The log/summary text formats are stable output contracts (scripts grep
``PDE step timing step=``; the JSON schema is consumed by the benchmark
postprocessing) and match the reference's.
"""

from __future__ import annotations

import abc
import json
import logging
import time
from collections import defaultdict
from contextlib import contextmanager
from pathlib import Path
from typing import Dict, List, Tuple, Union

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


def _process_index() -> int:
    """This process's rank in a multi-host run; 0 when jax is unavailable."""
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


class BaseMonitor(abc.ABC):
    """Interface the solvers program against; see reference ``telemetry.py:15-27``."""

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
    """Zero-overhead default: every hook is a no-op."""

    @contextmanager
    def track_time(self, name: str):
        yield

    def record_ksp(self, info) -> None:
        pass

    def advance_step(self, t0: float, t1: float) -> None:
        pass


class PerformanceMonitor(BaseMonitor):
    """Accumulating wall-clock + solver-stats monitor.

    Every ``track_time(name)`` section adds into ``self.timings[name]``
    across the whole run; ``record_ksp`` folds per-solve CG stats into
    running totals; ``advance_step`` emits one log line every
    ``log_frequency`` steps. ``display_summary`` / ``save_summary`` render
    the aggregate (process 0 only).
    """

    def __init__(self, log_frequency: int = 1, comm=None):
        self.log_frequency = log_frequency
        self.comm = comm  # accepted for reference signature parity; unused
        self.step_counter = 0
        self.timings: Dict[str, float] = defaultdict(float)

        self.ksp_total_iterations = 0
        self.ksp_max_iterations = 0
        self.ksp_last_iterations = 0
        self.ksp_last_residual_norm = 0.0
        self.ksp_last_converged_reason = 0

    @contextmanager
    def track_time(self, name: str):
        started = time.perf_counter()
        try:
            yield
        finally:
            self.timings[name] += time.perf_counter() - started

    def record_ksp(self, info) -> None:
        """Fold one linear solve's stats into the running aggregate.

        ``info`` is duck-typed: any object exposing ``iterations``,
        ``residual_norm`` and ``converged`` works (the in-repo ``CGInfo``
        does; ``None`` or unrelated objects are ignored).
        """
        iterations = getattr(info, "iterations", None)
        if iterations is None:
            return
        try:
            count = int(iterations)
        except TypeError:
            return
        self.ksp_last_iterations = count
        self.ksp_total_iterations += count
        if count > self.ksp_max_iterations:
            self.ksp_max_iterations = count
        self.ksp_last_residual_norm = float(getattr(info, "residual_norm", 0.0))
        self.ksp_last_converged_reason = int(bool(getattr(info, "converged", False)))

    def advance_step(self, t0: float, t1: float) -> None:
        self.step_counter += 1
        due = self.log_frequency > 0 and self.step_counter % self.log_frequency == 0
        if not due:
            return
        parts = [
            f"PDE step timing step={self.step_counter}",
            f"t=({t0:.5f}, {t1:.5f})",
            f"ksp_iterations={self.ksp_last_iterations}",
            f"ksp_residual_norm={self.ksp_last_residual_norm:.6e}",
            f"ksp_converged_reason={self.ksp_last_converged_reason}",
        ]
        parts.extend(f"{name}={value:.6f}s" for name, value in self.timings.items())
        logger.info(", ".join(parts))

    # -- aggregate rendering -------------------------------------------------

    def _summary_lines(self) -> List[str]:
        rule, half_rule = "=" * 50, "-" * 50
        counters: List[Tuple[str, int]] = [
            ("Total Steps:", self.step_counter),
            ("KSP Total Iterations:", self.ksp_total_iterations),
            ("KSP Max Iterations:", self.ksp_max_iterations),
        ]
        lines = ["\n" + rule, f"{'PERFORMANCE SUMMARY':^50}", rule]
        lines += [f"{label:<23}{value}" for label, value in counters]
        lines += [half_rule, f"{'Metric':<35} | {'Time (s)':>10}", half_rule]
        by_cost = sorted(self.timings.items(), key=lambda kv: kv[1], reverse=True)
        lines += [f"{name:<35} | {seconds:>10.4f}" for name, seconds in by_cost]
        lines.append(rule + "\n")
        return lines

    def display_summary(self) -> None:
        if _process_index() == 0:
            logger.info("\n".join(self._summary_lines()))

    def save_summary(self, filepath: Union[str, Path]) -> None:
        if _process_index() != 0:
            return
        payload = {
            "total_steps": self.step_counter,
            "ksp": {
                "total_iterations": self.ksp_total_iterations,
                "max_iterations": self.ksp_max_iterations,
            },
            "timings": dict(self.timings),
        }
        path = Path(filepath)
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(json.dumps(payload, indent=4))
        logger.info(f"Performance summary saved to {path}")
