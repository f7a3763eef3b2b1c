"""Operator-splitting solver (Godunov theta=1 / Strang theta=0.5).

TPU-native counterpart of reference ``src/beat/monodomain_solver.py``: the
object-oriented :class:`MonodomainSplittingSolver` replicates the reference
step choreography exactly (``monodomain_solver.py:53-116``) for API parity
and testability.  The performance path is :mod:`.fused` — one jitted
``lax.scan`` over the whole ODE->transfer->PDE->transfer pipeline with zero
host round-trips per step.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Protocol

import numpy as np

from .monodomain_model import MonodomainModel
from .telemetry import BaseMonitor, NullMonitor

logger = logging.getLogger(__name__)
EPS = 1e-12

__all__ = ["ODESolver", "MonodomainSplittingSolver"]


class ODESolver(Protocol):
    def to_dolfin(self) -> None: ...

    def from_dolfin(self) -> None: ...

    def ode_to_pde(self) -> None: ...

    def pde_to_ode(self) -> None: ...

    def step(self, t0: float, dt: float) -> None: ...


@dataclass
class MonodomainSplittingSolver:
    pde: MonodomainModel
    ode: ODESolver
    theta: float = 1.0
    monitor: BaseMonitor = field(default_factory=NullMonitor)

    def __post_init__(self) -> None:
        # initial sync: ODE state array -> ODE-space function -> PDE space
        self.ode.to_dolfin()
        self.ode.ode_to_pde()
        self.pde.assign_previous()

    def solve(self, interval, dt) -> None:
        T0, T = interval
        if dt is None:
            dt = T - T0
        t0 = T0
        t1 = T0 + dt
        while t1 < T + EPS:
            logger.debug(f"Solving on t = ({t0:.2f}, {t1:.2f})")
            self.step((t0, t1))
            t0 = t1
            t1 = t0 + dt

    def step(self, interval) -> None:
        theta = self.theta
        t0, t1 = interval
        logger.debug(f"Stepping from {t0} to {t1} using theta = {theta}")
        dt = t1 - t0
        t = t0 + theta * dt

        with self.monitor.track_time("total_step"):
            with self.monitor.track_time("ode_step"):
                # tentative ODE step over theta*dt
                self.ode.step(t0=t0, dt=theta * dt)

            with self.monitor.track_time("ode_to_dolfin"):
                self.ode.to_dolfin()

            with self.monitor.track_time("ode_to_pde"):
                self.ode.ode_to_pde()

            with self.monitor.track_time("pde_assign_previous_before"):
                self.pde.assign_previous()

            with self.monitor.track_time("pde_step"):
                self.pde.step((t0, t1))

            with self.monitor.track_time("pde_to_ode"):
                self.ode.pde_to_ode()

            with self.monitor.track_time("ode_from_dolfin"):
                self.ode.from_dolfin()

            # Godunov (theta=1): done.  Strang: corrective ODE step.
            if np.isclose(theta, 1.0):
                with self.monitor.track_time("pde_assign_previous_after"):
                    self.pde.assign_previous()
            else:
                logger.debug(
                    f"Corrective ODE step with t0={t:5f} and dt={(1.0 - theta) * dt:.5f}"
                )
                with self.monitor.track_time("corrective_ode_step"):
                    self.ode.step(t, (1.0 - theta) * dt)

                with self.monitor.track_time("corrective_ode_to_dolfin"):
                    self.ode.to_dolfin()

                with self.monitor.track_time("corrective_ode_to_pde"):
                    self.ode.ode_to_pde()

                with self.monitor.track_time("corrective_pde_assign_previous"):
                    self.pde.assign_previous()

        self.monitor.advance_step(t0, t1)
