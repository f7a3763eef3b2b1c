"""Cellwise ionic ODE stepping + PDE<->ODE transfer adapters.

TPU-native counterpart of reference ``src/beat/odesolver.py``.  The contract
is identical: a user RHS callable ``fun(states, t, parameters, dt) ->
new_states`` stepped over a ``(num_states, num_points)`` array
(``odesolver.py:67-79``), plus adapters that move the voltage row between
the raw state array and PDE-space functions (``odesolver.py:135-354``).

The callable may be plain numpy (host path — exercised by the transfer
semantics tests) or jax-traceable, in which case it is jitted and runs
vectorized on device; the fused splitting solver (``monodomain_solver``)
keeps everything on device under ``lax.scan``.
"""

from __future__ import annotations

import abc
import logging
from dataclasses import dataclass, field
from typing import Any, Callable, NamedTuple

import numpy as np

from . import fem
from .telemetry import BaseMonitor, NullMonitor

EPS = 1e-12
logger = logging.getLogger(__name__)

__all__ = [
    "ODEResults",
    "solve",
    "ODESystemSolver",
    "BaseDolfinODESolver",
    "DolfinODESolver",
    "DolfinMultiODESolver",
    "make_multi_ode",
]


class ODEResults(NamedTuple):
    y: np.ndarray
    t: np.ndarray


def solve(
    fun,
    t_bound: float,
    states,
    V,
    V_index: int,
    dt: float,
    parameters,
    t0: float = 0.0,
    extra: dict | None = None,
):
    """Free-function driver mirroring reference ``odesolver.py:24-43``."""
    if extra is None:
        extra = {}
    i = 0
    t = t0
    while t + dt < t_bound:
        fun(states=states, t=t, parameters=parameters, dt=dt, **extra)
        V[i, :] = states[V_index, :]
        i += 1
        t += dt


@dataclass
class ODESystemSolver:
    """Steps a batched ODE system over all points at once
    (reference ``odesolver.py:46-79``)."""

    fun: Callable
    states: np.ndarray
    parameters: np.ndarray | None
    missing_variables: np.ndarray | None = None
    _kwargs: dict[str, np.ndarray] = field(default_factory=dict)
    monitor: BaseMonitor = field(default_factory=NullMonitor)

    def __post_init__(self):
        if self.missing_variables is not None:
            self._kwargs["missing_variables"] = self.missing_variables

    @property
    def num_points(self) -> int:
        return self.states.shape[1]

    @property
    def num_states(self) -> int:
        return self.states.shape[0]

    def step(self, t0: float, dt: float) -> None:
        with self.monitor.track_time("ode_total_step"):
            with self.monitor.track_time("ode_function_call"):
                updated = self.fun(
                    states=self.states,
                    t=t0,
                    parameters=self.parameters,
                    dt=dt,
                    **self._kwargs,
                )
            with self.monitor.track_time("ode_state_update"):
                self.states[:] = np.asarray(updated)


class BaseDolfinODESolver(abc.ABC):
    """Transfer adapter between raw state arrays and FE functions
    (reference ``odesolver.py:82-132``; name kept for API parity)."""

    v_ode: fem.Function
    v_pde: fem.Function
    _metadata: dict[str, Any] | None = None

    def _initialize_metadata(self):
        if self.v_ode.function_space.element.family == "Quadrature":
            self._metadata = {"quadrature_degree": self.v_ode.function_space.element.degree}
        else:
            self._metadata = None

    @abc.abstractmethod
    def to_dolfin(self) -> None: ...

    @abc.abstractmethod
    def from_dolfin(self) -> None: ...

    def ode_to_pde(self) -> None:
        """Project v_ode (P2/DG/quadrature...) into the PDE space."""
        from .utils import local_project

        local_project(self.v_ode, self.v_pde.function_space, self.v_pde)

    def pde_to_ode(self) -> None:
        """Project v_pde into the ODE space."""
        from .utils import local_project

        local_project(self.v_pde, self.v_ode.function_space, self.v_ode)

    @abc.abstractmethod
    def step(self, t0: float, dt: float) -> None: ...

    @property
    @abc.abstractmethod
    def full_values(self) -> np.ndarray: ...

    @abc.abstractmethod
    def assign_all_states(self, functions: list[fem.Function]) -> None: ...

    @abc.abstractmethod
    def states_to_dolfin(self, names: list[str] | None = None) -> list[fem.Function]: ...


@dataclass
class DolfinODESolver(BaseDolfinODESolver):
    """Single-model adapter (reference ``odesolver.py:135-225``)."""

    v_ode: fem.Function
    v_pde: fem.Function
    init_states: np.ndarray
    parameters: np.ndarray | None
    fun: Callable
    num_states: int
    v_index: int = 0
    missing_variables: np.ndarray | None = None
    num_missing_variables: int = 0
    monitor: BaseMonitor = field(default_factory=NullMonitor)

    def __post_init__(self):
        if np.shape(self.init_states) == self.shape:
            self._values = np.copy(self.init_states)
        else:
            self._values = np.zeros(self.shape)
            self._values.T[:] = self.init_states

        self._ode = ODESystemSolver(
            fun=self.fun,
            states=self._values,
            parameters=self.parameters,
            missing_variables=self.missing_variables,
            monitor=self.monitor,
        )
        self._initialize_metadata()

    def to_dolfin(self) -> None:
        self.v_ode.x.array[:] = self._values[self.v_index, :]

    def from_dolfin(self) -> None:
        self._values[self.v_index, :] = self.v_ode.x.array

    @property
    def values(self) -> np.ndarray:
        return self._values

    @property
    def num_parameters(self) -> int:
        return len(self.parameters)

    @property
    def shape(self) -> tuple[int, int]:
        return (self.num_states, self.num_points)

    @property
    def shape_missing_values(self) -> tuple[int, int]:
        return (self.num_missing_variables, self.num_points)

    @property
    def num_points(self) -> int:
        return self.v_ode.x.array.size

    def step(self, t0: float, dt: float):
        self._ode.step(t0=t0, dt=dt)

    @property
    def full_values(self) -> np.ndarray:
        return self._values

    def assign_all_states(self, functions: list[fem.Function]) -> None:
        num_states = self._values.shape[0]
        assert len(functions) == num_states, "Number of functions must match number of states"
        for index, f in enumerate(functions):
            f.x.array[:] = self._values[index, :]

    def states_to_dolfin(self, names: list[str] | None = None) -> list[fem.Function]:
        V = self.v_ode.function_space
        num_states = self._values.shape[0]
        if names is not None:
            msg = (
                "Number of names must match number of states, got "
                f"{len(names)} names, but number of states is {num_states}"
            )
            assert len(names) == num_states, msg
        else:
            names = [f"state_{i}" for i in range(num_states)]
        functions = [fem.Function(V, name=name) for name in names]
        self.assign_all_states(functions)
        return functions


@dataclass
class DolfinMultiODESolver(BaseDolfinODESolver):
    """Marker-partitioned multi-model adapter
    (reference ``odesolver.py:228-354``): each marker value selects its own
    ionic model / parameters / initial states over the nodes it labels."""

    v_ode: fem.Function
    v_pde: fem.Function
    markers: fem.Function
    init_states: dict[int, np.ndarray]
    parameters: dict[int, np.ndarray]
    fun: dict[int, Callable]
    num_states: dict[int, int]
    v_index: dict[int, int]
    monitor: BaseMonitor = field(default_factory=NullMonitor)

    def __post_init__(self):
        if self.v_ode.x.array.size != self.markers.x.array.size:
            raise RuntimeError("Marker and voltage need to be in the same function space")

        self._marker_values = tuple(self.init_states.keys())
        self._num_points = {}
        self._odes = {}
        self._values = {}
        self._inds = {}

        self._initialize_full_values()

        for marker in self._marker_values:
            where = self.markers.x.array == marker
            self._num_points[marker] = int(where.sum())
            self._inds[marker] = where

            if np.shape(self.init_states[marker]) == self.shape(marker):
                self._values[marker] = np.copy(self.init_states[marker])
            else:
                self._values[marker] = np.zeros(self.shape(marker))
                self._values[marker].T[:] = self.init_states[marker]

            self._odes[marker] = ODESystemSolver(
                fun=self.fun[marker],
                states=self._values[marker],
                parameters=self.parameters[marker],
                monitor=self.monitor,
            )
        self._initialize_metadata()

    def _initialize_full_values(self):
        sizes = tuple(self.num_states.values())
        self._all_states_equal_size = all(s == sizes[0] for s in sizes)
        if self._all_states_equal_size:
            self._full_values = np.zeros((sizes[0], self.markers.x.array.size))

    def to_dolfin(self) -> None:
        arr = self.v_ode.x.array.copy()
        for marker in self._marker_values:
            arr[self._inds[marker]] = self._values[marker][self.v_index[marker], :]
        self.v_ode.x.array[:] = arr

    def from_dolfin(self) -> None:
        arr = self.v_ode.x.array
        for marker in self._marker_values:
            self._values[marker][self.v_index[marker], :] = arr[self._inds[marker]]

    def values(self, marker: int) -> np.ndarray:
        return self._values[marker]

    def num_parameters(self, marker: int) -> int:
        return len(self.parameters[marker])

    def shape(self, marker: int) -> tuple[int, int]:
        return (self.num_states[marker], self._num_points[marker])

    def num_points(self, marker: int) -> int:
        return self._num_points[marker]

    def step(self, t0: float, dt: float):
        with self.monitor.track_time("total_ode_step"):
            for marker, ode in self._odes.items():
                with self.monitor.track_time(f"marker_{marker}_ode_step"):
                    ode.step(t0=t0, dt=dt)

    def assign_all_states(self, functions: list[fem.Function]) -> None:
        num_states = self._values[self._marker_values[0]].shape[0]
        assert len(functions) == num_states, "Number of functions must match number of states"
        for index, f in enumerate(functions):
            for marker in self._marker_values:
                f.x.array[self._inds[marker]] = self._values[marker][index, :]

    def states_to_dolfin(self, names: list[str] | None = None) -> list[fem.Function]:
        V = self.v_ode.function_space
        num_states = self._values[self._marker_values[0]].shape[0]
        if names is not None:
            msg = (
                "Number of names must match number of states, got "
                f"{len(names)} names, but number of states is {num_states}"
            )
            assert len(names) == num_states, msg
        else:
            names = [f"state_{i}" for i in range(num_states)]
        functions = [fem.Function(V, name=name) for name in names]
        self.assign_all_states(functions)
        return functions

    @property
    def full_values(self) -> np.ndarray:
        if not self._all_states_equal_size:
            msg = (
                "Cannot get full values size states are not of equal size. "
                f"Have {self.num_states=}, use .values(marker) instead"
            )
            raise RuntimeError(msg)
        for marker in self._marker_values:
            self._full_values[:, self._inds[marker]] = self._values[marker]
        return self._full_values


def make_multi_ode(
    markers: np.ndarray,
    fun: dict[int, Callable],
    init_states: dict[int, np.ndarray],
    parameters: dict[int, np.ndarray | None],
    v_index: dict[int, int],
    dtype=np.float64,
):
    """Compose marker-partitioned ionic models into ONE jax-traceable step
    for the fused/sharded solvers (``DolfinMultiODESolver`` semantics,
    reference ``odesolver.py:228-354``, but compiler-friendly: no
    boolean-index gather/scatter).

    Every model steps the full node axis on a union state array
    ``[S_max, n]`` and a per-marker mask selects which nodes keep its
    result — nodes outside a model's marker evolve that model's dynamics
    on their own rows but are never read, so the trajectories of the
    marked nodes are exactly the per-marker ones.  Cost: each model runs
    over all nodes (2-3 markers => 2-3x ionic FLOPs), the price of static
    shapes on TPU.

    Returns ``(ode_fun, init_union [S_max, n], masks [nm, n] bool,
    v_index_common)`` where ``ode_fun(states, t, parameters, dt)`` takes
    the (possibly node-sharded) ``masks`` as its ``parameters`` argument —
    per-marker parameter vectors are baked into the closure.

    Models may disagree on their voltage row: each model's rows are stored
    with its voltage swapped to row 0 (the swap is applied around every
    model call), so ``v_index_common`` is always 0 and the solvers read a
    single voltage row regardless of per-model layouts.
    """
    marker_values = tuple(sorted(fun.keys()))
    for d, name in ((init_states, "init_states"), (parameters, "parameters"), (v_index, "v_index")):
        if set(d.keys()) != set(marker_values):
            raise ValueError(f"{name} keys {set(d.keys())} != fun keys {set(marker_values)}")

    markers = np.asarray(markers)
    n = markers.shape[0]
    masks = np.stack([markers == m for m in marker_values])
    sizes, swaps = {}, {}
    init_union = None
    for i, m in enumerate(marker_values):
        init_m = np.asarray(init_states[m], dtype=np.float64)
        S_m = init_m.shape[0]
        sizes[m] = S_m
        swap = np.arange(S_m)
        v_m = int(v_index[m])
        swap[[0, v_m]] = [v_m, 0]  # involution: storage <-> model layout
        swaps[m] = swap
        if init_union is None or S_m > init_union.shape[0]:
            grown = np.zeros((S_m, n))
            if init_union is not None:
                grown[: init_union.shape[0]] = init_union
            init_union = grown
        nodes = masks[i]
        if init_m.ndim == 1:
            init_union[:S_m, nodes] = init_m[swap][:, None]
        else:
            init_union[:S_m, nodes] = init_m[swap][:, nodes]
    S_max = init_union.shape[0]

    import jax.numpy as jnp

    funs = [fun[m] for m in marker_values]
    params = [
        None if parameters[m] is None else jnp.asarray(parameters[m], dtype=dtype)
        for m in marker_values
    ]
    model_sizes = [sizes[m] for m in marker_values]
    model_swaps = [jnp.asarray(swaps[m]) for m in marker_values]
    trivial_swap = [int(v_index[m]) == 0 for m in marker_values]

    def ode_fun(states, t, parameters, dt):
        node_masks = parameters.astype(bool)  # [nm, n_loc]
        out = states
        for i, (f, p, S_m) in enumerate(zip(funs, params, model_sizes)):
            s_model = states[:S_m]
            if not trivial_swap[i]:
                s_model = s_model[model_swaps[i]]
            y = f(states=s_model, t=t, parameters=p, dt=dt)
            if not trivial_swap[i]:
                y = y[model_swaps[i]]
            if S_m < S_max:
                y = jnp.concatenate([y, states[S_m:]], axis=0)
            out = jnp.where(node_masks[i][None, :], y, out)
        return out

    return ode_fun, init_union, masks, 0
