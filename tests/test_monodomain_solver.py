"""Splitting-solver MMS tests — mirror of reference
``tests/test_monodomain_solver.py``: coupled ODE+PDE with exact harmonic
pair solution; error thresholds and convergence rates across ODE spaces."""

import jax.numpy as jnp
import numpy as np
import pytest

import fenicsx_beat_tpu as beat
from fenicsx_beat_tpu import fem
from fenicsx_beat_tpu import mesh as meshmod


def v_exact_func(x, t):
    return np.cos(2 * np.pi * x[0]) * np.cos(2 * np.pi * x[1]) * np.sin(t)


def s_exact_func(x, t):
    return -np.cos(2 * np.pi * x[0]) * np.cos(2 * np.pi * x[1]) * np.cos(t)


def ac_func(x, t):
    return 8 * jnp.pi**2 * jnp.cos(2 * jnp.pi * x[0]) * jnp.cos(2 * jnp.pi * x[1]) * jnp.sin(t)


def simple_ode_forward_euler(states, t, dt, parameters):
    v, s = states
    values = np.zeros_like(states)
    values[0] = v - s * dt
    values[1] = s + v * dt
    return values


def _error(state, t):
    """L2 error vs the exact solution evaluated at time ``t``.

    Faithful to the reference test, which builds the exact expression from
    the ``time`` Constant — after the final step that Constant holds
    ``t0 + theta*dt`` (the last PDE theta-point), not T.  Pass
    ``float(solver.pde.time.value)``."""
    form = fem.function_integral(
        state,
        lambda x, u: (u - jnp.cos(2 * jnp.pi * x[0]) * jnp.cos(2 * jnp.pi * x[1]) * jnp.sin(t))
        ** 2,
        degree=8,
    )
    return np.sqrt(fem.assemble_scalar(form))


def _make_solver(mesh, odespace, theta=1.0, dt_default=None):
    time = fem.Constant(0.0)
    pde = beat.MonodomainModel(time=time, mesh=mesh, M=1.0, I_s=ac_func)

    V_ode = beat.utils.space_from_string(odespace, mesh, dim=1)
    v_ode = fem.Function(V_ode)

    s = fem.Function(V_ode)
    s.interpolate(lambda x: s_exact_func(x, 0.0))

    init_states = np.zeros((2, s.x.array.size))
    init_states[1, :] = s.x.array

    ode = beat.odesolver.DolfinODESolver(
        v_ode=v_ode,
        v_pde=pde.state,
        fun=simple_ode_forward_euler,
        init_states=init_states,
        parameters=None,
        num_states=2,
        v_index=0,
    )
    return beat.MonodomainSplittingSolver(pde=pde, ode=ode, theta=theta)


@pytest.mark.parametrize("odespace", ["P_1", "P_2", "DG_1"])
def test_monodomain_splitting_analytic(odespace):
    N = 50
    dt = 0.01
    T = 1.0
    mesh = meshmod.create_unit_square(None, N, N)
    solver = _make_solver(mesh, odespace)
    solver.solve((0.0, T), dt=dt)
    E = _error(solver.pde.state, float(solver.pde.time.value))
    print("Error: ", E, odespace)
    assert E < 0.002


@pytest.mark.parametrize("odespace", ["CG_1", "CG_2", "DG_1"])
def test_monodomain_splitting_spatial_convergence(odespace):
    dt = 0.001
    T = 1.0  # reference horizon (tests/test_monodomain_solver.py spatial sweep)
    errors = []
    Ns = [2**level for level in range(3, 6)]
    for N in Ns:
        mesh = meshmod.create_unit_square(None, N, N)
        solver = _make_solver(mesh, odespace, theta=1.0)
        solver.solve((0.0, T), dt=dt)
        errors.append(_error(solver.pde.state, float(solver.pde.time.value)))
    rates = [np.log(e1 / e2) / np.log(2) for e1, e2 in zip(errors[:-1], errors[1:])]
    cvg_rate = sum(rates) / len(rates)
    assert cvg_rate > 1.85, (rates, errors)


@pytest.mark.parametrize("theta", [1.0])
@pytest.mark.parametrize("odespace", ["CG_1", "DG_1"])
def test_monodomain_splitting_temporal_convergence(theta, odespace):
    T = 1.0
    N = 150
    mesh = meshmod.create_unit_square(None, N, N)
    errors = []
    dts = [1.0 / (2**level) for level in range(3, 6)]
    for dt in dts:
        solver = _make_solver(mesh, odespace, theta=theta)
        solver.solve((0.0, T), dt=dt)
        errors.append(_error(solver.pde.state, float(solver.pde.time.value)))
    rates = [np.log2(e1 / e2) for e1, e2 in zip(errors[:-1], errors[1:])]
    cvg_rate = sum(rates) / len(rates)
    print(rates, odespace, theta)
    assert cvg_rate > 1.0, (rates, errors)


def test_monodomain_splitting_strang_second_order():
    """Strang (theta=0.5) verification — second-order in dt.

    Mirrors the reference's verification demo (``demos/verification.py``,
    exact ODE propagator), using the exact rotation propagator for the
    harmonic (v, s) pair so the ODE sub-step is error-free."""

    def exact_propagator(states, t, dt, parameters):
        v, s = states
        c, sn = np.cos(dt), np.sin(dt)
        values = np.zeros_like(states)
        values[0] = c * v - sn * s
        values[1] = sn * v + c * s
        return values

    T = 1.0
    N = 64
    mesh = meshmod.create_unit_square(None, N, N)

    def run(dt):
        time = fem.Constant(0.0)
        pde = beat.MonodomainModel(time=time, mesh=mesh, M=1.0, I_s=ac_func)
        V_ode = fem.functionspace(mesh, ("P", 1))
        v_ode = fem.Function(V_ode)
        s = fem.Function(V_ode)
        s.interpolate(lambda x: s_exact_func(x, 0.0))
        init_states = np.zeros((2, s.x.array.size))
        init_states[1, :] = s.x.array
        ode = beat.odesolver.DolfinODESolver(
            v_ode=v_ode,
            v_pde=pde.state,
            fun=exact_propagator,
            init_states=init_states,
            parameters=None,
            num_states=2,
            v_index=0,
        )
        solver = beat.MonodomainSplittingSolver(pde=pde, ode=ode, theta=0.5)
        solver.solve((0.0, T), dt=dt)
        return np.array(solver.pde.state.x.array)

    # self-convergence against a fine-dt run on the same mesh, so the O(h^2)
    # spatial floor cancels and the pure Strang temporal order is visible
    ref = run(1.0 / 64)
    errors = []
    dts = [1.0 / (2**level) for level in range(2, 5)]
    for dt in dts:
        diff = run(dt) - ref
        errors.append(float(np.sqrt(np.mean(diff**2))))
    rates = [np.log2(e1 / e2) for e1, e2 in zip(errors[:-1], errors[1:])]
    cvg_rate = sum(rates) / len(rates)
    print("strang rates", rates, errors)
    assert cvg_rate > 1.7, (rates, errors)
