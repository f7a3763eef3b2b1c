"""Splitting-scheme verification: Godunov is first order, Strang second.

Mirror of reference ``demos/verification.py`` (exact ODE propagator at
``:121-126``): the coupled MMS problem with the exact rotation propagator
for the ODE sub-step, dt self-convergence on a fixed mesh so the temporal
orders are visible above the O(h^2) spatial floor.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import fenicsx_beat_tpu as beat
from fenicsx_beat_tpu import fem
from fenicsx_beat_tpu import mesh as meshmod

try:
    import jax.numpy as jnp
except ImportError:  # pragma: no cover
    jnp = np


def ac_func(x, t):
    return 8 * jnp.pi**2 * jnp.cos(2 * jnp.pi * x[0]) * jnp.cos(2 * jnp.pi * x[1]) * jnp.sin(t)


def exact_propagator(states, t, dt, parameters):
    v, s = states
    c, sn = np.cos(dt), np.sin(dt)
    values = np.zeros_like(states)
    values[0] = c * v - sn * s
    values[1] = sn * v + c * s
    return values


def run(mesh, theta: float, dt: float, T: float = 1.0) -> np.ndarray:
    time = fem.Constant(0.0)
    pde = beat.MonodomainModel(time=time, mesh=mesh, M=1.0, I_s=ac_func)
    V_ode = fem.functionspace(mesh, ("P", 1))
    s = fem.Function(V_ode)
    s.interpolate(lambda x: -np.cos(2 * np.pi * x[0]) * np.cos(2 * np.pi * x[1]))
    init_states = np.zeros((2, s.x.array.size))
    init_states[1, :] = s.x.array
    ode = beat.odesolver.DolfinODESolver(
        v_ode=fem.Function(V_ode),
        v_pde=pde.state,
        fun=exact_propagator,
        init_states=init_states,
        parameters=None,
        num_states=2,
        v_index=0,
    )
    solver = beat.MonodomainSplittingSolver(pde=pde, ode=ode, theta=theta)
    solver.solve((0.0, T), dt=dt)
    return np.array(pde.state.x.array)


def main(N: int = 64, quick: bool = False):
    if quick:  # CI smoke: coarser mesh, two dts (rates still visible)
        N = 24
    mesh = meshmod.create_unit_square(None, N, N)
    dts = [1 / 8, 1 / 16] if quick else [1 / 8, 1 / 16, 1 / 32]
    for theta, name, expected in [(1.0, "Godunov", 1.0), (0.5, "Strang", 2.0)]:
        ref = run(mesh, theta, dt=1 / 128 if quick else 1 / 256)
        errors = []
        for dt in dts:
            diff = run(mesh, theta, dt=dt) - ref
            errors.append(float(np.sqrt(np.mean(diff**2))))
        rates = [np.log2(e1 / e2) for e1, e2 in zip(errors[:-1], errors[1:])]
        print(f"{name} (theta={theta}): errors={errors}")
        print(f"  observed rates {rates} (expected ~{expected})")
    return rates


if __name__ == "__main__":
    main(quick="--quick" in _sys.argv)
