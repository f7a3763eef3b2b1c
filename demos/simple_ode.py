"""Solving a simple ODE system with the batched ODE solver.

Mirror of reference ``demos/simple_ode.py``: the harmonic pair
v' = -s, s' = v stepped over several points at once with the free
``odesolver.solve`` driver, compared against the exact solution.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from time import perf_counter

import numpy as np

import fenicsx_beat_tpu as beat


def simple_ode_forward_euler(states, t, dt, parameters):
    v, s = states
    states[0] = v - s * dt
    states[1] = s + v * dt


def main(quick: bool = False):  # noqa: ARG001 - already seconds-fast
    num_points = 5
    num_states = 2
    states = np.zeros((num_states, num_points))
    states[1, :] = np.linspace(0, 1, num_points)
    amplitudes = states[1, :].copy()

    dt = 0.01
    t_bound = 20.0
    t0 = 0.0
    V_index = 0

    nT = int((t_bound - t0) / dt) - 1
    V = np.zeros((nT, num_points))

    tic = perf_counter()
    beat.odesolver.solve(
        fun=simple_ode_forward_euler,
        t_bound=t_bound,
        states=states,
        V=V,
        V_index=V_index,
        dt=dt,
        parameters=None,
        t0=t0,
    )
    print(f"Elapsed time: {perf_counter() - tic:.4f} s")

    t = t0 + dt * np.arange(1, V.shape[0] + 1)
    exact = -np.outer(np.sin(t), amplitudes)
    err = np.abs(V - exact).max()
    print(f"Max error vs exact solution: {err:.4e} (forward Euler, dt={dt})")

    try:
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots()
        for i in range(num_points):
            ax.plot(t, V[:, i], label=f"s0={amplitudes[i]:.2f}")
        ax.legend()
        fig.savefig("simple_ode.png")
        print("Saved simple_ode.png")
    except ImportError:
        pass
    return err


if __name__ == "__main__":
    main(quick="--quick" in _sys.argv)
