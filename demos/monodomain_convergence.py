"""Spatial and temporal convergence of the monodomain PDE solver (MMS).

Mirror of reference ``demos/monodomain_convergence.py``: manufactured
solution v = cos(2*pi*x)cos(2*pi*y)sin(t) with matching source; second
order in space (P1) and in time (Crank-Nicolson).
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


def source(x, t):
    pi, cos, sin = jnp.pi, jnp.cos, jnp.sin
    return (
        cos(2 * pi * x[0]) * cos(2 * pi * x[1]) * (cos(t) + 8 * pi**2 * sin(t))
    )


def solve_mms(N: int, dt: float, T: float = 1.0) -> float:
    mesh = meshmod.create_unit_square(None, N, N)
    time = fem.Constant(0.0)
    model = beat.MonodomainModel(time=time, mesh=mesh, M=1.0, I_s=source)
    model.solve((0.0, T), dt=dt)
    form = fem.function_integral(
        model.state,
        lambda x, u: (u - jnp.cos(2 * jnp.pi * x[0]) * jnp.cos(2 * jnp.pi * x[1]) * jnp.sin(T))
        ** 2,
        degree=8,
    )
    return float(np.sqrt(fem.assemble_scalar(form)))


def main(quick: bool = False):
    spatial_Ns = (4, 8, 16) if quick else (4, 8, 16, 32)
    print("Spatial convergence (dt=1e-3, T=1):")
    errors = [solve_mms(N, dt=1e-3) for N in spatial_Ns]
    rates = [np.log2(e1 / e2) for e1, e2 in zip(errors[:-1], errors[1:])]
    print(f"  errors: {errors}")
    print(f"  rates:  {rates} (expected ~2)")

    N_t = 64 if quick else 128
    print(f"Temporal convergence (N={N_t}, Crank-Nicolson):")
    errors_t = [solve_mms(N_t, dt=1 / (2**k)) for k in (2, 3, 4)]
    rates_t = [np.log2(e1 / e2) for e1, e2 in zip(errors_t[:-1], errors_t[1:])]
    print(f"  errors: {errors_t}")
    print(f"  rates:  {rates_t} (expected ~2)")
    return rates, rates_t


if __name__ == "__main__":
    main(quick="--quick" in _sys.argv)
