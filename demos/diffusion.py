"""Pure diffusion of a stimulus on a unit square (no ionic model).

Mirror of reference ``demos/diffusion.py``: the PDE layer used standalone
via ``MonodomainModel.solve`` (reference ``base_model.py:250-297``) with a
time-windowed corner stimulus; the voltage integral grows during the
stimulus window and is conserved afterwards (pure Neumann diffusion).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import fenicsx_beat_tpu as beat
from fenicsx_beat_tpu import fem
from fenicsx_beat_tpu import mesh as meshmod


def main(N: int = 32, T: float = 2.0, dt: float = 0.01):
    mesh = meshmod.create_unit_square(None, N, N)
    time = fem.Constant(0.0)

    marker = 1
    cells = meshmod.locate_entities(
        mesh, mesh.tdim, lambda x: np.logical_and(x[0] <= 0.5, x[1] <= 0.5)
    )
    tags = meshmod.meshtags(mesh, mesh.tdim, cells, marker)
    dx = beat.stimulation.dx(mesh, subdomain_data=tags)
    expr = beat.stimulation.TimeWindow(amplitude=500.0, start=0.0, duration=0.1)
    I_s = beat.Stimulus(expr=expr, dZ=dx, marker=marker)

    model = beat.MonodomainModel(time=time, mesh=mesh, M=0.01, I_s=I_s, dx=dx)
    res = model.solve((0.0, T), dt=dt)
    assert res.status == beat.base_model.Status.OK

    total = fem.assemble_scalar(fem.function_integral(model.state, lambda x, u: u))
    # expected: amplitude * stim_area * duration = 500 * 0.25 * 0.1 = 12.5
    print(f"Integral of v at T={T}: {total:.4f} (expected 12.5)")
    v = model.state.x.array
    print(f"v range: [{v.min():.3f}, {v.max():.3f}]")
    return res.state


if __name__ == "__main__":
    import sys

    if "--quick" in sys.argv:  # CI smoke (ci.sh)
        main(N=12, T=0.5)
    else:
        main()
