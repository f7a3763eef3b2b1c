"""Premature ventricular complex (PVC) in a heterogeneous 1D cable.

Mirror of reference ``demos/pvc.py`` (setup after Zhang et al. 2021): a
200-cell TP06 cable with a central region of prolonged repolarization; an
S1 stimulus at the left end followed by a premature S2 in the
heterogeneous region probes unidirectional block / re-excitation.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
from pathlib import Path

import numpy as np

import fenicsx_beat_tpu as beat
from fenicsx_beat_tpu import fem
from fenicsx_beat_tpu import mesh as meshmod
from fenicsx_beat_tpu.models import tentusscher_panfilov_2006 as tp06
from fenicsx_beat_tpu.units import ureg


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-T", type=float, default=60.0, help="end time (ms)")
    parser.add_argument("--dt", type=float, default=0.05)
    parser.add_argument("--s2-start", type=float, default=30.0)
    parser.add_argument("-o", "--outdir", type=Path, default=Path("results-pvc"))
    parser.add_argument("--quick", action="store_true", help="CI smoke: early S2, short horizon")
    args = parser.parse_args(argv)
    if args.quick:
        args.T, args.s2_start = 8.0, 3.0

    num_cells = 200
    h = 0.015
    L = num_cells * h
    mesh = meshmod.create_interval(None, num_cells, (0.0, L))
    chi = 1400.0 * ureg("cm**-1")
    time = fem.Constant(0.0)

    # S1 at the left end, S2 in the central (heterogeneous) region
    s1_cells = meshmod.locate_entities(mesh, mesh.tdim, lambda x: x[0] <= 10 * h)
    s1_tags = meshmod.meshtags(mesh, mesh.tdim, s1_cells, 1)
    I_s1 = beat.stimulation.define_stimulus(
        mesh=mesh,
        chi=chi,
        time=time,
        subdomain_data=s1_tags,
        marker=1,
        mesh_unit="cm",
        amplitude=50_000.0,
        duration=2.0,
        start=0.0,
    )
    s2_cells = meshmod.locate_entities(
        mesh, mesh.tdim, lambda x: np.logical_and(x[0] >= 0.45 * L, x[0] <= 0.55 * L)
    )
    s2_tags = meshmod.meshtags(mesh, mesh.tdim, s2_cells, 2)
    I_s2 = beat.stimulation.define_stimulus(
        mesh=mesh,
        chi=chi,
        time=time,
        subdomain_data=s2_tags,
        marker=2,
        mesh_unit="cm",
        amplitude=50_000.0,
        duration=2.0,
        start=args.s2_start,
    )

    # heterogeneous repolarization: reduced g_Ks in the central region
    V_ode = fem.functionspace(mesh, ("P", 1))
    xs = V_ode.dof_coords[:, 0]
    central = (xs >= 0.4 * L) & (xs <= 0.6 * L)

    pde = beat.MonodomainModel(time=time, mesh=mesh, M=0.001, I_s=[I_s1, I_s2])

    markers = fem.Function(V_ode)
    markers.x.array[:] = np.where(central, 2.0, 1.0)

    params_normal = tp06.init_parameter_values(stim_amplitude=0.0)
    params_weak = tp06.init_parameter_values(stim_amplitude=0.0, g_Ks=0.098)

    ode = beat.odesolver.DolfinMultiODESolver(
        v_ode=fem.Function(V_ode),
        v_pde=pde.state,
        markers=markers,
        num_states={1: len(tp06.init_state_values()), 2: len(tp06.init_state_values())},
        fun={1: tp06.generalized_rush_larsen, 2: tp06.generalized_rush_larsen},
        init_states={1: tp06.init_state_values(), 2: tp06.init_state_values()},
        parameters={1: params_normal, 2: params_weak},
        v_index={1: tp06.state_index("V"), 2: tp06.state_index("V")},
    )
    solver = beat.MonodomainSplittingSolver(pde=pde, ode=ode)

    probes = np.array([[0.1 * L], [0.5 * L], [0.9 * L]])
    t = 0.0
    step = 0
    while t < args.T:
        solver.step((t, t + args.dt))
        t += args.dt
        step += 1
        if step % 100 == 0:
            vals = fem.evaluate_function(pde.state, probes)
            print(
                f"t={t:6.1f}  v(0.1L)={vals[0]:8.2f}  v(0.5L)={vals[1]:8.2f}  "
                f"v(0.9L)={vals[2]:8.2f}"
            )
    return solver


if __name__ == "__main__":
    main()
