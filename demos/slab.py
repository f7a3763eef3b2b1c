"""Conduction velocity and pseudo-ECG on a thin 3D slab (ToR-ORd).

Mirror of reference ``demos/slab.py``: a 1 cm x 2dx x 2dx bar paced from
the x=0 face; conduction velocity measured between two probe points
(reference prints at ``demos/slab.py:374-381``), extracellular potential
recovered at an electrode with :class:`ECGRecovery`.
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
from fenicsx_beat_tpu.fused import FusedMonodomainSolver
from fenicsx_beat_tpu.models import torord_dyncl
from fenicsx_beat_tpu.units import ureg


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-T", type=float, default=20.0, help="end time (ms)")
    parser.add_argument("--dt", type=float, default=0.05)
    parser.add_argument("--dx", type=float, default=0.05, help="bar thickness (cm)")
    parser.add_argument("-o", "--outdir", type=Path, default=Path("results-slab"))
    parser.add_argument("--quick", action="store_true", help="CI smoke: coarse bar, short horizon")
    args = parser.parse_args(argv)
    if args.quick:
        args.T, args.dx = 3.0, 0.1

    mesh_unit = "cm"
    L = 1.0
    dx_bar = args.dx
    mesh = meshmod.create_box(
        None, ((0.0, 0.0, 0.0), (L, dx_bar, dx_bar)), (int(L / (dx_bar / 5)), 5, 5)
    )

    # stimulus on the x=0 boundary facets
    marker = 1
    facets = meshmod.locate_entities_boundary(mesh, mesh.tdim - 1, lambda x: x[0] <= 1e-8)
    ffun = meshmod.meshtags(mesh, mesh.tdim - 1, facets, marker)
    chi = 1400.0 * ureg("cm**-1")
    time = fem.Constant(0.0)
    I_s = beat.stimulation.define_stimulus(
        mesh=mesh,
        chi=chi,
        time=time,
        subdomain_data=ffun,
        marker=marker,
        mesh_unit=mesh_unit,
        amplitude=5000.0,
        duration=2.0,
    )

    # isotropic Niederer-style conductivity, cm units
    conds = beat.conductivities.default_conductivities("Niederer")
    M = beat.conductivities.get_harmonic_mean_conductivity(
        chi=conds["chi"],
        g_il=conds["g_il"],
        g_it=conds["g_it"],
        g_el=conds["g_el"],
        g_et=conds["g_et"],
    )
    C_m = (1.0 * ureg("uF/cm**2")).to(f"uF/{mesh_unit}**2").magnitude

    solver = FusedMonodomainSolver(
        mesh=mesh,
        M=float(M[0]),
        ode_fun=torord_dyncl.generalized_rush_larsen,
        init_states=torord_dyncl.init_state_values(),
        parameters=torord_dyncl.init_parameter_values(i_Stim_Start=1e18),
        v_index=torord_dyncl.state_index("v"),
        I_s=I_s,
        C_m=C_m,
        activation_threshold=0.0,
    )
    solver.solve((0.0, args.T), dt=args.dt, save_freq=int(1.0 / args.dt))

    # conduction velocity between x=0.3 and x=0.7 probes
    act = fem.Function(solver.V)
    act.x.array[:] = solver.activation_times()
    p1 = np.array([[0.3, dx_bar / 2, dx_bar / 2], [0.7, dx_bar / 2, dx_bar / 2]])
    t1, t2 = fem.evaluate_function(act, p1)
    if t1 > 0 and t2 > 0 and t2 > t1:
        cv = 0.4 / (t2 - t1)  # cm/ms
        print(f"Conduction velocity: {cv:.4f} cm/ms = {cv * 10:.3f} m/s = {cv * 1000:.1f} cm/s")
    else:
        print(f"Wave has not reached both probes yet (t1={t1:.2f}, t2={t2:.2f})")

    # pseudo-ECG at an electrode 1 cm beyond the far end
    vfun = fem.Function(solver.V)
    vfun.x.array[:] = np.asarray(solver.v)
    ecg = beat.ECGRecovery(v=vfun, sigma_b=1.0, C_m=C_m, M=float(M[0]))
    ecg.solve()
    phi = fem.assemble_scalar(ecg.eval((2.0, dx_bar / 2, dx_bar / 2)))
    print(f"Extracellular potential at (2.0, ..): {phi:.6e}")

    args.outdir.mkdir(parents=True, exist_ok=True)
    from fenicsx_beat_tpu.io import CheckpointWriter

    with CheckpointWriter(args.outdir / "final_state", mesh) as w:
        w.write(args.T, np.asarray(solver.v))
    return solver


if __name__ == "__main__":
    main()
