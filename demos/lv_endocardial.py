"""Endocardial stimulation of an idealized left-ventricle ellipsoid.

Mirror of reference ``demos/lv_endocardial.py``: an LV ellipsoid (in-repo
generator replaces the external cardiac-geometries package), transmural
endo/mid/epi layers from a Laplace solve (``expand_layer``), per-layer
ToR-ORd dynCl celltypes pre-paced to steady state, endocardial surface
stimulus, and pseudo-ECG recovery at an electrode.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
from pathlib import Path

import numpy as np

import fenicsx_beat_tpu as beat
from fenicsx_beat_tpu import fem
from fenicsx_beat_tpu.geometry import get_lv_ellipsoid_geometry
from fenicsx_beat_tpu.io import VTUWriter
from fenicsx_beat_tpu.models import torord_dyncl
from fenicsx_beat_tpu.single_cell import get_steady_state
from fenicsx_beat_tpu.units import ureg


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-T", type=float, default=30.0, help="end time (ms)")
    parser.add_argument("--dt", type=float, default=0.05)
    parser.add_argument("--psize", type=float, default=0.3, help="element size (cm)")
    parser.add_argument(
        "--amplitude",
        type=float,
        default=None,
        help="stimulus amplitude uA/cm^2 (default: reference value 2000 at "
        "psize<=0.15, scaled up ~1/psize on coarser meshes where the "
        "surface current spreads over deeper P1 node support)",
    )
    parser.add_argument("--nbeats", type=int, default=2, help="0-D pre-pacing beats")
    parser.add_argument("-o", "--outdir", type=Path, default=Path("results-lv-endocardial"))
    parser.add_argument("--quick", action="store_true", help="CI smoke: coarse mesh, short horizon")
    args = parser.parse_args(argv)
    if args.quick:
        args.T, args.psize, args.nbeats = 3.0, 0.6, 1
    args.outdir.mkdir(parents=True, exist_ok=True)

    geo = get_lv_ellipsoid_geometry(psize_ref=args.psize)
    mesh = geo.mesh
    print(f"LV ellipsoid: {mesh.num_vertices} nodes, {mesh.num_cells} tets")

    V = fem.functionspace(mesh, ("P", 1))
    mid_marker, endo_marker, epi_marker = 0, 1, 2
    endo_epi = beat.utils.expand_layer(
        V=V,
        ft=geo.ffun,
        endo_marker=geo.markers["ENDO"][0],
        epi_marker=geo.markers["EPI"][0],
        endo_size=0.3,
        epi_size=0.3,
        output_mid_marker=mid_marker,
        output_endo_marker=endo_marker,
        output_epi_marker=epi_marker,
    )

    # per-layer steady states (celltype: 0=endo, 1=epi, 2=mid)
    model = torord_dyncl
    dt = args.dt
    celltypes = {mid_marker: 2.0, endo_marker: 0.0, epi_marker: 1.0}
    init_states, parameters, funs, v_idx, nstates = {}, {}, {}, {}, {}
    for marker, ct in celltypes.items():
        init_states[marker] = get_steady_state(
            fun=model.generalized_rush_larsen,
            init_states=model.init_state_values(),
            parameters=model.init_parameter_values(celltype=ct),
            outdir=args.outdir / f"layer-{marker}",
            BCL=1000,
            nbeats=args.nbeats,
            dt=dt,
        )
        parameters[marker] = model.init_parameter_values(i_Stim_Amplitude=0.0, celltype=ct)
        funs[marker] = model.generalized_rush_larsen
        v_idx[marker] = model.state_index("v")
        nstates[marker] = len(model.init_state_values())

    # endocardial surface stimulus
    time = fem.Constant(0.0)
    chi = 1400.0 * ureg("cm**-1")
    I_s = beat.stimulation.define_stimulus(
        mesh=mesh,
        chi=chi,
        time=time,
        subdomain_data=geo.ffun,
        marker=geo.markers["ENDO"][0],
        mesh_unit="cm",
        amplitude=args.amplitude or 2000.0 * max(1.0, args.psize / 0.15),
        duration=1.0,
    )

    conds = beat.conductivities.default_conductivities("Niederer")
    M = beat.conductivities.define_conductivity_tensor(f0=geo.f0, **conds)

    pde = beat.MonodomainModel(time=time, mesh=mesh, M=M, I_s=I_s)
    ode = beat.odesolver.DolfinMultiODESolver(
        v_ode=fem.Function(V),
        v_pde=pde.state,
        markers=endo_epi,
        num_states=nstates,
        fun=funs,
        init_states=init_states,
        parameters=parameters,
        v_index=v_idx,
    )
    solver = beat.MonodomainSplittingSolver(pde=pde, ode=ode)

    writer = VTUWriter(args.outdir / "viz", mesh)
    t = 0.0
    step = 0
    while t < args.T:
        solver.step((t, t + dt))
        t += dt
        step += 1
        if step % int(2.0 / dt) == 0:
            v = pde.state.x.array
            print(f"t={t:6.1f}  v_range=[{v.min():8.2f}, {v.max():8.2f}]")
            writer.write(t, {"v": v, "layer": endo_epi.x.array})
    writer.close()

    # pseudo-ECG at an electrode 4 cm from the epi wall
    ecg = beat.ECGRecovery(v=pde.state, sigma_b=1.0, M=M)
    ecg.solve()
    phi = fem.assemble_scalar(ecg.eval((2.0, 7.0, 0.0)))
    print(f"Electrode potential: {phi:.6e}")
    return solver


if __name__ == "__main__":
    main()
