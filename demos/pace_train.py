"""Pacing a 1D cable with a train of stimuli (TP06).

Mirror of reference ``demos/pace_train.py``: the cell model is first paced
to (near) steady state in 0-D with the hash-cached
:func:`~fenicsx_beat_tpu.single_cell.get_steady_state`, then a 1 cm cable
is paced from the left end; conduction velocity is measured between two
probes (reference prints at ``demos/pace_train.py:266-271``) and voltage
snapshots are checkpointed for postprocessing.
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
from fenicsx_beat_tpu.io import CheckpointWriter
from fenicsx_beat_tpu.models import tentusscher_panfilov_2006 as tp06
from fenicsx_beat_tpu.single_cell import get_steady_state
from fenicsx_beat_tpu.units import ureg


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-T", type=float, default=40.0, help="end time (ms)")
    parser.add_argument("--dt", type=float, default=0.05)
    parser.add_argument("--nbeats", type=int, default=2, help="0-D pre-pacing beats")
    parser.add_argument("--BCL", type=int, default=1000, help="basic cycle length (ms)")
    parser.add_argument("-o", "--outdir", type=Path, default=Path("results-pace-train"))
    parser.add_argument("--quick", action="store_true", help="CI smoke: short horizon, 1 beat")
    args = parser.parse_args(argv)
    if args.quick:
        args.T, args.nbeats = 5.0, 1
    args.outdir.mkdir(parents=True, exist_ok=True)

    # --- 0-D pre-pacing to a paced limit cycle (hash-cached) -------------
    y0 = get_steady_state(
        fun=tp06.generalized_rush_larsen,
        init_states=tp06.init_state_values(),
        parameters=tp06.init_parameter_values(stim_amplitude=-52.0, stim_start=10.0),
        outdir=args.outdir / "steady-state",
        nbeats=args.nbeats,
        BCL=args.BCL,
        dt=args.dt,
    )
    print(f"Pre-paced resting V = {y0[tp06.state_index('V')]:.2f} mV")

    # --- 1D cable ---------------------------------------------------------
    num_cells = 200
    h = 0.015  # cm
    L = num_cells * h
    mesh = meshmod.create_interval(None, num_cells, (0.0, L))

    marker = 1
    cells = meshmod.locate_entities(mesh, mesh.tdim, lambda x: x[0] <= 10 * h)
    tags = meshmod.meshtags(mesh, mesh.tdim, cells, marker)
    chi = 1400.0 * ureg("cm**-1")
    I_s = beat.stimulation.define_stimulus(
        mesh=mesh,
        chi=chi,
        time=fem.Constant(0.0),
        subdomain_data=tags,
        marker=marker,
        mesh_unit="cm",
        amplitude=50_000.0,
        duration=2.0,
    )

    conds = beat.conductivities.default_conductivities("Niederer")
    s_l, _ = beat.conductivities.get_harmonic_mean_conductivity(chi=conds["chi"], **{
        k: conds[k] for k in ("g_il", "g_it", "g_el", "g_et")
    })
    C_m = (1.0 * ureg("uF/cm**2")).to("uF/cm**2").magnitude

    solver = FusedMonodomainSolver(
        mesh=mesh,
        M=s_l,
        ode_fun=tp06.generalized_rush_larsen,
        init_states=y0,
        parameters=tp06.init_parameter_values(stim_amplitude=0.0),
        v_index=tp06.state_index("V"),
        I_s=I_s,
        C_m=C_m,
    )

    save_every = int(1.0 / args.dt)
    with CheckpointWriter(args.outdir / "voltage", mesh) as writer:
        solver.solve(
            (0.0, args.T),
            dt=args.dt,
            save_freq=save_every,
            save_callback=lambda t, v: writer.write(t, v),
        )

    act = fem.Function(solver.V)
    act.x.array[:] = solver.activation_times()
    probes = np.array([[0.3 * L], [0.7 * L]])
    t1, t2 = fem.evaluate_function(act, probes)
    if 0 < t1 < t2:
        cv = (0.4 * L) / (t2 - t1)
        print(f"Conduction velocity: {cv:.4f} cm/ms = {cv * 10:.3f} m/s")
    else:
        print(f"Wave has not traversed the probes (t1={t1:.2f}, t2={t2:.2f})")

    # restitution from the saved mid-tissue trace: (DI_k, APD_{k+1}) pairs
    # over the pace train (ecg.apd/restitution_curve — beyond the
    # reference's analysis set)
    from fenicsx_beat_tpu.ecg import apd, restitution_curve
    from fenicsx_beat_tpu.io import load_checkpoint

    data = load_checkpoint(args.outdir / "voltage.npz")
    mid_dof = int(np.argmin(np.abs(mesh.coords[:, 0] - 0.5 * L)))
    trace = data.values[:, mid_dof]
    apds = apd(data.times, trace, repolarization=90)
    if apds.size:
        print(f"APD90 per beat (ms): {np.array2string(apds, precision=1)}")
    di, a_next = restitution_curve(data.times, trace)
    if di.size:
        print("restitution (DI -> APD90):")
        for d, a in zip(di, a_next):
            print(f"  {d:7.1f} -> {a:6.1f}")
    return solver


if __name__ == "__main__":
    main()
