"""Biventricular endocardial activation with a 12-lead pseudo-ECG.

Mirror of reference ``demos/biv_endocardial.py`` on the in-repo TRUE
two-cavity BiV geometry (``get_biv_ellipsoid_geometry``: LV + RV cavity
ellipsoids with a shared septum and LDRB-lite fibers — the reference
loads an external cardiac-geometries BiV mesh), so the full pipeline is
exercised: ``expand_layer_biv`` transmural labeling, per-layer ToR-ORd
celltypes from 0-D steady-state pacing, random multi-point endocardial
activation (Purkinje-like) over BOTH endocardia, checkpointed voltage,
ECG recovery at 10 torso electrodes, and the standard 12-lead algebra.
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
from fenicsx_beat_tpu.geometry import get_biv_ellipsoid_geometry
from fenicsx_beat_tpu.io import CheckpointWriter, load_checkpoint
from fenicsx_beat_tpu.models import torord_dyncl
from fenicsx_beat_tpu.single_cell import get_steady_state
from fenicsx_beat_tpu.units import ureg

# marker values used when an EXTERNAL geometry is injected without an
# explicit marker mapping (demos/ukb_atlas.py's npz path)
ENDO_LV, ENDO_RV = 10, 11

LEADS = dict(
    RA=(-15.0, 0.0, -10.0),
    LA=(4.0, -12.0, -7.0),
    RL=(0.0, 20.0, 3.0),
    LL=(17.0, 11.0, 7.0),
    V1=(-3.0, 4.0, -9.0),
    V2=(0.0, 2.0, -8.0),
    V3=(3.0, 1.0, -8.0),
    V4=(6.0, 1.0, -6.0),
    V5=(10.0, 2.0, 0.0),
    V6=(10.0, -6.0, 2.0),
)


def main(argv=None, geometry=None, endo_lv_marker=None, endo_rv_marker=None):
    """Run the biv pipeline.  ``geometry`` may inject an external mesh
    (e.g. a UKB atlas export, see ``demos/ukb_atlas.py``) whose ``ffun``
    already carries ENDO_LV/ENDO_RV/EPI tags; by default the in-repo
    two-cavity BiV ellipsoid is generated."""
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-T", type=float, default=20.0, help="end time (ms)")
    parser.add_argument("--dt", type=float, default=0.05)
    parser.add_argument("--psize", type=float, default=0.35)
    parser.add_argument("--nbeats", type=int, default=1)
    parser.add_argument("--n-activation-points", type=int, default=20)
    parser.add_argument("-o", "--outdir", type=Path, default=Path("results-biv"))
    parser.add_argument("--quick", action="store_true", help="CI smoke: coarse mesh, short horizon")
    args = parser.parse_args(argv)
    if args.quick:
        args.T, args.psize, args.n_activation_points = 3.0, 0.7, 5
    args.outdir.mkdir(parents=True, exist_ok=True)

    if geometry is None:
        geo = get_biv_ellipsoid_geometry(psize_ref=args.psize)
        endo_lv_marker = geo.markers["LV"][0]
        endo_rv_marker = geo.markers["RV"][0]
    else:
        geo = geometry
        endo_lv_marker = ENDO_LV if endo_lv_marker is None else endo_lv_marker
        endo_rv_marker = ENDO_RV if endo_rv_marker is None else endo_rv_marker
    ffun = geo.ffun
    mesh = geo.mesh
    print(f"geometry: {mesh.num_vertices} nodes, {mesh.num_cells} tets")

    V = fem.functionspace(mesh, ("P", 1))
    mid_marker, endo_marker, epi_marker = 0, 1, 2
    layers = beat.utils.expand_layer_biv(
        V=V,
        ft=ffun,
        endo_lv_marker=endo_lv_marker,
        endo_rv_marker=endo_rv_marker,
        epi_marker=geo.markers["EPI"][0],
        endo_size=0.3,
        epi_size=0.3,
        output_mid_marker=mid_marker,
        output_endo_marker=endo_marker,
        output_epi_marker=epi_marker,
    )

    # per-layer steady states
    model = torord_dyncl
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
            dt=args.dt,
        )
        parameters[marker] = model.init_parameter_values(i_Stim_Amplitude=0.0, celltype=ct)
        funs[marker] = model.generalized_rush_larsen
        v_idx[marker] = model.state_index("v")
        nstates[marker] = len(model.init_state_values())

    # random multi-point endocardial activation (Purkinje-like), reference
    # demos use generate_random_activation over endocardial vertices
    rng = np.random.default_rng(42)
    endo_facets = np.concatenate([ffun.find(endo_lv_marker), ffun.find(endo_rv_marker)])
    endo_verts = np.unique(mesh.entities(2)[endo_facets].ravel())
    picks = rng.choice(endo_verts, size=min(args.n_activation_points, endo_verts.size), replace=False)
    points = mesh.coords[picks]
    delays = rng.uniform(0.0, 4.0, size=len(picks))
    time = fem.Constant(0.0)
    activation = beat.stimulation.generate_random_activation(
        mesh=mesh,
        time=time,
        points=points,
        delays=delays,
        stim_start=0.0,
        stim_duration=2.0,
        # volumetric amplitude: 50,000 uA/cm^3 divided by chi (the raw
        # Stimulus skips define_stimulus's unit conversion)
        stim_amplitude=50_000.0 / 1400.0,
        # activate a one-element neighborhood of each point so the volume
        # quadrature sees the site (the reference interpolates its UFL
        # conditionals at dof points instead)
        tol=0.7 * args.psize,
    )
    cells = meshmod.locate_entities(mesh, mesh.tdim, lambda x: np.ones(x.shape[1], dtype=bool))
    all_tags = meshmod.meshtags(mesh, mesh.tdim, cells, 1)
    dx = beat.stimulation.dx(mesh, subdomain_data=all_tags)
    I_s = beat.Stimulus(expr=activation, dZ=dx, marker=1)

    conds = beat.conductivities.default_conductivities("Niederer")
    M = beat.conductivities.define_conductivity_tensor(f0=geo.f0, **conds)
    pde = beat.MonodomainModel(time=time, mesh=mesh, M=M, I_s=I_s)
    ode = beat.odesolver.DolfinMultiODESolver(
        v_ode=fem.Function(V),
        v_pde=pde.state,
        markers=layers,
        num_states=nstates,
        fun=funs,
        init_states=init_states,
        parameters=parameters,
        v_index=v_idx,
    )
    solver = beat.MonodomainSplittingSolver(pde=pde, ode=ode)

    checkpoint = args.outdir / "voltage"
    save_every = int(1.0 / args.dt)
    t, step = 0.0, 0
    with CheckpointWriter(checkpoint, mesh) as writer:
        writer.write(0.0, pde.state.x.array)
        while t < args.T:
            solver.step((t, t + args.dt))
            t += args.dt
            step += 1
            if step % save_every == 0:
                v = pde.state.x.array
                print(f"t={t:6.1f}  v_range=[{v.min():8.2f}, {v.max():8.2f}]")
                writer.write(t, v)

    # postprocess: ECG traces from the checkpoint, 12-lead algebra
    data = load_checkpoint(checkpoint)
    vfun = fem.Function(V)
    ecg = beat.ECGRecovery(v=vfun, sigma_b=1.0, M=M)
    forms = {k: ecg.eval(p) for k, p in LEADS.items()}
    traces = {k: [] for k in LEADS}
    for frame in data.values:
        vfun.x.array[:] = frame
        ecg.solve()
        for k, form in forms.items():
            traces[k].append(float(fem.assemble_scalar(form)))

    ecg12 = beat.ecg.Leads12(**{k: np.array(tr) for k, tr in traces.items()})
    print("lead    min        max")
    for name in ["I", "II", "III", "aVR", "aVL", "aVF", "V1_", "V2_", "V3_", "V4_", "V5_", "V6_"]:
        sig = getattr(ecg12, name)
        print(f"{name:5s} {sig.min():10.3e} {sig.max():10.3e}")
    np.savez(args.outdir / "ecg12.npz", times=data.times, **{
        name: getattr(ecg12, name)
        for name in ["I", "II", "III", "aVR", "aVL", "aVF", "V1_", "V2_", "V3_", "V4_", "V5_", "V6_"]
    })
    return solver


if __name__ == "__main__":
    main()
