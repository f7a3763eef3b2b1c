"""UK Biobank atlas biventricular simulation (external mesh, gated).

Mirror of reference ``demos/ukb_atlas.py``, which downloads the UKB atlas
BiV mesh through cardiac-geometries.  This environment has no network
egress, so the demo accepts a pre-exported mesh (``--geodir`` pointing at
an ``.npz`` with ``coords`` [n,3], ``cells`` [nc,4], optional ``f0``
[n,3], ``facet_indices``/``facet_values`` with ENDO_LV=10, ENDO_RV=11,
EPI=7 tags) and otherwise falls back to the idealized split-endo ellipsoid
so the full pipeline still runs end-to-end: transmural layers, per-layer
ToR-ORd models, random endocardial activation and checkpointed voltage.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
from pathlib import Path

import numpy as np


def load_external_geometry(geodir: Path):
    """Load a UKB-style mesh exported to npz (see module docstring)."""
    from fenicsx_beat_tpu.geometry import Geometry
    from fenicsx_beat_tpu.mesh import CellType, Mesh, meshtags

    path = geodir if geodir.suffix == ".npz" else geodir / "mesh.npz"
    with np.load(path) as f:
        mesh = Mesh(
            coords=np.asarray(f["coords"], dtype=np.float64),
            cells=np.asarray(f["cells"], dtype=np.int32),
            cell_type=CellType.tetrahedron,
        )
        f0 = np.asarray(f["f0"]) if "f0" in f else np.array([1.0, 0.0, 0.0])
        ffun = None
        markers = None
        if "facet_indices" in f:
            ffun = meshtags(mesh, 2, f["facet_indices"], f["facet_values"])
            markers = {"ENDO_LV": (10, 2), "ENDO_RV": (11, 2), "EPI": (7, 2)}
    return Geometry(mesh=mesh, ffun=ffun, markers=markers, f0=f0)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--geodir", type=Path, default=None,
                        help="pre-exported UKB mesh (npz); falls back to the "
                        "idealized ellipsoid when absent")
    parser.add_argument("-T", type=float, default=20.0)
    parser.add_argument("--dt", type=float, default=0.05)
    parser.add_argument("-o", "--outdir", type=Path, default=Path("results-ukb"))
    parser.add_argument("--quick", action="store_true", help="CI smoke (forwarded to the BiV pipeline)")
    args, extra = parser.parse_known_args(argv)
    if args.quick:
        extra = [*extra, "--quick"]

    if args.geodir is not None and args.geodir.suffix == ".msh" and args.geodir.is_file():
        # ukb-atlas exports Gmsh files; read them directly.  The BiV
        # pipeline needs EPI/ENDO_LV/ENDO_RV facet tags — resolve them
        # through the file's $PhysicalNames; anything missing degrades to
        # the idealized pipeline instead of crashing downstream.
        from fenicsx_beat_tpu.geometry import Geometry
        from fenicsx_beat_tpu.io import read_msh, read_msh_physical_names

        mesh, _ct, ffun = read_msh(args.geodir)
        names = {k.upper(): v for k, v in read_msh_physical_names(args.geodir).items()}

        def _find(*cands):
            for c in cands:
                if c in names:
                    return names[c][1]
            return None

        epi = _find("EPI", "EPICARDIUM")
        endo_lv = _find("ENDO_LV", "LV", "LV_ENDO", "ENDOCARDIUM_LV")
        endo_rv = _find("ENDO_RV", "RV", "RV_ENDO", "ENDOCARDIUM_RV")
        if ffun is not None and None not in (epi, endo_lv, endo_rv):
            markers = {k: (tag, dim) for k, (dim, tag) in names.items()}
            geo = Geometry(mesh=mesh, ffun=ffun, markers=markers, f0=None)
            print(f"Loaded Gmsh geometry: {mesh.num_vertices} nodes, "
                  f"markers {sorted(names)}")
            import demos.biv_endocardial as biv

            return biv.main(
                ["-T", str(args.T), "--dt", str(args.dt), "-o", str(args.outdir), *extra],
                geometry=geo,
                endo_lv_marker=endo_lv,
                endo_rv_marker=endo_rv,
            )
        missing = [n for n, v in
                   (("EPI", epi), ("ENDO_LV", endo_lv), ("ENDO_RV", endo_rv)) if v is None]
        print(
            f"Gmsh file lacks required facet tags ({'ffun missing' if ffun is None else 'names missing: ' + ','.join(missing)}); "
            "running the idealized pipeline instead."
        )
    if args.geodir is not None and args.geodir.suffix != ".msh" and (
        args.geodir.is_file() or (args.geodir / "mesh.npz").is_file()
    ):
        geo = load_external_geometry(args.geodir)
        print(f"Loaded external geometry: {geo.mesh.num_vertices} nodes")
        import demos.biv_endocardial as biv

        return biv.main(
            ["-T", str(args.T), "--dt", str(args.dt), "-o", str(args.outdir), *extra],
            geometry=geo,
        )
    print(
        "No UKB atlas mesh available (no network egress); running the "
        "idealized biventricular pipeline instead — provide --geodir to use "
        "a real atlas mesh."
    )
    import demos.biv_endocardial as biv

    return biv.main(["-T", str(args.T), "--dt", str(args.dt), "-o", str(args.outdir), *extra])


if __name__ == "__main__":
    main()
