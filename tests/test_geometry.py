"""Geometry tests: slab builders and the idealized LV ellipsoid."""

import numpy as np

from fenicsx_beat_tpu import fem
from fenicsx_beat_tpu.geometry import (
    get_2D_slab_geometry,
    get_3D_slab_geometry,
    get_lv_ellipsoid_geometry,
)


def test_3d_slab_geometry():
    geo = get_3D_slab_geometry(None, dx=0.5, Lx=2.0, Ly=1.0, Lz=1.0)
    g = fem.cell_geometry(geo.mesh)
    assert np.isclose(g.volume.sum(), 2.0)
    np.testing.assert_allclose(geo.f0, (1.0, 0.0, 0.0))
    geo_t = get_3D_slab_geometry(None, dx=0.5, Lx=2.0, Ly=1.0, Lz=1.0, transverse=True)
    np.testing.assert_allclose(geo_t.f0, (0.0, 0.0, 1.0))


def test_2d_slab_geometry():
    geo = get_2D_slab_geometry(None, dx=0.25, Lx=1.0, Ly=0.5)
    g = fem.cell_geometry(geo.mesh)
    assert np.isclose(g.volume.sum(), 0.5)


def test_lv_ellipsoid_geometry():
    geo = get_lv_ellipsoid_geometry(psize_ref=0.5)
    mesh = geo.mesh
    g = fem.cell_geometry(mesh)
    assert (g.volume > 0).all()
    # volume converges to the analytic truncated-shell volume (base=0:
    # half-ellipsoid shell)
    va = 2 / 3 * np.pi * (3.5**2 * 9.7 - 2.5**2 * 9.0)
    assert abs(g.volume.sum() - va) / va < 0.02
    # mesh is conforming: every facet bounds at most 2 cells and all
    # exterior facets carry exactly one marker
    ext = mesh.exterior_facets()
    assert len(geo.ffun.indices) == len(ext)
    # endo/epi/base present
    for name in ("ENDO", "EPI", "BASE"):
        assert len(geo.ffun.find(geo.markers[name][0])) > 0
    # fibers are unit vectors tangential to the wall surfaces at endo/epi
    assert np.allclose(np.linalg.norm(geo.f0, axis=1), 1.0)
    assert np.allclose(np.linalg.norm(geo.n0, axis=1), 1.0)
    # orthonormal frame
    dots = np.abs(np.sum(geo.f0 * geo.n0, axis=1))
    assert dots.max() < 1e-8


def test_lv_ellipsoid_solves():
    """The LV mesh works end-to-end through the PDE layer."""
    import fenicsx_beat_tpu as beat

    geo = get_lv_ellipsoid_geometry(psize_ref=0.7)
    time = fem.Constant(0.0)
    conds = beat.conductivities.default_conductivities("Niederer")
    M = beat.conductivities.define_conductivity_tensor(f0=geo.f0, **conds)
    I_s = beat.stimulation.define_stimulus(
        mesh=geo.mesh,
        chi=conds["chi"],
        time=time,
        subdomain_data=geo.ffun,
        marker=geo.markers["ENDO"][0],
        mesh_unit="cm",
        amplitude=2000.0,
        duration=1.0,
    )
    model = beat.MonodomainModel(time=time, mesh=geo.mesh, M=M, I_s=I_s)
    res = model.solve((0.0, 2.0), dt=0.1)
    v = res.state.x.array
    assert np.isfinite(v).all()
    assert v.max() > 0.0  # stimulus deposited charge
