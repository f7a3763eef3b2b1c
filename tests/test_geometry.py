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


def test_biv_ellipsoid_geometry():
    """Round-4 true two-cavity BiV (replaces the split-LV-endocardium
    stand-in the round-3 demo used; reference loads the external
    cardiac-geometries biv_ellipsoid)."""
    from fenicsx_beat_tpu.geometry import get_biv_ellipsoid_geometry

    geo = get_biv_ellipsoid_geometry(psize_ref=0.5)
    mesh = geo.mesh
    g = fem.cell_geometry(mesh)
    assert (g.volume > 0).all()

    # tissue volume matches a Monte-Carlo integral of the defining
    # implicit region (centroid carving is O(h) accurate)
    def phi(x, al, a_s, cy=0.0):
        return (x[:, 0] / al) ** 2 + ((x[:, 1] - cy) / a_s) ** 2 + (
            x[:, 2] / a_s
        ) ** 2 - 1

    rng = np.random.default_rng(0)
    lo, hi = mesh.coords.min(0) - 0.3, mesh.coords.max(0)
    pts = lo + rng.random((300_000, 3)) * (hi - lo)
    tis = (
        (pts[:, 0] <= 0)
        & ((phi(pts, 9.7, 3.5) < 0) | (phi(pts, 8.75, 5.0, 2.2) < 0))
        & (phi(pts, 9.0, 2.5) >= 0)
        & ~((phi(pts, 8.0, 4.2, 2.2) < 0) & (phi(pts, 9.7, 3.5) >= 0))
    )
    v_mc = tis.mean() * np.prod(hi - lo)
    assert abs(g.volume.sum() - v_mc) / v_mc < 0.05

    # all four surfaces are tagged and every exterior facet has a tag
    assert len(geo.ffun.indices) == len(mesh.exterior_facets())
    areas = {}
    for name in ("BASE", "LV", "RV", "EPI"):
        sel = geo.ffun.find(geo.markers[name][0])
        assert len(sel) > 0, name
        fv = mesh.entities(2)[sel]
        e1 = mesh.coords[fv[:, 1]] - mesh.coords[fv[:, 0]]
        e2 = mesh.coords[fv[:, 2]] - mesh.coords[fv[:, 0]]
        areas[name] = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=1).sum()
    # the epicardial hull dominates; both cavities are real surfaces
    assert areas["EPI"] > areas["LV"] and areas["EPI"] > areas["RV"]
    assert areas["RV"] > 10.0 and areas["LV"] > 10.0

    # genuinely two cavities: the RV free wall reaches beyond the LV epi
    assert mesh.coords[:, 1].max() > 3.5 + 1.0

    # LDRB-lite fibers: orthonormal frame everywhere
    for v in (geo.f0, geo.s0, geo.n0):
        assert v.shape == (mesh.num_vertices, 3)
        np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-8)
    assert np.abs(np.sum(geo.f0 * geo.s0, axis=1)).max() < 1e-8
    assert np.abs(np.sum(geo.f0 * geo.n0, axis=1)).max() < 1e-8


def test_biv_ellipsoid_solves_and_propagates():
    """LV-endocardial stimulus propagates through the septum into the RV
    free wall — the two cavities are electrically one tissue."""
    import fenicsx_beat_tpu as beat
    from fenicsx_beat_tpu.fused import FusedMonodomainSolver
    from fenicsx_beat_tpu.geometry import get_biv_ellipsoid_geometry
    from fenicsx_beat_tpu.models import fitzhughnagumo as fhn

    geo = get_biv_ellipsoid_geometry(psize_ref=0.8)
    mesh = geo.mesh
    # stimulate cells adjacent to the LV endocardial surface
    lv_facets = geo.ffun.find(geo.markers["LV"][0])
    lv_cells = np.unique(mesh.facet_to_cell(lv_facets))
    from fenicsx_beat_tpu.mesh import meshtags

    tags = meshtags(mesh, 3, lv_cells.astype(np.int32), 1)
    I_s = beat.stimulation.Stimulus(
        expr=beat.stimulation.TimeWindow(amplitude=200.0, start=0.0, duration=2.0),
        dZ=beat.stimulation.dx(mesh, subdomain_data=tags),
        marker=1,
    )
    solver = FusedMonodomainSolver(
        mesh=mesh,
        M=1.0,  # FHN conduction ~sqrt(M): fast enough to cross ~19 mm
        ode_fun=fhn.forward_euler,
        init_states=fhn.init_state_values(),
        parameters=fhn.init_parameter_values(stim_amplitude=0.0),
        v_index=fhn.state_index("v"),
        I_s=I_s,
        activation_threshold=0.0,
    )
    solver.solve((0.0, 60.0), dt=0.1)
    act = solver.activation_times()[: mesh.num_vertices]
    # the RV free wall (beyond the LV epi radius) activates later but
    # genuinely activates — conduction crossed the septum
    rv_free = mesh.coords[:, 1] > 4.5
    assert rv_free.sum() > 50
    frac = (act[rv_free] >= 0).mean()
    assert frac > 0.9, f"only {frac:.0%} of the RV free wall activated"
    assert np.nanmedian(act[rv_free]) > np.nanmedian(act[~rv_free])


def test_geometry_disk_cache_roundtrip():
    """cache=True memoizes the generator products bit-identically
    (fenicsx_beat_tpu.cache): a warm rebuild must match the cold one
    field for field."""
    import numpy as np

    from fenicsx_beat_tpu.geometry import get_lv_ellipsoid_geometry

    kw = dict(psize_ref=0.83, fiber_angle_endo=50.0)
    cold = get_lv_ellipsoid_geometry(cache=False, **kw)
    get_lv_ellipsoid_geometry(**kw)  # populate
    warm = get_lv_ellipsoid_geometry(**kw)
    assert np.array_equal(cold.mesh.coords, warm.mesh.coords)
    assert np.array_equal(cold.mesh.cells, warm.mesh.cells)
    assert np.array_equal(cold.f0, warm.f0)
    assert np.array_equal(cold.ffun.indices, warm.ffun.indices)
    assert np.array_equal(cold.ffun.values, warm.ffun.values)
    assert cold.markers == warm.markers
