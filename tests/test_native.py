"""Native beatkit (C++) vs NumPy fallback equivalence tests."""

import numpy as np
import pytest

from fenicsx_beat_tpu import native


def test_native_builds():
    # the CI image ships g++; the native path must be active there
    assert native.available() or "BEAT_TPU_NO_NATIVE" in __import__("os").environ


def test_unique_rows_matches_numpy():
    rng = np.random.default_rng(0)
    rows = rng.integers(0, 50, size=(2000, 3)).astype(np.int32)
    rows = np.sort(rows, axis=1)
    got = native.unique_rows(rows)
    want = np.unique(rows, axis=0)
    np.testing.assert_array_equal(got, want)


def test_coo_to_ell_matches_dense():
    rng = np.random.default_rng(1)
    n = 40
    nnz = 500
    rows = rng.integers(0, n, nnz)
    cols = rng.integers(0, n, nnz)
    vals = rng.standard_normal(nnz)
    ell_cols, ell_vals, w, counts = native.coo_to_ell_arrays(rows, cols, vals, (n, n))

    dense = np.zeros((n, n))
    np.add.at(dense, (rows, cols), vals)
    recon = np.zeros((n, n))
    for r in range(n):
        for k in range(w):
            recon[r, ell_cols[r, k]] += ell_vals[r, k]
    np.testing.assert_allclose(recon, dense, atol=1e-12)
    # pads point at the row itself (gather-safe)
    assert (ell_cols >= 0).all() and (ell_cols < n).all()


def test_rcm_reduces_bandwidth():
    # ring + random long-range edges: RCM must reduce bandwidth vs random order
    rng = np.random.default_rng(2)
    n = 200
    edges = set()
    for i in range(n):
        edges.add((i, (i + 1) % n))
    for _ in range(50):
        a, b = rng.integers(0, n, 2)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    adj = [[] for _ in range(n)]
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    indptr = np.zeros(n + 1, dtype=np.int64)
    indices = []
    for i, nb in enumerate(adj):
        indptr[i + 1] = indptr[i] + len(nb)
        indices.extend(sorted(nb))
    indices = np.asarray(indices, dtype=np.int32)

    perm = native.rcm_ordering(indptr, indices)
    assert sorted(perm.tolist()) == list(range(n))

    inv = np.empty(n, dtype=np.int64)
    inv[perm] = np.arange(n)

    def bandwidth(relabel):
        return max(abs(int(relabel[a]) - int(relabel[b])) for a, b in edges)

    bw_rcm = bandwidth(inv)
    bw_id = bandwidth(np.arange(n))
    assert bw_rcm <= bw_id


@pytest.mark.parametrize("force_numpy", [True, False])
def test_assembly_same_result_native_and_numpy(force_numpy, monkeypatch):
    """Stiffness matrices assembled via both paths agree."""
    if force_numpy:
        monkeypatch.setattr(native, "_LIB", None)
        monkeypatch.setattr(native, "_TRIED", True)
    from fenicsx_beat_tpu import fem
    from fenicsx_beat_tpu import mesh as meshmod

    mesh = meshmod.create_unit_square(None, 8, 8)
    V = fem.functionspace(mesh, ("P", 1))
    mass, stiff = fem.assemble_mass_stiffness(V, 1.0)
    x = np.linspace(0, 1, V.ndofs)
    y = np.asarray(stiff @ np.asarray(x))
    # row sums of stiffness are 0 (constant in nullspace)
    ones = np.ones(V.ndofs)
    np.testing.assert_allclose(np.asarray(stiff @ ones), 0.0, atol=1e-10)
    # mass row sums integrate to the domain area
    assert np.isclose(np.asarray(mass @ ones).sum(), 1.0)
    assert np.isfinite(y).all()


def test_hybrid_ell_tail_on_lv_mesh():
    """High-degree apex rows spill into the COO tail; SpMV and diagonal stay
    exact and mass/stiffness remain combine-compatible."""
    import jax.numpy as jnp

    from fenicsx_beat_tpu import fem
    from fenicsx_beat_tpu.geometry import get_lv_ellipsoid_geometry

    geo = get_lv_ellipsoid_geometry(psize_ref=0.5)
    V = fem.functionspace(geo.mesh, ("P", 1))
    mass, stiff = fem.assemble_mass_stiffness(V, 1.0)
    assert stiff.has_tail, "apex rows should have spilled into the tail"
    assert stiff.width < 40  # capped (raw apex degree is ~65 here)

    # dense reconstruction check on a vector
    x = np.random.default_rng(0).standard_normal(V.ndofs)
    y = np.asarray(stiff @ jnp.asarray(x))
    # stiffness null space: constants
    np.testing.assert_allclose(np.asarray(stiff @ jnp.ones(V.ndofs)), 0.0, atol=1e-9)
    assert np.isfinite(y).all()
    # mass row sums integrate to the shell volume
    vol = float(np.asarray(mass @ jnp.ones(V.ndofs)).sum())
    g = fem.cell_geometry(geo.mesh)
    assert np.isclose(vol, g.volume.sum())

    # combine keeps main+tail aligned: (2M + 3K) @ x == 2(M@x) + 3(K@x)
    A = mass.combine(2.0, stiff, 3.0)
    lhs = np.asarray(A @ jnp.asarray(x))
    rhs = 2 * np.asarray(mass @ jnp.asarray(x)) + 3 * np.asarray(stiff @ jnp.asarray(x))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12, atol=1e-12)
    # diagonal includes tail contributions
    d = np.asarray(A.diagonal())
    assert (d > 0).all()


def test_p1_geometry_matches_numpy_pipeline():
    import math

    from fenicsx_beat_tpu import fem
    from fenicsx_beat_tpu import mesh as meshmod
    from fenicsx_beat_tpu.fem import _batched_det_inv
    from fenicsx_beat_tpu.geometry import get_3D_slab_geometry

    if not native.available():
        pytest.skip("native kit unavailable")
    for make in (
        lambda: meshmod.create_interval(None, 40),
        lambda: meshmod.create_unit_square(None, 9, 5),
        lambda: get_3D_slab_geometry(None, dx=0.5, Lx=8.0, Ly=4.0, Lz=2.0).mesh,
    ):
        m = make()
        nat = native.p1_geometry(m.coords, m.cells, m.tdim)
        assert nat is not None
        X = m.coords[m.cells]
        E = X[:, 1:, :] - X[:, :1, :]
        detJ, invE = _batched_det_inv(E)
        vol = np.abs(detJ) / math.factorial(m.tdim)
        Gi = np.transpose(invE, (0, 2, 1))
        grads = np.concatenate([-Gi.sum(axis=1, keepdims=True), Gi], axis=1)
        ne, nv, ng = nat
        np.testing.assert_allclose(ne, E, atol=1e-14)
        np.testing.assert_allclose(nv, vol, atol=1e-14)
        np.testing.assert_allclose(ng, grads, rtol=1e-12, atol=1e-12)
        # cell_geometry (whatever backend engaged) agrees, and inv_edges
        # stays consistent with grads rows 1..d
        geom = fem.cell_geometry(m)
        np.testing.assert_allclose(np.asarray(geom.grads), grads, rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(geom.inv_edges), grads[:, 1:, :], rtol=1e-12, atol=1e-12
        )


def test_p1_stencil_tables_matches_numpy_slot_loop():
    from fenicsx_beat_tpu import fem
    from fenicsx_beat_tpu import mesh as meshmod
    from fenicsx_beat_tpu.fem import _broadcast_cell_tensor, _p1_mass_base

    if not native.available():
        pytest.skip("native kit unavailable")
    rng = np.random.default_rng(7)
    m = meshmod.create_unit_square(None, 8, 6)
    V = fem.functionspace(m, ("P", 1))
    cd = V.cell_dofs.astype(np.int64)
    geom = fem.cell_geometry(m)
    n, nd, g = V.ndofs, V.ndofs_per_cell, m.gdim
    base = _p1_mass_base(m.tdim)
    # anisotropic per-cell tensors (SPD-ish) exercise mc_stride != 0
    A = rng.standard_normal((m.num_cells, g, g))
    Mc_percell = A @ np.transpose(A, (0, 2, 1)) + 2 * np.eye(g)
    for Mc in (_broadcast_cell_tensor(0.3, m.num_cells, g), Mc_percell):
        nat = native.p1_stencil_tables(cd, geom.volume, geom.grads, Mc, base, 64, n)
        assert nat is not None and nat != "too_wide"
        offs, mtab, ktab = nat
        # reference: the numpy slot loop
        K = offs.size
        mst = np.zeros(n * K)
        kst = np.zeros(n * K)
        for j in range(nd):
            MGj = np.einsum("cgh,ch->cg", Mc, geom.grads[:, j, :])
            for i in range(nd):
                kk = np.searchsorted(offs, cd[:, j] - cd[:, i])
                lin = cd[:, i] * K + kk
                mst += np.bincount(lin, weights=geom.volume * base[i, j], minlength=n * K)
                kst += np.bincount(
                    lin,
                    weights=geom.volume * np.einsum("cg,cg->c", geom.grads[:, i, :], MGj),
                    minlength=n * K,
                )
        np.testing.assert_allclose(mtab, mst.reshape(n, K), rtol=1e-13, atol=1e-15)
        np.testing.assert_allclose(ktab, kst.reshape(n, K), rtol=1e-12, atol=1e-14)
    # unstructured offset explosion declines
    perm = rng.permutation(m.num_vertices).astype(cd.dtype)
    assert native.p1_stencil_tables(perm[cd], geom.volume, geom.grads, Mc_percell, base, 8, n) == "too_wide"


def test_p1_stencil_tables_direct_matches_slot_loop():
    from fenicsx_beat_tpu import fem
    from fenicsx_beat_tpu import mesh as meshmod
    from fenicsx_beat_tpu.fem import _broadcast_cell_tensor, _p1_mass_base
    from fenicsx_beat_tpu.geometry import get_3D_slab_geometry

    if not native.available():
        pytest.skip("native kit unavailable")
    rng = np.random.default_rng(11)
    for make in (
        lambda: meshmod.create_unit_square(None, 7, 5),
        lambda: get_3D_slab_geometry(None, dx=0.5, Lx=6.0, Ly=3.0, Lz=2.0).mesh,
    ):
        m = make()
        V = fem.functionspace(m, ("P", 1))
        n, g = V.ndofs, m.gdim
        A = rng.standard_normal((m.num_cells, g, g))
        Mc_percell = A @ np.transpose(A, (0, 2, 1)) + 2 * np.eye(g)
        geom = fem.cell_geometry(m)
        base = _p1_mass_base(m.tdim)
        cd = V.cell_dofs.astype(np.int64)
        for Mc in (_broadcast_cell_tensor(0.7, m.num_cells, g), Mc_percell):
            direct = native.p1_stencil_tables_direct(
                m.coords, V.cell_dofs, Mc, 64, n, want_volumes=True
            )
            assert direct is not None and direct != "too_wide"
            offs_d, mtab_d, ktab_d, vol_d = direct
            ref = native.p1_stencil_tables(cd, geom.volume, geom.grads, Mc, base, 64, n)
            offs_r, mtab_r, ktab_r = ref
            np.testing.assert_array_equal(offs_d, offs_r)
            np.testing.assert_allclose(mtab_d, mtab_r, rtol=1e-13, atol=1e-16)
            np.testing.assert_allclose(ktab_d, ktab_r, rtol=1e-12, atol=1e-14)
            np.testing.assert_allclose(vol_d, geom.volume, rtol=1e-13, atol=0)


def test_p1_stencil_direct_degenerate_cell_raises():
    from fenicsx_beat_tpu import mesh as meshmod
    from fenicsx_beat_tpu.fem import _broadcast_cell_tensor

    if not native.available():
        pytest.skip("native kit unavailable")
    m = meshmod.create_unit_square(None, 3, 3)
    coords = m.coords.copy()
    c0 = m.cells[0]
    coords[c0[1]] = coords[c0[0]]
    Mc = _broadcast_cell_tensor(1.0, m.num_cells, m.gdim)
    with pytest.raises(np.linalg.LinAlgError):
        native.p1_stencil_tables_direct(coords, m.cells, Mc, 64, m.num_vertices)


def test_p1_ell_direct_matches_coo_pipeline():
    import jax.numpy as jnp

    from fenicsx_beat_tpu import fem
    from fenicsx_beat_tpu.fem import (
        _assemble_mass_stiffness_ell_direct,
        assemble_mass_stiffness_coo,
    )
    from fenicsx_beat_tpu.geometry import get_lv_ellipsoid_geometry
    from fenicsx_beat_tpu.ops.sparse import coo_to_ell

    if not native.available():
        pytest.skip("native kit unavailable")
    # LV ellipsoid: genuinely unstructured, welded apex = high-degree rows
    m = get_lv_ellipsoid_geometry(psize_ref=0.8).mesh
    V = fem.functionspace(m, ("P", 1))
    pair = _assemble_mass_stiffness_ell_direct(V, 1.0, None)
    assert pair is not None
    mass_d, stiff_d = pair
    rows, cols, mv, kv, shape = assemble_mass_stiffness_coo(V, 1.0)
    mass_c = coo_to_ell(rows, cols, mv, shape)
    stiff_c = coo_to_ell(rows, cols, kv, shape)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(V.ndofs))
    for A, B in ((mass_d, mass_c), (stiff_d, stiff_c)):
        np.testing.assert_allclose(
            np.asarray(A @ x), np.asarray(B @ x), rtol=1e-12, atol=1e-13
        )
    np.testing.assert_allclose(
        np.asarray(mass_d.diagonal()), np.asarray(mass_c.diagonal()), rtol=1e-13
    )


def test_p1_ell_direct_tail_spill():
    import jax.numpy as jnp

    from fenicsx_beat_tpu import fem
    from fenicsx_beat_tpu import mesh as meshmod
    from fenicsx_beat_tpu.fem import _broadcast_cell_tensor
    from fenicsx_beat_tpu.ops.sparse import ELLMatrix

    if not native.available():
        pytest.skip("native kit unavailable")
    # tiny width forces most entries through the spill+dedup path
    m = meshmod.create_unit_square(None, 6, 5)
    V = fem.functionspace(m, ("P", 1))
    Mc = _broadcast_cell_tensor(1.0, m.num_cells, m.gdim)
    nat = native.p1_ell_tables_direct(m.coords, V.cell_dofs, Mc, V.ndofs, width=3)
    assert nat is not None
    cols, mvals, kvals, counts, tail = nat
    assert tail is not None and tail[0].size > 0
    spilled = ELLMatrix(
        cols=cols.astype(np.int32), vals=mvals, shape=(V.ndofs, V.ndofs),
        tail_rows=tail[0], tail_cols=tail[1], tail_vals=tail[2],
    )
    mass_ref, _ = fem.assemble_mass_stiffness(V, 1.0)
    x = jnp.asarray(np.random.default_rng(3).standard_normal(V.ndofs))
    np.testing.assert_allclose(
        np.asarray(spilled @ x), np.asarray(mass_ref @ x), rtol=1e-12, atol=1e-14
    )


def test_locate_points_matches_numpy_sweep():
    from fenicsx_beat_tpu import fem
    from fenicsx_beat_tpu import mesh as meshmod
    from fenicsx_beat_tpu.geometry import get_3D_slab_geometry

    if not native.available():
        pytest.skip("native kit unavailable")
    rng = np.random.default_rng(5)
    for make, lo, hi in (
        (lambda: meshmod.create_unit_square(None, 9, 7), 0.0, 1.0),
        (lambda: get_3D_slab_geometry(None, dx=0.5, Lx=5.0, Ly=3.0, Lz=2.0).mesh, 0.0, 2.0),
    ):
        m = make()
        g = m.gdim
        pts = rng.uniform(lo, hi, size=(12, g))
        pts = np.vstack([pts, m.coords[0], m.coords[-1]])  # vertices too
        got = native.locate_points(m.coords, m.cells, pts)
        # reference: the numpy sweep (force it by bypassing the native hook)
        geom = fem.cell_geometry(m)
        x0 = m.coords[m.cells[:, 0]]
        want = np.full(pts.shape[0], -1, dtype=np.int64)
        for pi, p in enumerate(pts):
            xi = np.einsum("cg,cig->ci", p[None, :] - x0, geom.inv_edges)
            lam0 = 1.0 - xi.sum(axis=1)
            ok = (xi >= -1e-10).all(axis=1) & (lam0 >= -1e-10)
            hits = np.nonzero(ok)[0]
            if hits.size:
                want[pi] = hits[0]
        np.testing.assert_array_equal(got, want)
        assert (got >= 0).all()  # all sampled points are inside the mesh
    # outside points return -1
    out = native.locate_points(m.coords, m.cells, np.full((1, m.gdim), 99.0))
    assert out[0] == -1


def test_cell_geometry_subset_matches_full():
    from fenicsx_beat_tpu import fem
    from fenicsx_beat_tpu import mesh as meshmod

    m = meshmod.create_unit_square(None, 6, 4)
    sel = np.array([0, 5, 17, 3])
    sub = fem.cell_geometry(m, sel)  # computed fresh (nothing cached yet)
    assert not hasattr(m, "_cell_geometry")
    full = fem.cell_geometry(m)
    np.testing.assert_allclose(sub.volume, full.volume[sel], rtol=1e-15)
    np.testing.assert_allclose(sub.grads, full.grads[sel], rtol=1e-14, atol=1e-16)
    sliced = fem.cell_geometry(m, sel)  # now sliced from the cache
    np.testing.assert_array_equal(sliced.volume, full.volume[sel])


def test_p1_geometry_degenerate_cell_raises():
    from fenicsx_beat_tpu import mesh as meshmod

    if not native.available():
        pytest.skip("native kit unavailable")
    m = meshmod.create_unit_square(None, 3, 3)
    coords = m.coords.copy()
    # collapse one cell: move a vertex onto another vertex of the same cell
    c0 = m.cells[0]
    coords[c0[1]] = coords[c0[0]]
    with pytest.raises(np.linalg.LinAlgError):
        native.p1_geometry(coords, m.cells, m.tdim)
