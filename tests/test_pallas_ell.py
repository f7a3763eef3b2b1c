"""Paged lane-gather SpMV gates (ops/pallas_ell.py — the TPU-native
unstructured SpMV; interpret mode on CPU, like the other pallas tests).

Replaces the XLA gather ELL path on TPU, which measured ~1 GB/s
effective (51 ms per application at 442k nodes); the paged kernel
measured 62x faster on the same operator shape (docs/DESIGN.md §3).
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from fenicsx_beat_tpu import fem
from fenicsx_beat_tpu.ops.pallas_ell import LaneGatherMatrix, pack_lane_gather


def _random_coo(n_rows, n_cols, nnz_per_row, band=None, seed=0):
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n_rows), nnz_per_row)
    if band is None:
        cols = rng.integers(0, n_cols, size=rows.size)
    else:
        cols = np.clip(rows + rng.integers(-band, band, size=rows.size), 0, n_cols - 1)
    vals = rng.standard_normal(rows.size)
    return sp.csr_matrix((vals, (rows, cols)), shape=(n_rows, n_cols))


@pytest.mark.parametrize("band", [None, 150])
def test_spmv_matches_scipy(band):
    A = _random_coo(2000, 2000, 7, band=band)
    L = LaneGatherMatrix.from_operator(A, interpret=True).to_device()
    x = np.random.default_rng(1).standard_normal(2000)
    np.testing.assert_allclose(
        np.asarray(L @ jnp.asarray(x)), A @ x, rtol=1e-13, atol=1e-13
    )
    np.testing.assert_allclose(np.asarray(L.diagonal()), A.diagonal(), atol=1e-15)


def test_rectangular_operator():
    """AMG transfer matrices are rectangular; absolute source rows make
    the format shape-agnostic."""
    A = sp.random(900, 2100, density=0.003, random_state=3, format="csr")
    L = LaneGatherMatrix.from_operator(A, interpret=True).to_device()
    x = np.random.default_rng(2).standard_normal(2100)
    np.testing.assert_allclose(
        np.asarray(L @ jnp.asarray(x)), A @ x, rtol=1e-12, atol=1e-13
    )


def test_lv_operator_with_apex_tail():
    """The production shape: RCM-ordered LV stiffness including the
    welded-apex rows (page overflow spills to the COO tail)."""
    from fenicsx_beat_tpu.geometry import get_lv_ellipsoid_geometry
    from fenicsx_beat_tpu.native import rcm_ordering
    from fenicsx_beat_tpu.ops.amg import operator_to_csr
    from fenicsx_beat_tpu.parallel.solver import ell_adjacency

    geo = get_lv_ellipsoid_geometry(psize_ref=0.55)
    V = fem.functionspace(geo.mesh, ("P", 1))
    mass, K = fem.assemble_mass_stiffness(V, 1.0)
    indptr, ucols = ell_adjacency(mass)
    perm = rcm_ordering(indptr, ucols).astype(np.int64)
    iperm = np.empty(V.ndofs, dtype=np.int64)
    iperm[perm] = np.arange(V.ndofs)
    Kc = operator_to_csr(K).tocoo()
    Kp = sp.csr_matrix((Kc.data, (iperm[Kc.row], iperm[Kc.col])), shape=K.shape)
    L = LaneGatherMatrix.from_operator(Kp, max_planes=24, interpret=True)
    assert L.has_tail  # the apex genuinely overflows 24 pages
    L = L.to_device()
    x = np.random.default_rng(0).standard_normal(V.ndofs)
    np.testing.assert_allclose(
        np.asarray(L @ jnp.asarray(x)), Kp @ x, rtol=1e-12, atol=1e-12
    )


def test_combine_value_level():
    """Mass/stiffness pairs packed with ONE shared layout
    (from_operator_pair) combine value-wise — the dt-traced theta-system
    combination every solver relies on.  Each operator carries exact
    zeros the other doesn't (the case separate packing would get wrong)."""
    rng = np.random.default_rng(4)
    n = 1500
    base = _random_coo(n, n, 6, band=100, seed=5).tocoo()
    da = base.data.copy()
    db = rng.standard_normal(base.data.size)
    da[::7] = 0.0  # exact zeros in A only
    db[3::7] = 0.0  # ...and different ones in B
    A = sp.csr_matrix((da, (base.row, base.col)), shape=(n, n))
    B = sp.csr_matrix((db, (base.row, base.col)), shape=(n, n))
    La, Lb = LaneGatherMatrix.from_operator_pair(A, B, interpret=True)
    La, Lb = La.to_device(), Lb.to_device()
    x0 = np.random.default_rng(9).standard_normal(n)
    np.testing.assert_allclose(np.asarray(La @ jnp.asarray(x0)), A @ x0,
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(Lb @ jnp.asarray(x0)), B @ x0,
                               rtol=1e-12, atol=1e-12)
    C = La.combine(2.0, Lb, -0.3)
    x = rng.standard_normal(n)
    np.testing.assert_allclose(
        np.asarray(C @ jnp.asarray(x)), (2.0 * A - 0.3 * B) @ x,
        rtol=1e-12, atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(C.diagonal()), (2.0 * A - 0.3 * B).diagonal(), atol=1e-13
    )


def test_pack_dedups_and_reports():
    rows = np.array([0, 0, 0, 1])
    cols = np.array([1, 1, 2, 0])
    vals = np.array([2.0, 3.0, 1.0, 4.0])
    rowidx, lanes, pvals, tail, meta = pack_lane_gather(
        rows, cols, vals, (2, 3), dtype=np.float64
    )
    assert tail is None and meta["NP"] >= 1
    # duplicate (0,1) summed to 5.0
    A = sp.csr_matrix((vals, (rows, cols)), shape=(2, 3))
    L = LaneGatherMatrix.from_operator(A, interpret=True).to_device()
    x = np.array([1.0, 10.0, 100.0])
    np.testing.assert_allclose(np.asarray(L @ jnp.asarray(x)), [150.0, 4.0])


def test_pytree_roundtrip():
    import jax

    A = _random_coo(600, 600, 5, band=60)
    L = LaneGatherMatrix.from_operator(A, interpret=True).to_device()
    leaves, treedef = jax.tree_util.tree_flatten(L)
    L2 = jax.tree_util.tree_unflatten(treedef, leaves)
    x = np.random.default_rng(7).standard_normal(600)
    np.testing.assert_allclose(
        np.asarray(L2 @ jnp.asarray(x)), np.asarray(L @ jnp.asarray(x))
    )
