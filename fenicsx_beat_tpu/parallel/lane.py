"""Per-device lane-gather packing for the sharded solvers.

The sharded unstructured SpMV applies each device's local ELL block
against the halo-extended local vector — on TPU that inner gather is
the same ~1 GB/s XLA pathology the single-device paths left behind
(``ops/pallas_ell.py``).  This module packs every device's local block
(a rectangular ``[n_local, n_local + 2H]`` operator over the extended
index space) into the paged lane-gather format with UNIFORM static
shapes across devices (page/tail counts padded to the per-mesh maxima),
so the stacked arrays shard along the device axis and the kernel runs
identically on every shard inside ``shard_map``.
"""

from __future__ import annotations

import numpy as np

from ..ops.pallas_ell import BR, LANE, pack_lane_gather
from .partition import Partition1D

__all__ = ["partition_lane_gather"]


def partition_lane_gather(
    part: Partition1D,
    cols3: np.ndarray,
    vals3_list: list[np.ndarray],
    tail3,
    dtype,
    max_planes: int = 48,
):
    """Pack per-device local ELL blocks (shared sparsity) into stacked
    lane-gather arrays.

    ``cols3``: ``[nd, n_local, W]`` extended-local columns;
    ``vals3_list``: k same-pattern value stacks ``[nd, n_local, W]``;
    ``tail3``: ``None`` or ``(tr3, tc3, tv3_0, tv3_1, ...)`` per-device
    COO tails in the same extended-local space (merged into the pack —
    the lane format has its own overflow tail).

    Returns ``(ri4 [nd, nb, NP, 8], l5 [nd, nb, NP, 8, 128],
    [v5_k ...], diag2_k [nd, n_local] ..., (ttr, ttc, ttv_k...) or None,
    meta)``.
    """
    nd, nl, W = cols3.shape
    n_ext = nl + 2 * part.halo
    nk = len(vals3_list)
    rows = np.repeat(np.arange(nl, dtype=np.int64), W)

    packs = []
    NP = 1
    nt = 0
    for d in range(nd):
        cols = np.asarray(cols3[d], dtype=np.int64).reshape(-1)
        stacked = np.stack(
            [np.asarray(v[d], dtype=np.float64).reshape(-1) for v in vals3_list]
        )
        r_all, c_all, v_all = rows, cols, stacked
        if tail3 is not None:
            tr = np.asarray(tail3[0][d], dtype=np.int64)
            tc = np.asarray(tail3[1][d], dtype=np.int64)
            tvs = np.stack(
                [np.asarray(tail3[2 + k][d], dtype=np.float64) for k in range(nk)]
            )
            r_all = np.concatenate([rows, tr])
            c_all = np.concatenate([cols, tc])
            v_all = np.concatenate([stacked, tvs], axis=1)
        ri, lanes, pvals, tail, meta = pack_lane_gather(
            r_all, c_all, v_all, (nl, n_ext), max_planes=max_planes, dtype=dtype
        )
        packs.append((ri, lanes, pvals, tail, meta))
        NP = max(NP, meta["NP"])
        nt = max(nt, meta["tail_nnz"])

    nb = packs[0][4]["nb"]
    Rc = packs[0][4]["Rc"]
    npdt = np.dtype(dtype)
    ri4 = np.zeros((nd, nb, NP, BR), dtype=np.int32)
    l5 = np.zeros((nd, nb, NP, BR, LANE), dtype=np.int32)
    v5 = [np.zeros((nd, nb, NP, BR, LANE), dtype=npdt) for _ in range(nk)]
    ttr = np.zeros((nd, nt), dtype=np.int32)
    ttc = np.zeros((nd, nt), dtype=np.int32)
    ttv = [np.zeros((nd, nt), dtype=npdt) for _ in range(nk)]
    for d, (ri, lanes, pvals, tail, meta) in enumerate(packs):
        p = meta["NP"]
        ri4[d, :, :p] = ri
        l5[d, :, :p] = lanes
        for k in range(nk):
            v5[k][d, :, :p] = pvals[k]
        if tail is not None:
            m = tail[0].size
            ttr[d, :m] = tail[0]
            ttc[d, :m] = tail[1]
            for k in range(nk):
                ttv[k][d, :m] = tail[2][k]

    # per-device diagonals of each value stream (the system diagonal is a
    # value-level combination downstream, like the ELL path's diag_of)
    rows_ext = (np.arange(nl) + part.halo)[:, None]
    diags = []
    for k in range(nk):
        dk = np.sum(
            np.where(np.asarray(cols3) == rows_ext[None], np.asarray(vals3_list[k]), 0.0),
            axis=2,
        )
        if tail3 is not None:
            tr = np.asarray(tail3[0])
            tc = np.asarray(tail3[1])
            tv = np.asarray(tail3[2 + k])
            on = tc == tr + part.halo
            for d in range(nd):
                np.add.at(dk[d], tr[d][on[d]], tv[d][on[d]])
        diags.append(dk.astype(npdt))

    tails = None if nt == 0 else (ttr, ttc, *ttv)
    meta = {"NP": NP, "nb": nb, "Rc": Rc, "n_ext": n_ext, "tail_nnz_max": nt}
    return ri4, l5, v5, diags, tails, meta
