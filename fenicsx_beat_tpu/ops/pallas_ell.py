"""Lane-gather (paged) sparse format: the TPU-native unstructured SpMV.

The XLA gather that powers :func:`~fenicsx_beat_tpu.ops.sparse.ell_spmv`
is the single worst op on this hardware: measured **~1 GB/s effective**
on a v5e (1.36 ms at 9.8k nodes, 51 ms at 442k, 265 ms at 1.9M per
application, W=16) — XLA lowers the per-element gather to serialized
VPU work.  Mosaic exposes exactly one fast gather, ``tpu.dynamic_gather``
(a same-shape ``take_along_axis``), plus cheap dynamic row slices of
VMEM-resident operands.  This module reformulates the ELL SpMV around
those two:

Number nodes ``node = 128*s + j`` (sublane s, lane j — the natural
``[R, 128]`` vector layout).  An entry ``A[i, c]`` reads source sublane
``r = c >> 7`` at source lane ``l = c & 127``.  Pack each target
sublane's entries into PAGES: page p of sublane s carries at most one
entry per target lane, all from ONE source sublane ``rowidx[p, s]``
(entries hitting the same (lane, source-sublane) slot repeatedly —
collisions — go to later pages).  Applying one page across a block of
``Br = 8`` target sublanes is then

  1. eight dynamic ROW SLICES of the VMEM-resident ``x`` (one per
     target sublane) assembled into an ``[8, 128]`` tile, and
  2. ONE lane-wise ``take_along_axis`` (``tpu.dynamic_gather``) + FMA,

i.e. dense vreg work only — no serialized element gathers anywhere.
Page counts are set by the matrix (FEM P1 after RCM: ~30-40 pages for
~15 nnz/row); pages beyond ``max_planes`` (pathological rows, e.g. the
LV welded apex) spill to a tiny COO tail applied by XLA scatter-add.
Source rows are ABSOLUTE, so the format needs no bandedness at all and
handles rectangular operators (AMG transfer matrices) unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["LaneGatherMatrix", "pack_lane_gather", "build_lane_gather_spmv"]

LANE = 128
BR = 8  # target sublanes per grid block (1024 nodes)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _occurrence_index(key: np.ndarray) -> np.ndarray:
    """occ[i] = rank of entry i among entries sharing key[i] (stable)."""
    order = np.argsort(key, kind="stable")
    ks = key[order]
    first = np.ones(ks.size, dtype=bool)
    if ks.size:
        first[1:] = ks[1:] != ks[:-1]
    gid = np.cumsum(first) - 1
    starts = np.nonzero(first)[0]
    occ_sorted = np.arange(ks.size, dtype=np.int64) - starts[gid]
    occ = np.empty_like(occ_sorted)
    occ[order] = occ_sorted
    return occ


def pack_lane_gather(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    shape: tuple[int, int],
    *,
    max_planes: int = 48,
    dtype=np.float32,
):
    """Pack COO triplets (duplicates summed) into the paged lane-gather
    format.  Returns ``(rowidx [nb, NP, 8] int32, lanes [nb, NP, 8, 128]
    int32, plane_vals [nb, NP, 8, 128], tail or None, meta)``.

    ``vals`` may be ``[nnz]`` or stacked ``[k, nnz]`` — stacked value
    sets share ONE page layout (placement decided by the union pattern),
    so the resulting matrices :meth:`LaneGatherMatrix.combine`
    value-wise; outputs then gain a leading ``k`` axis."""
    n_rows, n_cols = shape
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    vals = np.asarray(vals, dtype=np.float64)
    stacked = vals.ndim == 2
    vals2 = vals if stacked else vals[None]
    key = rows * n_cols + cols
    order = np.argsort(key, kind="stable")
    uniq, inv = np.unique(key[order], return_inverse=True)
    summed = np.zeros((vals2.shape[0], uniq.size), dtype=np.float64)
    for k in range(vals2.shape[0]):
        np.add.at(summed[k], inv, vals2[k][order])
    rows = uniq // n_cols
    cols = uniq % n_cols
    vals2 = summed
    live = (vals2 != 0.0).any(axis=0)
    rows, cols, vals2 = rows[live], cols[live], vals2[:, live]

    s = rows >> 7
    j = rows & (LANE - 1)
    r = cols >> 7
    Rs = _round_up(max(n_rows, 1), LANE) // LANE
    Rc = _round_up(max(n_cols, 1), LANE) // LANE
    R_pad = _round_up(Rs, BR)
    nb = R_pad // BR

    # collision index within (target sublane, target lane, source sublane)
    occ = _occurrence_index((s * Rc + r) * LANE + j)
    # page = rank of (r, occ) among the target sublane's unique pairs
    maxo = int(occ.max()) + 1 if occ.size else 1
    pk = (s * Rc + r) * maxo + occ
    po = np.argsort(pk, kind="stable")
    pks = pk[po]
    pfirst = np.ones(pks.size, dtype=bool)
    if pks.size:
        pfirst[1:] = pks[1:] != pks[:-1]
    pair_s = s[po][pfirst]  # target sublane of each unique (s, r, occ)
    upos = np.arange(pair_s.size, dtype=np.int64)
    sstart = np.searchsorted(pair_s, np.arange(R_pad))
    page_of_pair = upos - sstart[pair_s]
    pair_id = np.cumsum(pfirst) - 1
    page = np.empty(pks.size, dtype=np.int64)
    page[po] = page_of_pair[pair_id]

    NP_full = int(page.max()) + 1 if page.size else 1
    NP = min(NP_full, max_planes)
    keep = page < NP

    b = s >> 3
    sr = s & 7
    nk = vals2.shape[0]
    rowidx = np.zeros((nb, NP, BR), dtype=np.int32)
    lanes = np.zeros((nb, NP, BR, LANE), dtype=np.int32)
    pvals = np.zeros((nk, nb, NP, BR, LANE), dtype=np.dtype(dtype))
    kb, kp, ks, kj = b[keep], page[keep], sr[keep], j[keep]
    rowidx[kb, kp, ks] = r[keep].astype(np.int32)
    lanes[kb, kp, ks, kj] = (cols[keep] & (LANE - 1)).astype(np.int32)
    for k in range(nk):
        pvals[k][kb, kp, ks, kj] = vals2[k][keep]

    tail = None
    if (~keep).any():
        tail = (
            rows[~keep].astype(np.int32),
            cols[~keep].astype(np.int32),
            vals2[:, ~keep].astype(np.dtype(dtype)),
        )
    meta = {
        "n_rows": n_rows,
        "n_cols": n_cols,
        "R_pad": R_pad,
        "Rc": Rc,
        "nb": nb,
        "NP": NP,
        "NP_unclipped": NP_full,
        "tail_nnz": 0 if tail is None else int(tail[0].size),
        "occupancy": float(keep.sum() / max(pvals[0].size, 1)),
    }
    if not stacked:
        pvals = pvals[0]
        if tail is not None:
            tail = (tail[0], tail[1], tail[2][0])
    return rowidx, lanes, pvals, tail, meta


@lru_cache(maxsize=64)
def build_lane_gather_spmv(
    n_rows: int,
    n_cols: int,
    R_pad: int,
    Rc: int,
    NP: int,
    dtype_name: str,
    interpret: bool,
):
    """Jittable ``spmv(rowidx, lanes, vals, x) -> y`` for the paged
    format (static shapes baked; cached per configuration)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = jnp.dtype(dtype_name)
    nb = R_pad // BR

    def kernel(rowidx_ref, x_ref, lanes_ref, vals_ref, o_ref, scratch):
        acc = jnp.zeros((BR, LANE), dtype)
        for p in range(NP):
            # page source tile: per-sublane scalar-indexed VMEM row reads
            # staged through a scratch ref (measured: jnp.concatenate of
            # the 8 row slices relayouts per plane — 17x slower end to
            # end than these stores; row indices are per-block SMEM
            # scalars — whole-array scalar prefetch overflows SMEM at
            # production sizes)
            for s in range(BR):
                scratch[s, :] = x_ref[rowidx_ref[0, p, s], :]
            g = jnp.take_along_axis(scratch[:], lanes_ref[0, p], axis=1)
            acc = acc + vals_ref[0, p] * g
        o_ref[:] = acc

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R_pad, LANE), dtype),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(
                (1, NP, BR), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((Rc, LANE), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, NP, BR, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, NP, BR, LANE), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (BR, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((BR, LANE), dtype)],
        interpret=interpret,
    )

    def spmv(rowidx, lanes, vals, x):
        x_ext = jnp.zeros((Rc * LANE,), dtype=dtype)
        x_ext = jax.lax.dynamic_update_slice(x_ext, x.astype(dtype), (0,))
        y = call(rowidx, x_ext.reshape(Rc, LANE), lanes, vals)
        return y.reshape(R_pad * LANE)[:n_rows]

    return spmv


@jax.tree_util.register_pytree_node_class
@dataclass
class LaneGatherMatrix:
    """Sparse matrix in the paged lane-gather format (TPU path for
    unstructured operators; see module docstring).  ``@`` dispatches to
    the pallas kernel; the optional COO ``tail`` (page overflow on
    pathological rows) is applied with an XLA scatter-add, like the
    hybrid ELL apex tail."""

    rowidx: jnp.ndarray  # [nb, NP, 8] int32 (absolute source sublanes)
    lanes: jnp.ndarray  # [nb, NP, 8, 128] int32
    vals: jnp.ndarray  # [nb, NP, 8, 128]
    shape: tuple[int, int]
    Rc: int  # padded source sublane count
    interpret: bool = False
    tail_rows: jnp.ndarray | None = None
    tail_cols: jnp.ndarray | None = None
    tail_vals: jnp.ndarray | None = None
    diag: jnp.ndarray | None = None  # [n], captured at pack time

    def tree_flatten(self):
        return (
            self.rowidx, self.lanes, self.vals,
            self.tail_rows, self.tail_cols, self.tail_vals, self.diag,
        ), (self.shape, self.Rc, self.interpret)

    @classmethod
    def tree_unflatten(cls, aux, children):
        rowidx, lanes, vals, tr, tc, tv, diag = children
        return cls(
            rowidx=rowidx, lanes=lanes, vals=vals, shape=aux[0], Rc=aux[1],
            interpret=aux[2], tail_rows=tr, tail_cols=tc, tail_vals=tv, diag=diag,
        )

    @classmethod
    def from_operator(
        cls, A, *, dtype=None, interpret: bool | None = None, max_planes: int = 48
    ) -> "LaneGatherMatrix":
        """Convert a host-backed ELLMatrix / StencilMatrix / scipy sparse
        matrix."""
        import scipy.sparse as sp

        from .amg import operator_to_csr

        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        M = (A if sp.issparse(A) else operator_to_csr(A)).tocoo()
        if dtype is None:
            dtype = M.data.dtype
        npdt = np.dtype(jnp.dtype(dtype).name)
        rowidx, lanes, pvals, tail, meta = pack_lane_gather(
            M.row, M.col, M.data, M.shape, max_planes=max_planes, dtype=npdt
        )
        diag = None
        if M.shape[0] == M.shape[1]:
            diag = np.zeros(M.shape[0], dtype=npdt)
            on = M.row == M.col
            diag[M.row[on]] = M.data[on]
        return cls(
            rowidx=rowidx, lanes=lanes, vals=pvals, shape=M.shape,
            Rc=meta["Rc"], interpret=bool(interpret),
            tail_rows=None if tail is None else tail[0],
            tail_cols=None if tail is None else tail[1],
            tail_vals=None if tail is None else tail[2],
            diag=diag,
        )

    @classmethod
    def from_operator_group(
        cls, ops, *, dtype=None, interpret: bool | None = None, max_planes: int = 48
    ) -> tuple["LaneGatherMatrix", ...]:
        """Pack same-pattern operators (mass/stiffness/k_ie groups) with
        ONE shared page layout, so :meth:`combine` between them is valid
        (the dt-traced theta-system combination every solver relies on).
        Packing them separately would drop each one's own exact zeros and
        the layouts could diverge."""
        import scipy.sparse as sp

        from .amg import operator_to_csr

        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        Ms = [(A if sp.issparse(A) else operator_to_csr(A)).tocoo() for A in ops]
        if dtype is None:
            dtype = Ms[0].data.dtype
        npdt = np.dtype(jnp.dtype(dtype).name)
        # union pattern: concatenate every triplet set with zero partners
        # (pack_lane_gather dedup-sums, so shared entries merge)
        rows = np.concatenate([M.row for M in Ms])
        cols = np.concatenate([M.col for M in Ms])
        sizes = [M.data.size for M in Ms]
        total = sum(sizes)
        stacked = np.zeros((len(Ms), total))
        off = 0
        for k, M in enumerate(Ms):
            stacked[k, off : off + sizes[k]] = M.data
            off += sizes[k]
        rowidx, lanes, pvals, tail, meta = pack_lane_gather(
            rows, cols, stacked, Ms[0].shape, max_planes=max_planes, dtype=npdt
        )

        def diag_of(M):
            d = np.zeros(M.shape[0], dtype=npdt)
            on = M.row == M.col
            d[M.row[on]] = M.data[on]
            return d

        square = Ms[0].shape[0] == Ms[0].shape[1]
        return tuple(
            cls(
                rowidx=rowidx, lanes=lanes, vals=pvals[k], shape=Ms[0].shape,
                Rc=meta["Rc"], interpret=bool(interpret),
                tail_rows=None if tail is None else tail[0],
                tail_cols=None if tail is None else tail[1],
                tail_vals=None if tail is None else tail[2][k],
                diag=diag_of(M) if square else None,
            )
            for k, M in enumerate(Ms)
        )

    @classmethod
    def from_operator_pair(
        cls, A, B, *, dtype=None, interpret: bool | None = None, max_planes: int = 48
    ) -> tuple["LaneGatherMatrix", "LaneGatherMatrix"]:
        """Two-operator convenience form of :meth:`from_operator_group`."""
        return cls.from_operator_group(
            (A, B), dtype=dtype, interpret=interpret, max_planes=max_planes
        )

    @property
    def n_planes(self) -> int:
        return self.rowidx.shape[1]

    @property
    def has_tail(self) -> bool:
        return self.tail_rows is not None and self.tail_rows.shape[0] > 0

    def diagonal(self) -> jnp.ndarray:
        return self.diag

    def combine(self, ca, other: "LaneGatherMatrix | None", cb) -> "LaneGatherMatrix":
        """``ca*self + cb*other`` for matrices packed from one sparsity
        pattern (identical page layout by construction — same mesh, same
        assembler)."""
        vals = ca * self.vals + (cb * other.vals if other is not None else 0.0)
        tail = self.tail_vals
        if tail is not None:
            tail = ca * tail + (cb * other.tail_vals if other is not None else 0.0)
        diag = self.diag
        if diag is not None:
            diag = ca * diag + (cb * other.diag if other is not None else 0.0)
        return LaneGatherMatrix(
            rowidx=self.rowidx, lanes=self.lanes, vals=vals, shape=self.shape,
            Rc=self.Rc, interpret=self.interpret, tail_rows=self.tail_rows,
            tail_cols=self.tail_cols, tail_vals=tail, diag=diag,
        )

    def to_device(self) -> "LaneGatherMatrix":
        put = jax.device_put
        mb = lambda a: None if a is None else put(jnp.asarray(a))  # noqa: E731
        return LaneGatherMatrix(
            rowidx=put(jnp.asarray(self.rowidx)),
            lanes=put(jnp.asarray(self.lanes)),
            vals=put(jnp.asarray(self.vals)),
            shape=self.shape, Rc=self.Rc, interpret=self.interpret,
            tail_rows=mb(self.tail_rows), tail_cols=mb(self.tail_cols),
            tail_vals=mb(self.tail_vals), diag=mb(self.diag),
        )

    def __matmul__(self, x: jnp.ndarray) -> jnp.ndarray:
        nb, NP, _ = self.rowidx.shape
        spmv = build_lane_gather_spmv(
            self.shape[0], self.shape[1], nb * BR, self.Rc, NP,
            jnp.dtype(self.vals.dtype).name, self.interpret,
        )
        y = spmv(self.rowidx, self.lanes, self.vals, x)
        if self.has_tail:
            y = y.at[self.tail_rows].add(self.tail_vals * x[self.tail_cols])
        return y
