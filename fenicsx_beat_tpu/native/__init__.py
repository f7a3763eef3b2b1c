"""Native host-side kernels (C++ via ctypes), with NumPy fallbacks.

Replaces the native setup machinery the reference obtains from DOLFINx
C++ / PETSc (entity enumeration, matrix assembly ordering — reference
``src/beat/geometry.py:112-139``, ``src/beat/base_model.py:114-124``).
The library is compiled on first use with ``g++ -O3`` into the user cache
directory, keyed by a hash of the source; if no compiler is available the
pure-NumPy implementations are used transparently.

Public API (all host-side, numpy in/out):

* ``unique_rows(rows)`` — lexicographically unique int32 rows.
* ``coo_to_ell_arrays(rows, cols, vals, shape, width=None)`` — padded ELL.
* ``rcm_ordering(indptr, indices)`` — reverse Cuthill-McKee permutation.
* ``available()`` — True when the compiled library is in use.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

__all__ = [
    "available",
    "unique_rows",
    "coo_to_ell_arrays",
    "rcm_ordering",
    "p1_geometry",
    "p1_stencil_tables",
    "p1_stencil_tables_direct",
    "p1_ell_tables_direct",
    "locate_points",
]

_SRC = Path(__file__).with_name("beatkit.cpp")
_LIB = None
_TRIED = False


def _cache_dir() -> Path:
    base = os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache"))
    d = Path(base) / "fenicsx_beat_tpu"
    d.mkdir(parents=True, exist_ok=True)
    return d


def _build() -> ctypes.CDLL | None:
    if not _SRC.is_file():
        return None
    src = _SRC.read_bytes()
    tag = hashlib.sha256(src).hexdigest()[:16]
    out = _cache_dir() / f"libbeatkit-{tag}.so"
    if not out.is_file():
        with tempfile.TemporaryDirectory() as td:
            tmp = Path(td) / out.name
            cmd = [
                "g++",
                "-O3",
                "-std=c++17",
                "-shared",
                "-fPIC",
                str(_SRC),
                "-o",
                str(tmp),
            ]
            try:
                subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            except (OSError, subprocess.SubprocessError) as ex:
                logger.info("beatkit native build unavailable (%s); using NumPy paths", ex)
                return None
            os.replace(tmp, out)
    try:
        lib = ctypes.CDLL(str(out))
    except OSError as ex:  # pragma: no cover
        logger.info("beatkit load failed (%s); using NumPy paths", ex)
        return None

    i64, i32p, i64p, f64p = (
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_double),
    )
    lib.unique_rows_i32.restype = i64
    lib.unique_rows_i32.argtypes = [i32p, i64, i64, i32p]
    lib.coo_to_ell_f64.restype = i64
    lib.coo_to_ell_f64.argtypes = [i64p, i64p, f64p, i64, i64, i64, ctypes.c_int32, i32p, f64p]
    lib.rcm_ordering.restype = None
    lib.rcm_ordering.argtypes = [i64p, i32p, i64, i32p]
    lib.p1_geometry.restype = i64
    lib.p1_geometry.argtypes = [f64p, i32p, i64, ctypes.c_int32, f64p, f64p, f64p]
    lib.p1_stencil_offsets.restype = i64
    lib.p1_stencil_offsets.argtypes = [i64p, i64, ctypes.c_int32, i64, i64p]
    lib.p1_stencil_assemble.restype = i64
    lib.p1_stencil_assemble.argtypes = [
        i64p, i64, ctypes.c_int32,          # cd, nc, nd
        f64p, f64p, ctypes.c_int32,         # vol, grads, g
        f64p, i64,                          # mc, mc_stride
        f64p, i64p, i64,                    # base, offs, K
        f64p, f64p,                         # mst, kst
    ]
    lib.p1_stencil_offsets_i32.restype = i64
    lib.p1_stencil_offsets_i32.argtypes = [i32p, i64, ctypes.c_int32, i64, i64p]
    lib.p1_stencil_assemble_direct.restype = i64
    lib.p1_stencil_assemble_direct.argtypes = [
        f64p, i32p, i64, ctypes.c_int32,    # coords, cells, nc, d
        f64p, i64,                          # mc, mc_stride
        i64p, i64,                          # offs, K
        f64p, f64p, f64p,                   # mst, kst, vol_out (nullable)
    ]
    lib.p1_ell_assemble_direct.restype = i64
    lib.p1_ell_assemble_direct.argtypes = [
        f64p, i32p, i64, ctypes.c_int32,    # coords, cells, nc, d
        f64p, i64,                          # mc, mc_stride
        i64, ctypes.c_int32,                # n, width
        i32p, i32p, f64p, f64p,             # counts, cols, mvals, kvals
        i64, i64p,                          # tail_cap, tail_n_out
        i32p, i32p, f64p, f64p,             # tail rows/cols/mvals/kvals
    ]
    lib.locate_points.restype = None
    lib.locate_points.argtypes = [
        f64p, i32p, i64, ctypes.c_int32,    # coords, cells, nc, g
        f64p, i64, ctypes.c_double,         # pts, np, tol
        i64p,                               # out
    ]
    return lib


def _get_lib() -> ctypes.CDLL | None:
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        if os.environ.get("BEAT_TPU_NO_NATIVE"):
            _LIB = None
        else:
            _LIB = _build()
    return _LIB


def available() -> bool:
    return _get_lib() is not None


def _as_ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def unique_rows(rows: np.ndarray) -> np.ndarray:
    """Unique rows (lexicographically sorted) of an int array [n, k]."""
    rows = np.ascontiguousarray(rows, dtype=np.int32)
    lib = _get_lib()
    if lib is None:
        return np.unique(rows, axis=0)
    n, k = rows.shape
    out = np.empty_like(rows)
    m = lib.unique_rows_i32(_as_ptr(rows, ctypes.c_int32), n, k, _as_ptr(out, ctypes.c_int32))
    return out[:m].copy()


def coo_to_ell_arrays(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    shape: tuple[int, int],
    width: int | None = None,
) -> tuple[np.ndarray, np.ndarray, int, np.ndarray]:
    """Padded-ELL (cols[n,w] int32, vals[n,w] f64, width, row_counts) from
    COO with duplicate summation.  Padding columns point at the row itself
    with a zero value (gather-safe); ``row_counts`` gives the real (non-pad)
    entries per row."""
    nrows = shape[0]
    rows = np.ascontiguousarray(rows, dtype=np.int64)
    cols = np.ascontiguousarray(cols, dtype=np.int64)
    vals = np.ascontiguousarray(vals, dtype=np.float64)
    lib = _get_lib()
    if lib is None:
        return _coo_to_ell_numpy(rows, cols, vals, nrows, width)
    if width is None:
        # conservative first guess: max raw row count (>= deduped width)
        width = int(np.bincount(rows, minlength=nrows).max()) if rows.size else 1
    cols_out = np.empty((nrows, width), dtype=np.int32)
    vals_out = np.empty((nrows, width), dtype=np.float64)
    w = lib.coo_to_ell_f64(
        _as_ptr(rows, ctypes.c_int64),
        _as_ptr(cols, ctypes.c_int64),
        _as_ptr(vals, ctypes.c_double),
        rows.size,
        nrows,
        width,
        -1,
        _as_ptr(cols_out, ctypes.c_int32),
        _as_ptr(vals_out, ctypes.c_double),
    )
    if w < 0:  # width estimate too small (cannot happen with bincount guess)
        return _coo_to_ell_numpy(rows, cols, vals, nrows, None)
    w = max(int(w), 1)
    cols_out = cols_out[:, :w]
    vals_out = vals_out[:, :w]
    # pad entries point at the row itself (value 0) for gather locality
    row_ids = np.broadcast_to(np.arange(nrows, dtype=np.int32)[:, None], cols_out.shape)
    pad = cols_out < 0
    counts = (w - pad.sum(axis=1)).astype(np.int64)
    cols_out = np.where(pad, row_ids, cols_out)
    return cols_out, vals_out, w, counts


def _coo_to_ell_numpy(rows, cols, vals, nrows, width):
    order = np.lexsort((cols, rows))
    r, c, v = rows[order], cols[order], vals[order]
    # collapse duplicates
    if r.size:
        new = np.ones(r.size, dtype=bool)
        new[1:] = (r[1:] != r[:-1]) | (c[1:] != c[:-1])
        seg = np.cumsum(new) - 1
        v = np.bincount(seg, weights=v)
        r, c = r[new], c[new]
    counts = np.bincount(r, minlength=nrows).astype(np.int64)
    w = max(int(counts.max()) if counts.size else 1, 1)
    if width is not None:
        w = max(w, int(width))
    cols_out = np.broadcast_to(np.arange(nrows, dtype=np.int32)[:, None], (nrows, w)).copy()
    vals_out = np.zeros((nrows, w), dtype=np.float64)
    offs = np.concatenate([[0], np.cumsum(counts)])
    pos = np.arange(r.size) - offs[r]
    cols_out[r, pos] = c.astype(np.int32)
    vals_out[r, pos] = v
    return cols_out, vals_out, w, counts


def p1_geometry(coords: np.ndarray, cells: np.ndarray, tdim: int):
    """One-pass P1 simplex cell geometry (tdim == gdim in {1, 2, 3}):
    ``(edges [nc, d, d], volume [nc], grads [nc, d+1, d])`` — the
    fem.CellGeometry layout.  Returns ``None`` when the native kit is
    unavailable or the dimension unsupported (caller uses the NumPy
    pipeline); raises ``numpy.linalg.LinAlgError`` on degenerate cells to
    match the NumPy path."""
    lib = _get_lib()
    if lib is None or tdim not in (1, 2, 3) or coords.shape[1] != tdim:
        return None
    coords = np.ascontiguousarray(coords, dtype=np.float64)
    cells = np.ascontiguousarray(cells, dtype=np.int32)
    nc, nd = cells.shape
    if nd != tdim + 1:
        return None
    edges = np.empty((nc, tdim, tdim), dtype=np.float64)
    volume = np.empty(nc, dtype=np.float64)
    grads = np.empty((nc, tdim + 1, tdim), dtype=np.float64)
    rc = lib.p1_geometry(
        _as_ptr(coords, ctypes.c_double),
        _as_ptr(cells, ctypes.c_int32),
        nc,
        tdim,
        _as_ptr(edges, ctypes.c_double),
        _as_ptr(volume, ctypes.c_double),
        _as_ptr(grads, ctypes.c_double),
    )
    if rc == -1:
        raise np.linalg.LinAlgError(
            "singular cell Jacobian: mesh contains degenerate "
            "(zero-volume) cells"
        )
    if rc != 0:  # unsupported dimension guard inside the kernel
        return None
    return edges, volume, grads


def p1_stencil_tables(
    cd: np.ndarray,
    vol: np.ndarray,
    grads: np.ndarray,
    Mc: np.ndarray,
    base: np.ndarray,
    max_offsets: int,
    n: int,
):
    """One-pass direct stencil assembly of the P1 mass/stiffness tables.

    ``cd [nc, nd]`` cell dofs, ``vol [nc]``, ``grads [nc, nd, g]``,
    ``Mc [nc, g, g]`` per-cell conductivity (a stride-0 broadcast along
    axis 0 is passed through without materializing), ``base [nd, nd]``
    the closed-form P1 mass matrix / volume, ``n`` the dof count (table
    row count).

    Returns ``(offs [K] int64 sorted, mst [n, K], kst [n, K])``; ``None``
    when the native kit is unavailable (caller uses the NumPy slot loop);
    ``"too_wide"`` when the offset set exceeds ``max_offsets`` (caller
    declines the stencil format entirely)."""
    lib = _get_lib()
    if lib is None:
        return None
    cd = np.ascontiguousarray(cd, dtype=np.int64)
    nc, nd = cd.shape
    g = grads.shape[2]
    if nd > 4 or g > 3:
        return None
    vol = np.ascontiguousarray(vol, dtype=np.float64)
    grads = np.ascontiguousarray(grads, dtype=np.float64)
    base = np.ascontiguousarray(base, dtype=np.float64)
    Mc = np.asarray(Mc, dtype=np.float64)
    if Mc.strides[0] == 0:  # broadcast tensor: one [g, g] block, stride 0
        mc = np.ascontiguousarray(Mc[0])
        mc_stride = 0
    else:
        mc = np.ascontiguousarray(Mc)
        mc_stride = g * g
    offs = np.empty(max_offsets, dtype=np.int64)
    K = lib.p1_stencil_offsets(
        _as_ptr(cd, ctypes.c_int64), nc, nd, max_offsets,
        _as_ptr(offs, ctypes.c_int64),
    )
    if K < 0:
        return "too_wide"
    offs = offs[:K].copy()
    mst = np.zeros(n * K, dtype=np.float64)
    kst = np.zeros(n * K, dtype=np.float64)
    rc = lib.p1_stencil_assemble(
        _as_ptr(cd, ctypes.c_int64), nc, nd,
        _as_ptr(vol, ctypes.c_double), _as_ptr(grads, ctypes.c_double), g,
        _as_ptr(mc, ctypes.c_double), mc_stride,
        _as_ptr(base, ctypes.c_double), _as_ptr(offs, ctypes.c_int64), K,
        _as_ptr(mst, ctypes.c_double), _as_ptr(kst, ctypes.c_double),
    )
    if rc != 0:  # defensive: offs always covers cd by construction
        return None
    return offs, mst.reshape(n, K), kst.reshape(n, K)


def p1_stencil_tables_direct(
    coords: np.ndarray,
    cells: np.ndarray,
    Mc: np.ndarray,
    max_offsets: int,
    n: int,
    want_volumes: bool = False,
):
    """Fused geometry + direct stencil assembly: mass/stiffness tables
    straight from ``coords [n, d]`` / ``cells [nc, d+1]`` (P1, tdim ==
    gdim in {2, 3}; cell dofs are the cells themselves), never
    materializing the per-cell geometry arrays (~3.4 GB at dx=0.05).

    Returns ``(offs [K], mst [n, K], kst [n, K], vol [nc] | None)``;
    ``None`` when the native kit is unavailable or shapes unsupported;
    ``"too_wide"`` when the offset set exceeds ``max_offsets``.  Raises
    ``numpy.linalg.LinAlgError`` on degenerate (zero-volume) cells like
    the NumPy geometry pipeline."""
    lib = _get_lib()
    if lib is None:
        return None
    coords = np.ascontiguousarray(coords, dtype=np.float64)
    cells = np.ascontiguousarray(cells, dtype=np.int32)
    nc, nd = cells.shape
    d = nd - 1
    if d not in (2, 3) or coords.shape[1] != d:
        return None
    Mc = np.asarray(Mc, dtype=np.float64)
    if Mc.strides[0] == 0:  # broadcast tensor: one [g, g] block, stride 0
        mc = np.ascontiguousarray(Mc[0])
        mc_stride = 0
    else:
        mc = np.ascontiguousarray(Mc)
        mc_stride = d * d
    offs = np.empty(max_offsets, dtype=np.int64)
    K = lib.p1_stencil_offsets_i32(
        _as_ptr(cells, ctypes.c_int32), nc, nd, max_offsets,
        _as_ptr(offs, ctypes.c_int64),
    )
    if K < 0:
        return "too_wide"
    offs = offs[:K].copy()
    mst = np.zeros(n * K, dtype=np.float64)
    kst = np.zeros(n * K, dtype=np.float64)
    vol = np.empty(nc, dtype=np.float64) if want_volumes else None
    null = ctypes.POINTER(ctypes.c_double)()
    rc = lib.p1_stencil_assemble_direct(
        _as_ptr(coords, ctypes.c_double), _as_ptr(cells, ctypes.c_int32), nc, d,
        _as_ptr(mc, ctypes.c_double), mc_stride,
        _as_ptr(offs, ctypes.c_int64), K,
        _as_ptr(mst, ctypes.c_double), _as_ptr(kst, ctypes.c_double),
        _as_ptr(vol, ctypes.c_double) if want_volumes else null,
    )
    if rc == -1:
        raise np.linalg.LinAlgError(
            "singular cell Jacobian: mesh contains degenerate "
            "(zero-volume) cells"
        )
    if rc != 0:
        return None
    return offs, mst.reshape(n, K), kst.reshape(n, K), vol


def p1_ell_tables_direct(
    coords: np.ndarray,
    cells: np.ndarray,
    Mc: np.ndarray,
    n: int,
    width: int | None = None,
):
    """Fused geometry + padded-ELL mass/stiffness assembly for P1
    unstructured meshes (tdim == gdim in {2, 3}), one pass over the cells:
    no COO triplets (16*nc*32 B), no radix sort, no padding every row to
    the global max degree.  Rows beyond ``width`` spill into a COO tail
    (dedup-summed here) — the LV apex pattern.

    Returns ``(ell_cols [n, w], mvals [n, w], kvals [n, w], counts [n],
    tail)`` where ``tail`` is ``None`` or ``(rows, cols, mvals, kvals)``
    int32/f64 dedup-summed, and padding columns point at the row itself
    with 0 values.  ``None`` when the native kit is unavailable or shapes
    unsupported.  Raises ``numpy.linalg.LinAlgError`` on degenerate
    cells."""
    lib = _get_lib()
    if lib is None:
        return None
    coords = np.ascontiguousarray(coords, dtype=np.float64)
    cells = np.ascontiguousarray(cells, dtype=np.int32)
    nc, nd = cells.shape
    d = nd - 1
    if d not in (2, 3) or coords.shape[1] != d:
        return None
    Mc = np.asarray(Mc, dtype=np.float64)
    if Mc.strides[0] == 0:
        mc = np.ascontiguousarray(Mc[0])
        mc_stride = 0
    else:
        mc = np.ascontiguousarray(Mc)
        mc_stride = d * d
    if width is None:
        width = 32 if d == 3 else 12
    tail_cap = max(4096, nc // 16)
    while True:
        counts = np.zeros(n, dtype=np.int32)
        cols = np.zeros(n * width, dtype=np.int32)
        mvals = np.zeros(n * width, dtype=np.float64)
        kvals = np.zeros(n * width, dtype=np.float64)
        tr = np.empty(tail_cap, dtype=np.int32)
        tc = np.empty(tail_cap, dtype=np.int32)
        tm = np.empty(tail_cap, dtype=np.float64)
        tk = np.empty(tail_cap, dtype=np.float64)
        tail_n = np.zeros(1, dtype=np.int64)
        rc = lib.p1_ell_assemble_direct(
            _as_ptr(coords, ctypes.c_double), _as_ptr(cells, ctypes.c_int32), nc, d,
            _as_ptr(mc, ctypes.c_double), mc_stride,
            n, width,
            _as_ptr(counts, ctypes.c_int32), _as_ptr(cols, ctypes.c_int32),
            _as_ptr(mvals, ctypes.c_double), _as_ptr(kvals, ctypes.c_double),
            tail_cap, _as_ptr(tail_n, ctypes.c_int64),
            _as_ptr(tr, ctypes.c_int32), _as_ptr(tc, ctypes.c_int32),
            _as_ptr(tm, ctypes.c_double), _as_ptr(tk, ctypes.c_double),
        )
        if rc == -4:
            tail_cap *= 4
            continue
        break
    if rc == -1:
        raise np.linalg.LinAlgError(
            "singular cell Jacobian: mesh contains degenerate "
            "(zero-volume) cells"
        )
    if rc < 0:
        return None
    w = max(int(rc), 1)
    cols = cols.reshape(n, width)[:, :w]
    mvals = mvals.reshape(n, width)[:, :w]
    kvals = kvals.reshape(n, width)[:, :w]
    # padding columns point at the row itself (value already 0)
    pad = np.arange(w, dtype=np.int32)[None, :] >= counts[:, None]
    rows_idx = np.broadcast_to(np.arange(n, dtype=np.int32)[:, None], (n, w))
    cols = np.where(pad, rows_idx, cols)
    tail = None
    nt = int(tail_n[0])
    if nt:
        # dedup-sum spilled (row, col) pairs across cells
        key = tr[:nt].astype(np.int64) * n + tc[:nt]
        uniq, inv = np.unique(key, return_inverse=True)
        tm_s = np.zeros(uniq.size)
        tk_s = np.zeros(uniq.size)
        np.add.at(tm_s, inv, tm[:nt])
        np.add.at(tk_s, inv, tk[:nt])
        tail = (
            (uniq // n).astype(np.int32),
            (uniq % n).astype(np.int32),
            tm_s,
            tk_s,
        )
    return cols, mvals, kvals, counts.astype(np.int64), tail


def locate_points(
    coords: np.ndarray, cells: np.ndarray, points: np.ndarray, tol: float = 1e-10
):
    """Containing cell per point (lowest cell index wins, matching the
    NumPy barycentric sweep), with a bbox prefilter and no precomputed
    geometry — the NumPy path reads the full inverse-Jacobian array per
    point.  Returns ``[n_points] int64`` (-1 = outside), or ``None`` when
    the native kit is unavailable or the mesh is not a tdim == gdim
    simplex mesh in {2, 3}."""
    lib = _get_lib()
    if lib is None:
        return None
    coords = np.ascontiguousarray(coords, dtype=np.float64)
    cells = np.ascontiguousarray(cells, dtype=np.int32)
    nc, nd = cells.shape
    g = coords.shape[1]
    if nd != g + 1 or g not in (2, 3):
        return None
    pts = np.ascontiguousarray(points, dtype=np.float64)
    if pts.ndim == 1:
        pts = pts[None, :]
    if pts.shape[1] != g:
        return None
    out = np.empty(pts.shape[0], dtype=np.int64)
    lib.locate_points(
        _as_ptr(coords, ctypes.c_double), _as_ptr(cells, ctypes.c_int32), nc, g,
        _as_ptr(pts, ctypes.c_double), pts.shape[0], float(tol),
        _as_ptr(out, ctypes.c_int64),
    )
    return out


def rcm_ordering(indptr: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """Reverse Cuthill-McKee permutation (perm[new] = old) over a CSR
    adjacency graph; reduces matrix bandwidth for ELL gather locality."""
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    n = indptr.size - 1
    lib = _get_lib()
    if lib is None:
        return _rcm_numpy(indptr, indices, n)
    out = np.empty(n, dtype=np.int32)
    lib.rcm_ordering(
        _as_ptr(indptr, ctypes.c_int64), _as_ptr(indices, ctypes.c_int32), n,
        _as_ptr(out, ctypes.c_int32),
    )
    return out


def _rcm_numpy(indptr, indices, n):
    from collections import deque

    degree = np.diff(indptr)
    visited = np.zeros(n, dtype=bool)
    order = []
    remaining = np.argsort(degree, kind="stable")
    ptr = 0
    while len(order) < n:
        while ptr < n and visited[remaining[ptr]]:
            ptr += 1
        seed = remaining[ptr]
        visited[seed] = True
        q = deque([seed])
        while q:
            u = q.popleft()
            order.append(u)
            nbrs = indices[indptr[u] : indptr[u + 1]]
            nbrs = [v for v in nbrs if not visited[v]]
            for v in sorted(nbrs, key=lambda x: degree[x]):
                visited[v] = True
                q.append(v)
    return np.asarray(order[::-1], dtype=np.int32)
