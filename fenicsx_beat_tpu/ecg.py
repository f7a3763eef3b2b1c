"""Pseudo-ECG recovery, 12-lead algebra, QT-interval analysis.

TPU-native counterpart of reference ``src/beat/ecg.py``:

* :class:`ECGRecovery` recovers the transmembrane current Im by solving
  ``-C_m * Mass @ Im = K(M) @ v`` (reference forms at ``ecg.py:257-258``)
  with the in-repo jitted Jacobi-CG instead of PETSc CG/SOR, then evaluates
  the infinite-homogeneous-conductor integral
  ``phi_e(p) = 1/(4 pi sigma_b) ∫ Im / |r - p| dx`` (``ecg.py:295-298``).
  Production meshes ride the same operator machinery as the solvers:
  stencil assembly + opt-in disk cache, pallas stencil SpMV (HBM-streamed
  beyond the VMEM budget), CG warm-started from the previous frame's Im,
  and device-resident electrode weight vectors so a frame's 12-lead ECG is
  one small matvec with no host transfer of Im.
* :class:`Leads12` implements the Einthoven / Wilson / Goldberger lead
  algebra (``ecg.py:307-396``; definitions per the standard 12-lead ECG).
* ``detect_r_peaks`` / ``detect_t_end`` / ``qt_interval`` implement
  derivative-based QT detection (behavioral match of reference
  ``ecg.py:20-226``).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Any, NamedTuple

import jax.numpy as jnp
import numpy as np
from scipy.signal import find_peaks

from . import fem
from .conductivities import as_cell_tensors
from .ops.cg import cg

logger = logging.getLogger(__name__)

__all__ = [
    "detect_r_peaks",
    "detect_t_end",
    "QTIntervalResult",
    "qt_interval",
    "apd",
    "electrode_weight_matrix",
    "restitution_curve",
    "ECGRecovery",
    "Leads12",
    "example",
]


def detect_r_peaks(ecg_signal: np.ndarray, min_distance: float = 20) -> np.ndarray:
    """R-peak indices (height-thresholded), behavioral match of reference
    ``ecg.py:20-42``: peaks at least ``min_distance`` samples apart and, when
    the signal goes positive, at least half the global maximum tall."""
    top = np.max(ecg_signal)
    peaks, _ = find_peaks(
        ecg_signal, distance=min_distance, height=0.5 * top if top > 0 else None
    )
    return peaks


def detect_t_end(
    averaged_rr: np.ndarray,
    r_peak_index: int,
    window_start_offset: int = 50,
    window_end_offset: int = 400,
) -> int:
    """T-wave end by the steepest-descent criterion.

    Within the search window ``[r_peak + start_offset, r_peak +
    end_offset)`` the T peak is the sample of largest magnitude; T-end is
    where the first derivative is most negative after that peak
    (behavioral match of reference ``ecg.py:45-130``).  Degenerate
    geometry (window off the end of the signal, T peak on the window
    edge, T-end not after the R peak) is warned about, not fatal.
    """
    if averaged_rr is None or len(averaged_rr) == 0:
        raise RuntimeError("detect_t_end needs a non-empty signal")

    lo = max(0, r_peak_index + window_start_offset)
    hi = min(len(averaged_rr), r_peak_index + window_end_offset)
    window = np.asarray(averaged_rr[lo:hi])
    if window.size == 0:
        logger.warning("T-end search window [%d, %d) is empty", lo, hi)
        return int(min(len(averaged_rr) - 1, max(0, r_peak_index)))
    if window.size < 2:
        logger.warning("T-end search window [%d, %d) holds fewer than 2 samples", lo, hi)

    t_peak = int(np.argmax(np.abs(window)))
    tail = np.diff(window)[t_peak:]
    if tail.size == 0:
        logger.warning("T peak sits on the edge of the search window")
        t_end = lo + t_peak
    else:
        t_end = lo + t_peak + int(np.argmin(tail))
    if t_end <= r_peak_index:
        logger.warning("detected T-end (index %d) does not follow the R peak", t_end)
    return int(t_end)


class QTIntervalResult(NamedTuple):
    qt_interval: float
    start_index: int
    end_index: int


def qt_interval(
    t: np.ndarray,
    ecg_signal: np.ndarray,
    min_distance: float = 20.0,
    window_start_offset: int = 50,
    window_end_offset: int = 400,
) -> QTIntervalResult:
    """QT interval: first R peak to the T-end that follows it (behavioral
    match of reference ``ecg.py:180-226``)."""
    r_peaks = detect_r_peaks(ecg_signal=ecg_signal, min_distance=min_distance)
    if len(r_peaks) == 0:
        raise RuntimeError("no R peaks found; cannot measure a QT interval")
    r0 = int(r_peaks[0])
    t_end = detect_t_end(
        ecg_signal,
        r0,
        window_start_offset=window_start_offset,
        window_end_offset=window_end_offset,
    )
    return QTIntervalResult(qt_interval=t[t_end] - t[r0], start_index=r0, end_index=t_end)


def _beat_intervals(t, v, repolarization, threshold):
    """Per-beat (beat_index, t_activation, t_repolarization) from a trace.

    Beats are upward ``threshold`` crossings; activation is the linearly
    interpolated crossing, repolarization the first interpolated drop
    below ``v_peak - p/100 * (v_peak - v_rest)`` after the beat's peak
    (v_rest = pre-upstroke voltage).  Beats that do not repolarize before
    the next beat (or the trace end) are omitted — note the beat INDEX is
    kept so callers can detect the gap."""
    t = np.asarray(t, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    up = np.nonzero((v[:-1] < threshold) & (v[1:] >= threshold))[0]
    out = []
    for k, u in enumerate(up):
        end = up[k + 1] if k + 1 < len(up) else v.size - 1
        f = (threshold - v[u]) / (v[u + 1] - v[u])
        t_act = t[u] + f * (t[u + 1] - t[u])
        v_rest = v[max(u - 1, 0)]
        pk = u + int(np.argmax(v[u : end + 1]))
        v_peak = v[pk]
        level = v_peak - (repolarization / 100.0) * (v_peak - v_rest)
        below = np.nonzero(v[pk : end + 1] <= level)[0]
        if below.size == 0 or below[0] == 0:
            continue  # beat does not repolarize inside this window
        j = pk + below[0]
        f = (level - v[j - 1]) / (v[j] - v[j - 1])
        t_rep = t[j - 1] + f * (t[j] - t[j - 1])
        out.append((k, t_act, t_rep))
    return out


def apd(
    t: np.ndarray,
    v: np.ndarray,
    repolarization: float = 90.0,
    threshold: float = 0.0,
) -> np.ndarray:
    """Per-beat action-potential durations APD_p from a voltage trace.

    See :func:`_beat_intervals` for the beat model.  Goes beyond the
    reference's analysis set (its ``ecg.py`` stops at R-peak/T-end/QT);
    APD/DI are the standard tissue-level restitution measures
    (pace_train/pvc protocols)."""
    beats = _beat_intervals(t, v, repolarization, threshold)
    return np.asarray([t_rep - t_act for _, t_act, t_rep in beats])


def restitution_curve(
    t: np.ndarray,
    v: np.ndarray,
    repolarization: float = 90.0,
    threshold: float = 0.0,
) -> tuple[np.ndarray, np.ndarray]:
    """(diastolic intervals, following APDs) from a paced voltage trace.

    ``DI_k`` is the gap between beat k's APD_p repolarization and beat
    k+1's activation; the returned pairs ``(DI_k, APD_{k+1})`` are the
    standard S1-S2 / dynamic restitution relation (consumer of the
    ``pace_train`` protocol).  Pairs are formed only between
    CONSECUTIVE detected beats: if a beat fails to repolarize (short-DI
    / alternans regimes), the pairs on both sides of the gap are
    dropped rather than fabricating a DI that spans two beats."""
    beats = _beat_intervals(t, v, repolarization, threshold)
    di, apds = [], []
    for (k0, _, rep0), (k1, act1, rep1) in zip(beats, beats[1:]):
        if k1 != k0 + 1:
            continue  # a non-repolarizing beat sits between: no valid pair
        di.append(act1 - rep0)
        apds.append(rep1 - act1)
    return np.asarray(di), np.asarray(apds)


@dataclass
class ECGRecovery:
    """Recover Im = -(1/C_m) Mass^{-1} K v and expose electrode-potential
    evaluation (reference ``ecg.py:229-298``).

    Two electrode paths:

    * :meth:`eval` returns a lazy :class:`~fenicsx_beat_tpu.fem.ScalarForm`
      (the reference's dolfinx-form API; host quadrature assembly) — right
      for small meshes and API parity.
    * :meth:`register_electrodes` + :meth:`electrode_potentials` precompute
      a device-resident ``[n_electrodes, n]`` weight matrix with the SAME
      quadrature rule, chunk-wise on device — per frame the ECG is one
      small matvec and only ``n_electrodes`` scalars cross the host link.
      This is the production path: at dx=0.05 (3.45M nodes) pulling Im to
      host per frame would cost minutes over a remote-TPU tunnel.
    """

    v: fem.Function
    sigma_b: float = 1.0
    C_m: float = 1.0
    dx: Any = None
    M: Any = 1.0
    petsc_options: dict[str, Any] = field(
        default_factory=lambda: {"ksp_type": "cg", "ksp_rtol": 1.0e-8, "ksp_atol": 1.0e-8}
    )
    operator_cache_key: str | None = None  # opt-in disk cache of assembly
    use_pallas: bool | None = None  # None = auto (TPU backend + stencil operator)

    def __post_init__(self):
        import jax

        from .ops.sparse import StencilMatrix

        from .config import default_dtype

        self.sol = fem.Function(self.V, name="Im")
        n = self._n = self.V.ndofs
        M_cells = as_cell_tensors(self.M, self.mesh)
        self.dtype = default_dtype()

        # Same operator path as the PDE solvers: shared stencil-first
        # assembly (fem.assemble_mass_stiffness_auto) with the opt-in
        # operator disk cache in both branches.
        mass, stiff = fem.assemble_mass_stiffness_auto(
            self.V, M_cells, dtype=self.dtype, cache_key=self.operator_cache_key
        )

        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = (
                jax.default_backend() == "tpu"
                and isinstance(mass, StencilMatrix)
                and n >= 4096
            )
        self._use_pallas = use_pallas = use_pallas and isinstance(mass, StencilMatrix)

        # Kernel-aligned padding (shared pad_stencil_pair rule): inert zero
        # rows with a unit mass diagonal so no per-solve wrappers are traced
        if use_pallas:
            from .ops.sparse import pad_stencil_pair

            mass, stiff, n_pad = pad_stencil_pair(mass, stiff, n)
        else:
            n_pad = n
        self._n_pad = n_pad
        pad = n_pad - n
        self._mass, self._stiff = mass, stiff

        self._rtol = float(self.petsc_options.get("ksp_rtol", 1e-8))
        self._atol = float(self.petsc_options.get("ksp_atol", 1e-8))
        rtol, atol = self._rtol, self._atol
        C_m = float(self.C_m)

        # Device-resident operands threaded as jit ARGUMENTS (closure
        # constants are pulled back to host at lowering on remote-TPU
        # backends; see docs/DESIGN.md §9)
        operands = {}
        if use_pallas:
            from .ops.pallas_spmv import (
                LANE,
                build_pallas_stencil_spmv,
                build_pallas_stencil_spmv_streamed,
            )

            operand_bytes = (
                (-(-n_pad // LANE)) * LANE * jnp.dtype(np.asarray(mass.vals).dtype).itemsize
            )
            builder = (
                build_pallas_stencil_spmv_streamed
                if operand_bytes > 8 * 1024 * 1024
                else build_pallas_stencil_spmv
            )
            npdt = np.asarray(mass.vals).dtype
            spmv = builder(mass.offsets, n_pad, npdt)
            k0 = mass.offsets.index(0)
            operands["mT"] = jax.device_put(jnp.asarray(spmv.pack_values(np.asarray(mass.vals))))
            operands["kT"] = jax.device_put(jnp.asarray(spmv.pack_values(np.asarray(stiff.vals))))

            def apply_mass(op, u):
                return spmv(op["mT"], u)

            def apply_stiff(op, u):
                return spmv(op["kT"], u)

            def mass_diag(op):
                return op["mT"][k0].reshape(-1)[:n_pad]

        else:
            if jax.default_backend() == "tpu" and n >= 4096:
                # unstructured TPU path: paged lane-gather SpMV — the XLA
                # ELL gather measures ~1 GB/s effective on the chip
                # (docs/DESIGN.md §3.1b); Im recovery is one CG per frame
                from .ops.pallas_ell import LaneGatherMatrix

                try:
                    mass, stiff = LaneGatherMatrix.from_operator_pair(
                        mass, stiff, dtype=self.dtype
                    )
                except Exception as exc:
                    logger.warning(
                        "lane-gather SpMV unavailable (%s); using the XLA "
                        "ELL matvec", exc,
                    )
            operands["mass"] = mass.to_device()
            operands["stiff"] = stiff.to_device()

            def apply_mass(op, u):
                return op["mass"] @ u

            def apply_stiff(op, u):
                return op["stiff"] @ u

            def mass_diag(op):
                return op["mass"].diagonal()

        if pad:
            # padding rows must not inflate norms and loosen the tolerance
            def cg_dot(a, b):
                live = (jnp.arange(a.shape[0]) < n).astype(a.dtype)
                return jnp.vdot(a * live, b)

        else:
            cg_dot = None

        @jax.jit
        def recover(op, v_arr, x0):
            # -C_m Mass Im = K v  =>  (C_m Mass) Im = -(K v)
            b = -apply_stiff(op, v_arr)
            return cg(
                lambda u: C_m * apply_mass(op, u),
                b,
                x0=x0,
                precond_diag=C_m * mass_diag(op).astype(b.dtype),
                rtol=rtol,
                atol=atol,
                dot=cg_dot,
            )

        self._operands = operands
        self._recover = recover
        self._npdt = np.asarray(mass.vals).dtype
        # warm start: consecutive frames of a propagating wave are close,
        # so the previous Im is an excellent initial iterate
        self._x0 = jnp.zeros(n_pad, dtype=self._npdt)
        self._im_device = None
        self.last_info = None
        self._electrode_W = None
        self._phi = jax.jit(lambda W, im: W @ im)

    @property
    def V(self) -> fem.FunctionSpace:
        return self.v.function_space

    @property
    def mesh(self):
        return self.v.function_space.mesh

    def solve_device(self):
        """Recover Im on device; returns ``(im, CGInfo)`` without pulling
        the solution to host.  Production loops pair this with
        :meth:`electrode_potentials`."""
        vfull = np.zeros(self._n_pad, dtype=self._npdt)
        vfull[: self._n] = self.v.x.array
        x, info = self._recover(self._operands, jnp.asarray(vfull), self._x0)
        self._x0 = x
        self._im_device = x
        self.last_info = info
        return x, info

    def solve(self) -> None:
        """Recover Im and sync it into ``self.sol`` (host) for the lazy
        :meth:`eval` forms.  Pulls n floats device->host — fine at demo
        scale; use :meth:`solve_device` in production loops."""
        logger.debug("Solving ECG recovery")
        im, _ = self.solve_device()
        self.sol.x.array[:] = np.asarray(im)[: self._n]

    def eval(self, point) -> fem.ScalarForm:
        """Electrode potential form: assembles to
        ``1/(4 pi sigma_b) ∫ Im / |x - p| dx`` using the *current* ``sol``
        (lazy, like the reference's returned dolfinx form)."""
        p = np.zeros(self.mesh.gdim)
        p[: len(point)] = np.asarray(point, dtype=np.float64)[: self.mesh.gdim]
        pj = jnp.asarray(p)
        sigma_b = float(self.sigma_b)

        def integrand(x, u):
            # x: [gdim, ne, nq]; u: [ne, nq]
            diff = jnp.stack([x[i] - pj[i] for i in range(len(p))])
            dist = jnp.sqrt(jnp.sum(diff**2, axis=0))
            return (1.0 / (4 * jnp.pi * sigma_b)) * u / dist

        return fem.function_integral(self.sol, integrand, degree=4)

    # -- production electrode path --------------------------------------
    def electrode_weights(
        self, points, degree: int = 4, cells_per_chunk: int = 1 << 20
    ) -> jnp.ndarray:
        """Device-resident ``[n_electrodes, n_pad]`` weight matrix W with
        ``phi_e = W @ Im``.

        Delegates to :func:`electrode_weight_matrix` with this recovery's
        padded layout."""
        return electrode_weight_matrix(
            self.V,
            points,
            sigma_b=self.sigma_b,
            degree=degree,
            n_pad=self._n_pad,
            dtype=self._npdt,
            cells_per_chunk=cells_per_chunk,
        )


    def register_electrodes(self, points, degree: int = 4) -> None:
        """Precompute and hold device electrode weights for
        :meth:`electrode_potentials`."""
        self._electrode_W = self.electrode_weights(points, degree=degree)

    def electrode_potentials(self, im: jnp.ndarray | None = None) -> np.ndarray:
        """``[n_electrodes]`` potentials from the device-resident Im of the
        last :meth:`solve_device`/:meth:`solve` (or an explicit ``im``).
        Only these scalars cross the host link."""
        if self._electrode_W is None:
            raise RuntimeError("call register_electrodes(points) first")
        if im is None:
            if self._im_device is None:
                raise RuntimeError("no recovered Im yet; call solve_device() first")
            im = self._im_device
        return np.asarray(self._phi(self._electrode_W, im))


def electrode_weight_matrix(
    V,
    points,
    sigma_b: float = 1.0,
    degree: int = 4,
    n_pad: int | None = None,
    dtype=None,
    cells_per_chunk: int = 1 << 20,
) -> jnp.ndarray:
    """Device-resident ``[n_electrodes, n_pad]`` weight matrix W with
    ``phi_e = W @ Im``.

    The electrode integral is linear in Im, so its quadrature collapses
    into per-dof weights ``W[e, j] = Σ_cells Σ_q w_q N_j(q) / (4 pi
    sigma_b |x_q - p_e|)``.  Computed chunk-wise ON DEVICE from the mesh
    arrays — no [nc, nq, gdim] host tables, no per-cell host loop — which
    is what makes dx=0.05 (20.6M cells) ECG recovery minutes-scale
    instead of hours (reference ``ecg.py:295-298`` re-assembles the form
    per frame under MPI).  Standalone so consumers that do NOT need the
    recovery operators (``adjoint.build_diff_simulator``) avoid
    :class:`ECGRecovery`'s assembly."""
    import jax

    from .ops.quadrature import simplex_rule

    mesh = V.mesh
    if n_pad is None:
        n_pad = V.ndofs
    tdim, gdim = mesh.tdim, mesh.gdim
    pts, wts = simplex_rule(tdim, degree)  # [nq, tdim], [nq]
    N = V.element.tabulate(tdim, pts)  # [nq, nd]
    P = np.zeros((len(points), gdim))
    for e, p in enumerate(points):
        P[e, : min(len(p), gdim)] = np.asarray(p, dtype=np.float64)[:gdim]
    sigma_b = float(sigma_b)
    npdt = np.dtype(dtype) if dtype is not None else np.dtype(np.float64)

    # coords as an explicit jit ARGUMENT, device_put once — a device
    # closure constant would be pulled back to host at lowering
    coords_d = jax.device_put(jnp.asarray(mesh.coords.astype(npdt)))
    nq, nd = N.shape

    @jax.jit
    def chunk_weights(coords, cells_chunk, dofs_chunk, live, w_acc):
        verts = coords[cells_chunk]  # [B, tdim+1, gdim]
        edges = verts[:, 1:, :] - verts[:, :1, :]  # [B, tdim, gdim]
        # Gram-determinant volume: covers gdim == tdim and embedded cells
        G = jnp.einsum("cik,cjk->cij", edges, edges)
        if tdim == 1:
            detG = G[:, 0, 0]
        elif tdim == 2:
            detG = G[:, 0, 0] * G[:, 1, 1] - G[:, 0, 1] * G[:, 1, 0]
        else:
            detG = (
                G[:, 0, 0] * (G[:, 1, 1] * G[:, 2, 2] - G[:, 1, 2] * G[:, 2, 1])
                - G[:, 0, 1] * (G[:, 1, 0] * G[:, 2, 2] - G[:, 1, 2] * G[:, 2, 0])
                + G[:, 0, 2] * (G[:, 1, 0] * G[:, 2, 1] - G[:, 1, 1] * G[:, 2, 0])
            )
        # rule weights sum to the REFERENCE simplex volume 1/tdim!, so
        # the physical quadrature weight is sqrt(det G) * w_q (the
        # Jacobian norm), matching fem.cell_quadrature's volume*tdim!*w
        jac = jnp.sqrt(jnp.abs(detG)) * live  # [B]
        xq = verts[:, :1, :] + jnp.einsum("qd,cdg->cqg", jnp.asarray(pts, dtype=npdt), edges)
        # [n_e, B, nq] inverse distances
        diff = xq[None] - jnp.asarray(P, dtype=npdt)[:, None, None, :]
        inv_r = 1.0 / jnp.sqrt(jnp.sum(diff * diff, axis=-1))
        wq = jac[:, None] * jnp.asarray(wts, dtype=npdt)[None, :]  # [B, nq]
        scale = 1.0 / (4.0 * np.pi * sigma_b)
        # [n_e, B, nd] per-cell dof contributions
        contrib = scale * jnp.einsum("ebq,bq,qd->ebd", inv_r, wq, jnp.asarray(N, dtype=npdt))
        for e in range(P.shape[0]):
            w_acc = w_acc.at[e].set(
                w_acc[e].at[dofs_chunk.reshape(-1)].add(contrib[e].reshape(-1))
            )
        return w_acc

    W = jnp.zeros((P.shape[0], n_pad), dtype=npdt)
    nc = mesh.num_cells
    B = min(cells_per_chunk, nc)
    cell_dofs = V.cell_dofs
    for c0 in range(0, nc, B):
        c1 = min(c0 + B, nc)
        idx = np.zeros(B, dtype=np.int64)
        idx[: c1 - c0] = np.arange(c0, c1)
        dofs = np.zeros((B, nd), dtype=np.int32)
        dofs[: c1 - c0] = cell_dofs[c0:c1]
        live = np.zeros(B, dtype=npdt)
        live[: c1 - c0] = 1.0
        W = chunk_weights(
            coords_d, jnp.asarray(mesh.cells[idx]), jnp.asarray(dofs), jnp.asarray(live), W
        )
    return W


def _check_attr(attr) -> None:
    if attr is None:
        raise AttributeError(f"Missing attribute {attr}")


class Leads12(NamedTuple):
    """Standard 12-lead ECG algebra from electrode potentials
    (Einthoven I/II/III, Wilson central terminal, Goldberger augmented
    leads, precordial V1-V6); reference ``ecg.py:307-396``."""

    RA: np.ndarray
    LA: np.ndarray
    LL: np.ndarray
    RL: np.ndarray | None = None
    V1: np.ndarray | None = None
    V2: np.ndarray | None = None
    V3: np.ndarray | None = None
    V4: np.ndarray | None = None
    V5: np.ndarray | None = None
    V6: np.ndarray | None = None

    @property
    def I(self) -> np.ndarray:  # noqa: E743
        """LA - RA."""
        return self.LA - self.RA

    @property
    def II(self) -> np.ndarray:
        """LL - RA."""
        return self.LL - self.RA

    @property
    def III(self) -> np.ndarray:
        """LL - LA."""
        return self.LL - self.LA

    @property
    def Vw(self) -> np.ndarray:
        """Wilson's central terminal: mean of the limb electrodes."""
        return (1 / 3) * (self.RA + self.LA + self.LL)

    @property
    def aVR(self) -> np.ndarray:
        return (3 / 2) * (self.RA - self.Vw)

    @property
    def aVL(self) -> np.ndarray:
        return (3 / 2) * (self.LA - self.Vw)

    @property
    def aVF(self) -> np.ndarray:
        return (3 / 2) * (self.LL - self.Vw)

    @property
    def V1_(self) -> np.ndarray:
        _check_attr(self.V1)
        return self.V1 - self.Vw

    @property
    def V2_(self) -> np.ndarray:
        _check_attr(self.V2)
        return self.V2 - self.Vw

    @property
    def V3_(self) -> np.ndarray:
        _check_attr(self.V3)
        return self.V3 - self.Vw

    @property
    def V4_(self) -> np.ndarray:
        _check_attr(self.V4)
        return self.V4 - self.Vw

    @property
    def V5_(self) -> np.ndarray:
        _check_attr(self.V5)
        return self.V5 - self.Vw

    @property
    def V6_(self) -> np.ndarray:
        _check_attr(self.V6)
        return self.V6 - self.Vw


def example(
    sampling_rate_hz: int = 1000,
    duration_s: float = 10,
    heart_rate_bpm: float = 60,
    q_offset_ms: float = 40,
    s_offset_ms: float = 40,
    t_peak_offset_ms: float = 200,
    r_width_ms: float = 20,
    q_width_ms: float = 20,
    s_width_ms: float = 30,
    t_width_ms: float = 60,
    qrs_peak_time: float = 200,
    noise_amplitude: float = 0.0,
    wander_freq_hz: float = 0.2,
    wander_amplitude: float = 0.1,
):
    """Synthetic Gaussian-wave ECG (behavioral match of reference
    ``ecg.py:399-499``): each beat is four Gaussian deflections — Q, R, S,
    T — placed relative to its R peak, vectorized over a ``[beat, wave,
    time]`` broadcast instead of a per-beat accumulation loop.  Optional
    white noise and sinusoidal baseline wander on top.

    Returns ``(t_ms, signal)``.
    """
    rr_ms = 60_000.0 / heart_rate_bpm
    n_beats = int(duration_s * heart_rate_bpm / 60.0)
    t_ms = np.arange(int(duration_s * sampling_rate_hz)) * (1000.0 / sampling_rate_hz)

    # per-wave (amplitude, offset-from-R, width) rows: Q, R, S, T
    amp = np.array([-0.2, 1.0, -0.3, 0.4])
    off = np.array([-q_offset_ms, 0.0, s_offset_ms, t_peak_offset_ms])
    wid = np.array([q_width_ms, r_width_ms, s_width_ms, t_width_ms])

    r_times = (np.arange(n_beats) + qrs_peak_time / 1000.0) * rr_ms  # [beat]
    z = (t_ms[None, None, :] - (r_times[:, None] + off[None, :])[..., None]) / wid[
        None, :, None
    ]
    signal = np.einsum("w,bwt->t", amp, np.exp(-z * z))

    if noise_amplitude > 0:
        signal = signal + noise_amplitude * np.random.randn(t_ms.size)
    signal = signal + wander_amplitude * np.sin(2e-3 * np.pi * wander_freq_hz * t_ms)
    return t_ms, signal
