"""Pseudo-ECG recovery, 12-lead algebra, QT-interval analysis.

TPU-native counterpart of reference ``src/beat/ecg.py``:

* :class:`ECGRecovery` recovers the transmembrane current Im by solving
  ``-C_m * Mass @ Im = K(M) @ v`` (reference forms at ``ecg.py:257-258``)
  with the in-repo jitted Jacobi-CG instead of PETSc CG/SOR, then evaluates
  the infinite-homogeneous-conductor integral
  ``phi_e(p) = 1/(4 pi sigma_b) ∫ Im / |r - p| dx`` (``ecg.py:295-298``).
* :class:`Leads12` implements the Einthoven / Wilson / Goldberger lead
  algebra (``ecg.py:307-396``; definitions per the standard 12-lead ECG).
* ``detect_r_peaks`` / ``detect_t_end`` / ``qt_interval`` implement
  derivative-based QT detection (``ecg.py:20-226``).
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
    "ECGRecovery",
    "Leads12",
    "example",
]


def detect_r_peaks(ecg_signal: np.ndarray, min_distance: float = 20) -> np.ndarray:
    """R-peak indices (height-thresholded), reference ``ecg.py:20-42``."""
    height_threshold = 0.5 * np.max(ecg_signal) if np.max(ecg_signal) > 0 else None
    peaks, _ = find_peaks(ecg_signal, distance=min_distance, height=height_threshold)
    return peaks


def detect_t_end(
    averaged_rr: np.ndarray,
    r_peak_index: int,
    window_start_offset: int = 50,
    window_end_offset: int = 400,
) -> int:
    """T-wave end via the minimum-derivative-after-T-peak method
    (reference ``ecg.py:45-130``)."""
    if averaged_rr is None or len(averaged_rr) == 0:
        raise RuntimeError("Cannot detect T-end on empty or None averaged RR interval.")

    search_start = max(0, r_peak_index + window_start_offset)
    search_end = min(len(averaged_rr), r_peak_index + window_end_offset)
    if search_start >= search_end or search_end - search_start < 2:
        logger.warning("Invalid or too short search window for T-end detection.")

    signal_segment = averaged_rr[search_start:search_end]
    derivative = np.diff(signal_segment)
    if len(derivative) == 0:
        logger.warning("Could not compute derivative for T-end detection.")

    t_peak_rel = int(np.argmax(np.abs(signal_segment)))
    start_tend = max(0, t_peak_rel)
    if start_tend >= len(derivative):
        logger.warning("T-peak is too close to the end of the search window.")

    min_deriv_after = int(np.argmin(derivative[start_tend:]))
    t_end_abs = search_start + start_tend + min_deriv_after
    if t_end_abs <= r_peak_index:
        logger.warning("Detected T-end is before or at the R-peak index.")
    return int(t_end_abs)


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
    """QT interval from first R-peak to T-end (reference ``ecg.py:180-226``)."""
    r_peaks = detect_r_peaks(ecg_signal=ecg_signal, min_distance=min_distance)
    assert len(r_peaks) > 0, "No R-peaks detected. Check signal quality and detection parameters."
    r_peak_index = int(r_peaks[0])
    t_end_index = detect_t_end(
        ecg_signal,
        r_peak_index,
        window_start_offset=window_start_offset,
        window_end_offset=window_end_offset,
    )
    return QTIntervalResult(
        start_index=r_peak_index,
        end_index=t_end_index,
        qt_interval=t[t_end_index] - t[r_peak_index],
    )


@dataclass
class ECGRecovery:
    """Recover Im = -(1/C_m) Mass^{-1} K v and expose electrode-potential
    forms (reference ``ecg.py:229-298``)."""

    v: fem.Function
    sigma_b: float = 1.0
    C_m: float = 1.0
    dx: Any = None
    M: Any = 1.0
    petsc_options: dict[str, Any] = field(
        default_factory=lambda: {"ksp_type": "cg", "ksp_rtol": 1.0e-8, "ksp_atol": 1.0e-8}
    )

    def __post_init__(self):
        self.sol = fem.Function(self.V, name="Im")
        M_cells = as_cell_tensors(self.M, self.mesh)
        # numpy-backed; the jitted kernel embeds them as module constants
        self._mass, self._stiff = fem.assemble_mass_stiffness(self.V, M_cells)
        self._diag = self._mass.diagonal()
        self._rtol = float(self.petsc_options.get("ksp_rtol", 1e-8))
        self._atol = float(self.petsc_options.get("ksp_atol", 1e-8))

        import jax
        import numpy as _np

        C_m = float(self.C_m)
        rtol, atol = self._rtol, self._atol
        # device-resident operands as jit arguments (large closure
        # constants are re-shipped per execution on remote-TPU backends)
        self._operands = {
            "mass": self._mass.to_device(),
            "stiff": self._stiff.to_device(),
            "diag": jax.device_put(jnp.asarray(_np.asarray(self._diag))),
        }

        @jax.jit
        def solve_kernel(op, v_arr):
            # -C_m Mass Im = K v  =>  (C_m Mass) Im = -(K v)
            b = -(op["stiff"] @ v_arr)
            x, info = cg(
                lambda u: C_m * (op["mass"] @ u),
                b,
                precond_diag=C_m * op["diag"].astype(b.dtype),
                rtol=rtol,
                atol=atol,
            )
            return x, info

        self._solve_kernel = lambda v_arr: solve_kernel(self._operands, v_arr)

    @property
    def V(self) -> fem.FunctionSpace:
        return self.v.function_space

    @property
    def mesh(self):
        return self.v.function_space.mesh

    def solve(self) -> None:
        logger.debug("Solving ECG recovery")
        x, info = self._solve_kernel(jnp.asarray(self.v.x.array))
        self.sol.x.array[:] = np.asarray(x)

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
    """Synthetic Gaussian-wave ECG generator (reference ``ecg.py:399-499``).

    Returns (t_ms, signal): each beat is a sum of Gaussian Q/R/S/T bumps
    at offsets from the R peak, plus optional noise and baseline wander.
    """
    duration_ms = duration_s * 1000
    rr_interval_s = 60.0 / heart_rate_bpm
    rr_interval_ms = rr_interval_s * 1000
    num_beats = int(duration_s / rr_interval_s)

    num_samples = int(duration_s * sampling_rate_hz)
    t_ms = np.linspace(0, duration_ms, num_samples, endpoint=False)
    ecg_signal = np.zeros_like(t_ms)

    for i in range(num_beats):
        r_peak_time_ms = (i + qrs_peak_time / 1000) * rr_interval_ms
        q_time_ms = r_peak_time_ms - q_offset_ms
        s_time_ms = r_peak_time_ms + s_offset_ms
        t_peak_time_ms = r_peak_time_ms + t_peak_offset_ms

        ecg_signal += 1.0 * np.exp(-(((t_ms - r_peak_time_ms) / r_width_ms) ** 2))
        ecg_signal -= 0.2 * np.exp(-(((t_ms - q_time_ms) / q_width_ms) ** 2))
        ecg_signal -= 0.3 * np.exp(-(((t_ms - s_time_ms) / s_width_ms) ** 2))
        ecg_signal += 0.4 * np.exp(-(((t_ms - t_peak_time_ms) / t_width_ms) ** 2))

    if noise_amplitude > 0:
        ecg_signal += noise_amplitude * np.random.randn(len(t_ms))

    wander_freq_per_ms = wander_freq_hz / 1000.0
    ecg_signal += wander_amplitude * np.sin(2 * np.pi * wander_freq_per_ms * t_ms)
    return t_ms, ecg_signal
