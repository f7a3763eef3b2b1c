"""Modified FitzHugh-Nagumo model (cardiac-scaled two-variable model).

Formulation follows the classic modified-FHN used by the reference's
getting-started example (reference README.md, "Getting started"):

    dv/dt = I + i_app,   I = -s*(c2/v_amp)*(v - v_rest)
                             + (c1/v_amp^2)*(v - v_rest)*(v - v_th)*(v_peak - v)
    ds/dt = b*(v - v_rest - c3*s),      v_th = v_amp*a + v_rest

State layout: (s, v) — voltage index 1 (matching the README's v_index=1).
Functions are jax-traceable and also work on plain numpy inputs.
"""

from __future__ import annotations

import numpy as np

try:
    import jax.numpy as jnp
except ImportError:  # pragma: no cover
    jnp = np

_STATE_NAMES = ["s", "v"]
_PARAM_NAMES = [
    "c_1",
    "c_2",
    "c_3",
    "a",
    "b",
    "v_amp",
    "v_rest",
    "v_peak",
    "stim_amplitude",
    "stim_duration",
    "stim_start",
]

_DEFAULT_PARAMS = {
    "c_1": 0.26,
    "c_2": 0.1,
    "c_3": 1.0,
    "a": 0.13,
    "b": 0.013,
    "v_amp": 125.0,
    "v_rest": -85.0,
    "v_peak": 40.0,
    "stim_amplitude": 100.0,
    "stim_duration": 1.0,
    "stim_start": 0.0,
}

_DEFAULT_STATES = {"s": 0.0, "v": -85.0}


def state_index(name: str) -> int:
    return _STATE_NAMES.index(name)


def parameter_index(name: str) -> int:
    return _PARAM_NAMES.index(name)


def init_state_values(**overrides) -> np.ndarray:
    unknown = set(overrides) - set(_STATE_NAMES)
    if unknown:
        raise KeyError(f"Unknown state name(s): {sorted(unknown)}")
    vals = dict(_DEFAULT_STATES)
    vals.update(overrides)
    return np.array([vals[n] for n in _STATE_NAMES], dtype=np.float64)


def init_parameter_values(**overrides) -> np.ndarray:
    vals = dict(_DEFAULT_PARAMS)
    vals.update(overrides)
    return np.array([vals[n] for n in _PARAM_NAMES], dtype=np.float64)


def rhs(states, t, parameters):
    """Right-hand side f(states, t) -> dstates/dt."""
    s, v = states[0], states[1]
    (c1, c2, c3, a, b, v_amp, v_rest, v_peak, stim_amplitude, stim_duration, stim_start) = (
        parameters[i] for i in range(11)
    )
    # np.where for host arrays keeps the OO path allocation-free;
    # traced jax values dispatch to jnp.where automatically.
    where = np.where if isinstance(s, np.ndarray) else jnp.where
    i_app = where(
        (t > stim_start) & (t < stim_start + stim_duration),
        stim_amplitude,
        0.0,
    )
    v_th = v_amp * a + v_rest
    I = -s * (c2 / v_amp) * (v - v_rest) + ((c1 / v_amp**2) * (v - v_rest)) * (v - v_th) * (
        -v + v_peak
    )
    ds_dt = b * (-c3 * s + (v - v_rest))
    dv_dt = I + i_app
    return ds_dt, dv_dt


def forward_euler(states, t, parameters, dt, **kwargs):
    """Explicit Euler step over all points at once."""
    ds_dt, dv_dt = rhs(states, t, parameters)
    s = states[0] + dt * ds_dt
    v = states[1] + dt * dv_dt
    if hasattr(states, "at"):  # jax array
        return jnp.stack([s, v])
    out = np.zeros_like(states)
    out[0] = s
    out[1] = v
    return out


# FHN has no gating variables with closed-form quasi-steady states; the
# generalized Rush-Larsen scheme reduces to forward Euler here.
generalized_rush_larsen = forward_euler
