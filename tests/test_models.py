"""Ionic model tests: published resting/AP characteristics for TP06,
ToR-ORd dynCl and ToR-ORd dynCl + Land (reference models come from
``odes/`` via gotranx, e.g. ``demos/biv_endocardial.py:134-174``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fenicsx_beat_tpu.models import (
    tentusscher_panfilov_2006 as tp06,
    torord_dyncl,
    torord_dyncl_land,
)

ALL_MODELS = [tp06, torord_dyncl, torord_dyncl_land]


def _pace(model, T_ms, dt, **param_overrides):
    y0 = jnp.asarray(model.init_state_values()[:, None])
    p = jnp.asarray(model.init_parameter_values(**param_overrides))
    v_idx = model.state_index("V" if "V" in model._STATE_NAMES else "v")

    @jax.jit
    def run(y):
        def step(carry, _):
            y, t = carry
            y = model.generalized_rush_larsen(y, t, p, dt)
            return (y, t + dt), y[v_idx, 0]

        (y, _), vtr = jax.lax.scan(step, (y, 0.0), None, length=int(T_ms / dt))
        return y, vtr

    y, vtr = run(y0)
    return np.asarray(y), np.asarray(vtr)


@pytest.mark.parametrize("model", ALL_MODELS, ids=lambda m: m.__name__.split(".")[-1])
def test_model_contract(model):
    y = model.init_state_values()
    p = model.init_parameter_values()
    assert y.ndim == 1 and p.ndim == 1
    v_name = "V" if "V" in model._STATE_NAMES else "v"
    assert model.state_index(v_name) >= 0
    y2 = np.asarray(model.generalized_rush_larsen(y[:, None], 0.0, p, 0.01))
    assert y2.shape == (y.size, 1)
    assert np.isfinite(y2).all()
    y3 = np.asarray(model.forward_euler(y[:, None], 0.0, p, 0.001))
    assert np.isfinite(y3).all()


@pytest.mark.parametrize(
    "model,stim",
    [
        (tp06, dict(stim_start=10.0)),
        (torord_dyncl, dict(i_Stim_Start=10.0)),
        (torord_dyncl_land, dict(i_Stim_Start=10.0)),
    ],
    ids=["tp06", "torord", "torord_land"],
)
def test_action_potential_morphology(model, stim):
    y, vtr = _pace(model, T_ms=450.0, dt=0.02, **stim)
    rest = vtr[int(9.0 / 0.02)]
    peak = vtr.max()
    assert np.isfinite(y).all()
    assert -92.0 < rest < -80.0
    assert 20.0 < peak < 60.0
    # APD90 in the physiological range
    v90 = peak - 0.9 * (peak - rest)
    above = np.where(vtr > v90)[0]
    apd90 = (above[-1] - above[0]) * 0.02
    assert 150.0 < apd90 < 400.0


def test_torord_celltype_switch():
    """Epi/mid scalings change the AP (published transmural differences)."""
    _, v_endo = _pace(torord_dyncl, T_ms=400.0, dt=0.02, i_Stim_Start=5.0, celltype=0.0)
    _, v_epi = _pace(torord_dyncl, T_ms=400.0, dt=0.02, i_Stim_Start=5.0, celltype=1.0)
    _, v_mid = _pace(torord_dyncl, T_ms=400.0, dt=0.02, i_Stim_Start=5.0, celltype=2.0)

    def apd90(vtr):
        rest, peak = vtr[200], vtr.max()
        v90 = peak - 0.9 * (peak - rest)
        above = np.where(vtr > v90)[0]
        return (above[-1] - above[0]) * 0.02

    a_endo, a_epi, a_mid = apd90(v_endo), apd90(v_epi), apd90(v_mid)
    # mid-myocardial cells have the longest APD; epi shorter than endo
    assert a_mid > a_endo > a_epi


def test_land_tension_develops():
    model = torord_dyncl_land
    y0 = jnp.asarray(model.init_state_values()[:, None])
    p = jnp.asarray(model.init_parameter_values(i_Stim_Start=5.0))
    dt = 0.02

    @jax.jit
    def run(y):
        def step(carry, _):
            y, t = carry
            y = model.generalized_rush_larsen(y, t, p, dt)
            ta, _, _ = model.active_tension(y, p)
            return (y, t + dt), ta[0]

        (y, _), ta_tr = jax.lax.scan(step, (y, 0.0), None, length=int(300 / dt))
        return y, ta_tr

    _, ta = run(y0)
    ta = np.asarray(ta)
    # twitch: near-zero baseline, development to >5 kPa, partial relaxation
    assert ta[10] < 1.0
    assert ta.max() > 5.0
    assert ta[-1] < 0.8 * ta.max()


def test_torord_resting_stability():
    """Without stimulus the state drifts only slowly from the published IC."""
    y, vtr = _pace(torord_dyncl, T_ms=200.0, dt=0.02, i_Stim_Start=1e18)
    assert abs(vtr[-1] - (-89.74808)) < 1.0


def test_f32_f64_consistency():
    """One GRL step in f32 stays within mixed-precision tolerance of f64
    (the TPU production path runs f32; reference runs PETSc f64)."""
    import jax

    for model in ALL_MODELS:
        y64 = jnp.asarray(model.init_state_values()[:, None], dtype=jnp.float64)
        p64 = jnp.asarray(model.init_parameter_values(), dtype=jnp.float64)
        y = y64
        for k in range(20):
            y = model.generalized_rush_larsen(y, 0.05 * k, p64, 0.05)
        y32 = jnp.asarray(y64, dtype=jnp.float32)
        p32 = jnp.asarray(p64, dtype=jnp.float32)
        z = y32
        for k in range(20):
            z = model.generalized_rush_larsen(z, jnp.float32(0.05 * k), p32, jnp.float32(0.05))
        v_idx = model.state_index("V" if "V" in model._STATE_NAMES else "v")
        dv = abs(float(y[v_idx, 0]) - float(z[v_idx, 0]))
        assert np.isfinite(np.asarray(z)).all(), model.__name__
        assert dv < 0.05, f"{model.__name__}: f32 voltage drift {dv} mV after 20 steps"
