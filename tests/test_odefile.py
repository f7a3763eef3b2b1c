"""Runtime gotran ``.ode`` ingestion gates.

The reference's L9 layer compiles arbitrary gotran files to stepping
code at demo runtime (``/root/reference/demos/niederer_benchmark.py:
75-88``, model data ``/root/reference/odes/``).  These tests pin the
in-repo equivalent (:mod:`fenicsx_beat_tpu.odefile`) against the
hand-written in-repo cell models, state-for-state:

* the generated ``rhs`` matches the hand-written vector field to fp
  tolerance (same published equations, different association order),
* one ``generalized_rush_larsen`` step matches (the hand-written models
  implement the same gotranx GRL1 convention),
* a paced TP06 beat integrated with the GENERATED stepper tracks the
  hand-written trajectory,
* parser errors are actionable (unknown functions, cycles, missing
  derivatives).
"""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from fenicsx_beat_tpu import odefile

ODES = Path("/root/reference/odes")
pytestmark = pytest.mark.skipif(
    not ODES.exists(), reason="reference .ode data not present"
)

# the .ode files guard sympy-reserved names with a trailing underscore
# (I = imaginary unit, O = Order); the hand-written modules use the
# published names
_ALIAS = {"I": "I_", "O": "O_", "ff": "ff_", "rad": "rad_"}


def _load_tp06():
    return odefile.load_ode(
        ODES / "tentusscher_panfilov_2006" / "tentusscher_panfilov_2006_epi_cell.ode"
    )


def _perm(gen, hw_names):
    return [gen.state_index(_ALIAS.get(n, n)) for n in hw_names]


def _reorder_to(gen, hw, states_hw):
    out = np.empty_like(states_hw)
    for i, n in enumerate(hw._STATE_NAMES):
        out[gen.state_index(_ALIAS.get(n, n))] = states_hw[i]
    return out


@pytest.mark.parametrize(
    "ode_rel, hw_name, stim_kw",
    [
        (
            "tentusscher_panfilov_2006/tentusscher_panfilov_2006_epi_cell.ode",
            "tentusscher_panfilov_2006",
            {"stim_amplitude": 0.0},
        ),
        (
            "torord/ToRORd_dynCl_endo.ode",
            "torord_dyncl",
            {"i_Stim_Amplitude": 0.0},
        ),
    ],
)
def test_generated_matches_handwritten(ode_rel, hw_name, stim_kw):
    import importlib

    hw = importlib.import_module(f"fenicsx_beat_tpu.models.{hw_name}")
    gen = odefile.load_ode(ODES / ode_rel)

    # name universes agree (modulo the sympy-guard aliases)
    perm = _perm(gen, hw._STATE_NAMES)
    assert sorted(perm) == list(range(len(hw._STATE_NAMES)))

    s_hw = hw.init_state_values()
    p_hw = hw.init_parameter_values(**stim_kw)
    p_gen = gen.init_parameter_values(**stim_kw)
    np.testing.assert_allclose(
        gen.init_state_values()[perm], s_hw, rtol=0, atol=0
    )
    # shared parameters only: the hand-written models add tissue-side
    # extras (e.g. TP06's celltype morphology switch) the single-variant
    # .ode files don't carry
    shared = [
        (i, gen.parameter_index(_ALIAS.get(n, n)))
        for i, n in enumerate(hw._PARAM_NAMES)
        if _ALIAS.get(n, n) in gen._PARAM_NAMES
    ]
    assert len(shared) >= len(gen._PARAM_NAMES) - 5
    np.testing.assert_allclose(
        p_gen[[j for _, j in shared]], p_hw[[i for i, _ in shared]],
        rtol=0, atol=0,
    )

    # vector-field parity on perturbed states (fp association differs)
    S = np.tile(s_hw[:, None], (1, 3))
    S[hw.state_index("V" if "V" in hw._STATE_NAMES else "v")] += [0.0, 5.0, -5.0]
    S_gen = _reorder_to(gen, hw, S)
    r_hw = np.asarray(hw.rhs(jnp.asarray(S), 10.0, jnp.asarray(p_hw)))
    r_gen = np.asarray(gen.rhs(jnp.asarray(S_gen), 10.0, jnp.asarray(p_gen)))[perm]
    np.testing.assert_allclose(r_gen, r_hw, rtol=5e-7, atol=1e-12)

    # one GRL1 step
    g_hw = np.asarray(
        hw.generalized_rush_larsen(jnp.asarray(S), 10.0, jnp.asarray(p_hw), 0.02)
    )
    g_gen = np.asarray(
        gen.generalized_rush_larsen(
            jnp.asarray(S_gen), 10.0, jnp.asarray(p_gen), 0.02
        )
    )[perm]
    np.testing.assert_allclose(g_gen, g_hw, rtol=1e-8, atol=1e-13)


def test_tp06_paced_beat_trajectory():
    """Integrate 60 ms of a paced TP06 beat (the upstroke and early
    plateau — the stiffest stretch) with the GENERATED stepper and the
    hand-written one; trajectories must track."""
    from fenicsx_beat_tpu.models import tentusscher_panfilov_2006 as hw

    gen = _load_tp06()
    perm = _perm(gen, hw._STATE_NAMES)
    dt = 0.02
    p_hw = jnp.asarray(hw.init_parameter_values(stim_start=5.0))
    p_gen = jnp.asarray(gen.init_parameter_values(stim_start=5.0))
    x_hw = jnp.asarray(hw.init_state_values()[:, None])
    x_gen = jnp.asarray(gen.init_state_values()[:, None])
    vi_hw = hw.state_index("V")
    vi_gen = gen.state_index("V")
    vmax_err = 0.0
    for k in range(3000):
        t = k * dt
        x_hw = hw.generalized_rush_larsen(x_hw, t, p_hw, dt)
        x_gen = gen.generalized_rush_larsen(x_gen, t, p_gen, dt)
        vmax_err = max(
            vmax_err,
            float(jnp.abs(x_gen[vi_gen, 0] - x_hw[vi_hw, 0])),
        )
    assert float(x_hw[vi_hw, 0]) > 0.0  # the beat actually fired
    assert vmax_err < 0.05  # mV, over upstroke + plateau
    np.testing.assert_allclose(
        np.asarray(x_gen)[perm], np.asarray(x_hw), rtol=1e-4, atol=1e-7
    )


def test_land_variant_loads_and_steps():
    gen = odefile.load_ode(ODES / "torord" / "ToRORd_dynCl_endo_Land.ode")
    assert gen.num_states == 52
    x = jnp.asarray(np.tile(gen.init_state_values()[:, None], (1, 2)))
    p = jnp.asarray(gen.init_parameter_values())
    for k in range(50):
        x = gen.generalized_rush_larsen(x, k * 0.02, p, 0.02)
    assert bool(np.isfinite(np.asarray(x)).all())
    # active tension states exist (the Land coupling surface)
    assert "Zetas" in gen._STATE_NAMES and "XS" in gen._STATE_NAMES


def test_generated_module_is_jittable_and_vmappable():
    import jax

    gen = _load_tp06()
    p = jnp.asarray(gen.init_parameter_values(stim_amplitude=0.0))
    x = jnp.asarray(np.tile(gen.init_state_values()[:, None], (1, 64)))
    step = jax.jit(lambda s: gen.generalized_rush_larsen(s, 0.0, p, 0.02))
    y = step(x)
    assert y.shape == x.shape and bool(np.isfinite(np.asarray(y)).all())
    g = jax.grad(lambda s: jnp.sum(gen.rhs(s, 0.0, p) ** 2))(x)
    assert g.shape == x.shape


def test_code_attribute_round_trips(tmp_path):
    """The reference's user pattern writes the generated code next to the
    demo and imports it (niederer_benchmark.py:87); ``module.code`` must
    survive that round trip."""
    gen = _load_tp06()
    f = tmp_path / "tp06_gen.py"
    f.write_text(gen.code)
    import importlib.util

    spec = importlib.util.spec_from_file_location("tp06_gen", f)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    np.testing.assert_array_equal(
        mod.init_state_values(), gen.init_state_values()
    )


def test_parser_errors_are_actionable():
    with pytest.raises(ValueError, match="unknown declaration"):
        odefile.parse_ode("mystery(1)\n", name="x")
    with pytest.raises(ValueError, match="no d<state>_dt"):
        odefile.parse_ode('states("S", a=1.0)\nb = 2.0\n', name="x")
    with pytest.raises(ValueError, match="unsupported function"):
        odefile.generate_code(
            odefile.parse_ode(
                'states("S", a=1.0)\nda_dt = sinh(a)\n', name="x"
            )
        )
    with pytest.raises(ValueError, match="circular"):
        odefile.generate_code(
            odefile.parse_ode(
                'states("S", a=1.0)\nu = w + 1\nw = u + 1\nda_dt = u\n',
                name="x",
            )
        )
    with pytest.raises(ValueError, match="reassignment"):
        odefile.parse_ode('states("S", a=1.0)\nu = 1\nu = 2\nda_dt = u\n')


def test_grl_linearization_convention():
    """HH gates get the exponential update (exactly the classical
    Rush-Larsen form), states whose self-derivative vanishes get Euler."""
    src = (
        'states("S", x=0.5, y=1.0)\n'
        'parameters("S", tau=2.0, k=3.0)\n'
        "x_inf = 1/(1 + exp(-y))\n"
        "dx_dt = (x_inf - x)/tau\n"
        "dy_dt = k*x\n"
    )
    gen = odefile.load_ode(src, name="toy")
    s = jnp.asarray([[0.5], [1.0]])
    p = jnp.asarray(gen.init_parameter_values())
    dt = 0.3
    out = np.asarray(gen.generalized_rush_larsen(s, 0.0, p, dt))
    x_inf = 1.0 / (1.0 + np.exp(-1.0))
    # exact RL exponential on the gate
    np.testing.assert_allclose(
        out[gen.state_index("x"), 0],
        x_inf + (0.5 - x_inf) * np.exp(-dt / 2.0),
        rtol=1e-12,
    )
    # Euler on the zero-self-derivative state
    np.testing.assert_allclose(
        out[gen.state_index("y"), 0], 1.0 + dt * 3.0 * 0.5, rtol=1e-12
    )
