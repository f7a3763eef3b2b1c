"""Bring your own cell model: runtime ``.ode`` ingestion.

Mirror of the reference's gotranx user path
(``demos/niederer_benchmark.py:75-88``): hand the framework a gotran
``.ode`` file and get back a jittable cell-model module with the
standard contract (``init_state_values`` / ``generalized_rush_larsen``
/ ...), then run tissue propagation with it — here the Niederer slab
benchmark driven by the *generated* TP06 stepper instead of the
hand-written in-repo model.

The two-line user path::

    model = beat.odefile.load_ode("my_model.ode")
    solver = beat.MonodomainSplittingSolver(..., fun=model.generalized_rush_larsen)

When the reference ``.ode`` data is not on disk, the demo falls back to
a self-contained inline gotran source (a modified-FHN excitable cell)
to show the same path end-to-end with zero external files.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
from pathlib import Path

import numpy as np

import fenicsx_beat_tpu as beat

TP06_ODE = Path(
    "/root/reference/odes/tentusscher_panfilov_2006/"
    "tentusscher_panfilov_2006_epi_cell.ode"
)

# a complete gotran file as an inline string: states/parameters
# declarations + intermediate expressions + d<state>_dt derivatives.
# Modified FitzHugh-Nagumo in mV (Rogers-McCulloch style).
INLINE_FHN = """
states("Membrane", v=-85.0, w=0.0)
parameters("Membrane",
    v_rest=-85.0, v_peak=40.0, c_1=0.26, c_2=0.1, c_3=1.0, b=0.013)
v_amp = v_peak - v_rest
v_th = v_rest + 0.13 * v_amp
I_ion = c_1 / v_amp**2 * (v - v_rest) * (v - v_th) * (v_peak - v) \
    - c_2 / v_amp * (v - v_rest) * w
dv_dt = I_ion
dw_dt = b * (v - v_rest - c_3 * w)
"""


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ode", type=Path, default=None,
                        help="path to a gotran .ode file (default: the "
                        "reference TP06 epi cell if present, else an "
                        "inline FHN source)")
    parser.add_argument("--quick", action="store_true",
                        help="CI smoke: coarse mesh, short horizon")
    args = parser.parse_args(argv)

    # --- 1. ingest the model at runtime --------------------------------
    if args.ode is not None:
        src = args.ode
    elif TP06_ODE.exists():
        src = TP06_ODE
    else:
        src = None
    if src is not None:
        model = beat.odefile.load_ode(src)
        print(f"loaded {src}")
    else:
        model = beat.odefile.load_ode(INLINE_FHN, name="fhn_inline")
        print("reference .ode data not found; using the inline FHN source")
    print(f"  -> module {model.__name__!r}: {model.num_states} states, "
          f"{model.num_parameters} parameters "
          f"({len(model.code.splitlines())} generated lines)")

    # --- 2. single-cell sanity: one paced step is finite ----------------
    states = np.tile(model.init_state_values()[:, None], (1, 4))
    params = model.init_parameter_values()
    out = np.asarray(
        model.generalized_rush_larsen(states, 0.0, params, 0.02)
    )
    assert np.isfinite(out).all()
    v_name = "V" if "V" in model._STATE_NAMES else "v"
    print(f"  one GRL1 step ok; {v_name}0 = "
          f"{out[model.state_index(v_name), 0]:.3f} mV")

    # --- 3. tissue propagation with the generated stepper ---------------
    from fenicsx_beat_tpu.benchmarks.niederer import run_niederer_benchmark

    dx, T = (0.5, 8.0) if args.quick else (0.5, 40.0)
    result = run_niederer_benchmark(dx=dx, dt=0.05, T=T, model=model)
    p1 = result.activation_times.get("P1", float("nan"))
    print(f"Niederer slab (dx={dx}, generated model): "
          f"P1 activation {p1:.2f} ms, {result.ms_per_second:.1f} ms/s")
    if not args.quick and np.isfinite(p1):
        # generated TP06 must reproduce the hand-written model's corner
        # activation to sub-dt accuracy
        ref = run_niederer_benchmark(dx=dx, dt=0.05, T=T)
        p1_ref = ref.activation_times.get("P1", float("nan"))
        print(f"hand-written model: P1 {p1_ref:.2f} ms "
              f"(delta {abs(p1 - p1_ref):.3f} ms)")
        assert abs(p1 - p1_ref) <= 0.05 + 1e-9
    return result


if __name__ == "__main__":
    main()
