"""Measured forward-perf experiment on the compute-bound ionic kernel
(VERDICT r4 #8): bf16 COMPUTE for the TP06 generalized-Rush-Larsen step.

ROOFLINE.json pins the fused TP06 ionic kernel at ~130 us vs an ~87 us
HBM floor at dx=0.1 — compute-bound on the ~58 exp evaluations per node.
bf16 *storage* alone cannot help a compute-bound kernel; this probe
measures whether Mosaic's bf16 arithmetic (and transcendentals) runs the
whole step faster, and what it costs in accuracy:

* ``f32``: the production kernel (baseline).
* ``bf16``: the same kernel built with ``dtype=bfloat16`` — states,
  voltage, and every intermediate in bf16.

Both are timed amortized inside one jitted ``fori_loop`` (the tunnel's
~25 ms dispatch would otherwise swamp a ~100 us kernel), and both are
integrated 40 paced steps against an f64 reference for max |dV|.

Run on the chip:  python -m fenicsx_beat_tpu.benchmarks.ionic_bf16
Prints one JSON line; record the outcome (positive or negative) in
docs/DESIGN.md section 8 next to the LUT and multirate experiments.
"""

from __future__ import annotations

import argparse
import json
import time as _time

import jax
import jax.numpy as jnp
import numpy as np


def _timed_step(step, states, v, vi, n_iter=400, reps=3):
    # t varies with the loop index and v chains from the stepped states:
    # every iteration depends on the previous one AND on i, so XLA can
    # neither hoist the body nor collapse the loop
    @jax.jit
    def run(s, vv):
        def body(i, carry):
            s, vv = carry
            s = step(s, vv, i * 0.02, 0.02)
            return (s, s[vi].reshape(vv.shape))

        return jax.lax.fori_loop(0, n_iter, body, (s, vv))

    out = run(states, v)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = _time.perf_counter()
        jax.block_until_ready(run(states, v))
        best = min(best, (_time.perf_counter() - t0) / n_iter)
    return best


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=442368,
                    help="node count (default: the dx=0.1 Niederer slab)")
    ap.add_argument("--acc-steps", type=int, default=40)
    args = ap.parse_args(argv)

    from ..models import tentusscher_panfilov_2006 as tp06
    from ..ops.pallas_ode import build_pallas_ode_step

    n = args.n
    S = len(tp06.init_state_values())
    params = np.asarray(tp06.init_parameter_values(stim_amplitude=0.0))
    vi = tp06.state_index("V")
    LANE = 128
    m = n // LANE

    out = {"mode": "ionic_bf16", "n_nodes": n, "model": "tp06",
           "backend": jax.default_backend()}
    rng = np.random.default_rng(5)
    init = np.asarray(tp06.init_state_values(), np.float64)
    # mildly perturbed states: exercise the full rate expressions, not
    # just the resting fixed point
    states64 = np.tile(init[:, None], (1, n)) * (
        1.0 + 0.01 * rng.standard_normal((S, n))
    )
    v64 = states64[vi].copy()

    results = {}
    for tag, dt_ in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        try:
            step = build_pallas_ode_step(
                tp06.generalized_rush_larsen, num_states=S, n_nodes=n,
                parameters=params, dtype=dt_, v_index=vi, blocked_io=True,
            )
            sb = jnp.asarray(states64, dt_).reshape(S, m, LANE)
            vv = jnp.asarray(v64, dt_)
            us = _timed_step(step, sb, vv, vi) * 1e6
            out[tag + "_us"] = round(us, 1)

            # accuracy: paced integration vs float64 jnp reference
            s_acc, v_acc = sb, vv
            for k in range(args.acc_steps):
                s_acc = step(s_acc, v_acc, k * 0.02, 0.02)
                v_acc = s_acc[vi].reshape(-1)[:n]
            v_end = np.asarray(v_acc, np.float64)
            # degenerate-measurement guard: the trajectory must have moved
            assert np.max(np.abs(v_end - v64)) > 1e-3, "trajectory frozen"
            results[tag] = v_end
        except Exception as exc:  # record the failure mode honestly
            out[tag + "_error"] = f"{type(exc).__name__}: {exc}"[:200]

    s_ref = jnp.asarray(states64, jnp.float64)
    for k in range(args.acc_steps):
        s_ref = tp06.generalized_rush_larsen(s_ref, k * 0.02,
                                             jnp.asarray(params, jnp.float64),
                                             0.02)
    v_ref = np.asarray(s_ref[vi], np.float64)
    for tag, v_acc in results.items():
        out[tag + "_max_dv_mV"] = round(
            float(np.max(np.abs(v_acc - v_ref))), 4
        )
    if "f32_us" in out and "bf16_us" in out:
        out["speedup_bf16"] = round(out["f32_us"] / out["bf16_us"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
