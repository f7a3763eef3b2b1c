"""Anisotropic conductivity personalization by gradient descent through the solver.

Demonstrates the differentiable-simulation capability
(:mod:`fenicsx_beat_tpu.adjoint`) the reference stack does not have: fit
the fiber and transverse conductivities ``(g_l, g_t)`` — two independent
components of ``K(g) = g_l K_fiber + g_t K_transverse`` — so simulated
probe voltage traces match observations, with the gradient computed by
reverse-mode autodiff THROUGH the operator-splitting time loop (implicit
differentiation of the CG solve via ``lax.custom_linear_solve``).

Synthetic-twin protocol: generate target traces at the true anisotropic
pair, start the optimizer at half both values, and recover them from the
traces alone.

Run: ``python demos/conductivity_fit.py [--quick]``
"""

from __future__ import annotations

import argparse
import os as _os
import sys as _sys
from pathlib import Path

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--quick", action="store_true", help="CI smoke: fewer steps")
    parser.add_argument("-o", "--outdir", type=Path, default=Path("results-fit"))
    args = parser.parse_args(argv)

    jax.config.update("jax_enable_x64", True)

    from fenicsx_beat_tpu import mesh as meshmod
    from fenicsx_beat_tpu import stimulation
    from fenicsx_beat_tpu.adjoint import build_diff_simulator
    from fenicsx_beat_tpu.models import fitzhughnagumo as fhn

    nx = 16 if args.quick else 32
    n_steps = 60 if args.quick else 250
    iters = 12 if args.quick else 60

    mesh = meshmod.create_unit_square(None, nx, nx)
    cells = meshmod.locate_entities(mesh, 2, lambda x: (x[0] < 0.25) & (x[1] < 0.25))
    tags = meshmod.meshtags(mesh, 2, cells, 1)
    I_s = stimulation.Stimulus(
        expr=stimulation.TimeWindow(amplitude=40.0, start=0.0, duration=1.0),
        dZ=stimulation.dx(mesh, subdomain_data=tags),
        marker=1,
    )
    # anisotropic tissue: fit the fiber and transverse conductivities
    # independently — K(g) = g_l K_fiber + g_t K_transverse
    f0 = np.array([1.0, 0.0])
    K_l = np.outer(f0, f0)
    K_t = np.eye(2) - K_l
    probes = np.array([[0.2, 0.2], [0.5, 0.5], [0.8, 0.8], [0.2, 0.8], [0.8, 0.2]])
    sim = build_diff_simulator(
        mesh,
        ode_fun=fhn.forward_euler,
        init_states=fhn.init_state_values(),
        v_index=fhn.state_index("v"),
        I_s=I_s,
        probe_points=probes,
        dt=0.1,
        n_steps=n_steps,
        stiffness_components=[K_l, K_t],
    )
    ionic = jnp.asarray(fhn.init_parameter_values())

    g_true = np.array([0.004, 0.0012])  # fiber ~3x transverse
    target = sim({"g": jnp.asarray(g_true), "ionic": ionic})
    print(f"synthetic target generated at (g_l, g_t) = {tuple(g_true)}")

    def loss(log_g):
        out = sim({"g": jnp.exp(log_g), "ionic": ionic})
        return jnp.mean((out - target) ** 2)

    vg = jax.jit(jax.value_and_grad(loss))

    import optax

    log_g = jnp.log(jnp.asarray(g_true / 2))  # start at half both values
    opt = optax.adam(0.15)
    state = opt.init(log_g)
    hist = []
    for it in range(iters):
        val, grad = vg(log_g)
        upd, state = opt.update(grad, state)
        log_g = optax.apply_updates(log_g, upd)
        g = np.exp(np.asarray(log_g))
        hist.append((it, float(val), g[0], g[1]))
        if it % max(1, iters // 10) == 0:
            print(f"iter {it:3d}  loss={float(val):.3e}  g_l={g[0]:.5f} g_t={g[1]:.5f}")

    g_fit = np.exp(np.asarray(log_g))
    rel = np.abs(g_fit - g_true) / g_true
    print(
        f"recovered (g_l, g_t) = ({g_fit[0]:.5f}, {g_fit[1]:.5f})  "
        f"(true ({g_true[0]:g}, {g_true[1]:g}), rel err {rel[0]:.1%}/{rel[1]:.1%})"
    )
    assert hist[-1][1] < 0.2 * hist[0][1], "optimization failed to reduce the loss"

    args.outdir.mkdir(parents=True, exist_ok=True)
    np.savetxt(
        args.outdir / "fit_history.csv",
        np.asarray(hist),
        header="iter loss g_l g_t",
        comments="",
    )
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        h = np.asarray(hist)
        fig, ax = plt.subplots(1, 2, figsize=(9, 3.2))
        ax[0].semilogy(h[:, 0], h[:, 1])
        ax[0].set(xlabel="iteration", ylabel="trace MSE", title="loss")
        ax[1].plot(h[:, 0], h[:, 2], label="g_l (fit)")
        ax[1].plot(h[:, 0], h[:, 3], label="g_t (fit)")
        ax[1].axhline(g_true[0], ls="--", c="k", lw=0.8)
        ax[1].axhline(g_true[1], ls=":", c="k", lw=0.8)
        ax[1].set(xlabel="iteration", title="fiber / transverse conductivity")
        ax[1].legend()
        fig.tight_layout()
        fig.savefig(args.outdir / "fit.png", dpi=110)
        print(f"wrote {args.outdir}/fit.png")
    except Exception as exc:  # matplotlib optional at runtime
        print(f"(plot skipped: {exc})")
    return g_fit


if __name__ == "__main__":
    main()
