"""Pallas-vs-XLA kernel regression check (committed artifact).

Runs the same Niederer dx=0.5 simulation twice — once with the pallas
kernels (single-kernel ionic step, stencil SpMV, fused PCG) and once on
the plain XLA paths — and records the max voltage deviation.  A Mosaic
lowering change that silently altered kernel numerics would show up here
long before it shifted an activation time.

Usage (on a TPU host)::

    python -m fenicsx_beat_tpu.benchmarks.kernel_check  # writes KERNEL_CHECK.json

The artifact is committed at the repo root so each round's value can be
compared against the history (f32 accumulation-order noise is ~1e-4 over
40 steps; anything above 1e-2 is a real regression).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path


def kernel_check(dx: float = 0.5, dt: float = 0.05, n_steps: int = 40) -> dict:
    import jax
    import numpy as np

    from .niederer import _build_solver

    v = {}
    for use_pallas in (True, False):
        solver = _build_solver(
            dx=dx, use_pallas_ode=use_pallas, pallas_spmv_min_nodes=1
        )
        solver.solve((0.0, n_steps * dt), dt=dt)
        v[use_pallas] = np.asarray(solver.v)
    return {
        "backend": jax.default_backend(),
        "dx": dx,
        "dt": dt,
        "n_steps": n_steps,
        "max_abs_dev": float(np.max(np.abs(v[True] - v[False]))),
        "threshold": 1e-2,
    }


def main() -> int:
    out = kernel_check()
    path = Path.cwd() / "KERNEL_CHECK.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))
    return 0 if out["max_abs_dev"] < out["threshold"] else 1


if __name__ == "__main__":
    sys.exit(main())
