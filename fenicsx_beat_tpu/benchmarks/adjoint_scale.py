"""Differentiable-simulation cost at production scale (one TPU chip).

Times the forward pass and ``jax.value_and_grad`` of a voltage-trace
loss through the full splitting loop (implicit-diff CG, checkpointed
scan) at benchmark resolutions, f32.  The classic expectation for
reverse-mode over a checkpointed loop is a 2-4x overhead over forward;
this pins the measured factor as a committed artifact
(``ADJOINT_SCALE.json``).

Run: ``python -m fenicsx_beat_tpu.benchmarks.adjoint_scale [dx ...]``
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np


def run_adjoint_scale(dx: float, T: float = 20.0, dt: float = 0.05) -> dict:
    import jax
    import jax.numpy as jnp

    from ..adjoint import build_diff_simulator
    from ..geometry import get_3D_slab_geometry
    from ..mesh import locate_entities, meshtags
    from ..models import fitzhughnagumo as fhn
    from ..stimulation import Stimulus, TimeWindow
    from ..stimulation import dx as dx_measure

    geo = get_3D_slab_geometry(None, dx=dx, Lx=20.0, Ly=7.0, Lz=3.0)
    mesh = geo.mesh
    cells = locate_entities(
        mesh, 3, lambda x: (x[0] <= 1.5) & (x[1] <= 1.5) & (x[2] <= 1.5)
    )
    tags = meshtags(mesh, 3, cells, 1)
    I_s = Stimulus(
        expr=TimeWindow(amplitude=50.0, start=0.0, duration=2.0),
        dZ=dx_measure(mesh, subdomain_data=tags),
        marker=1,
    )
    n_steps = int(round(T / dt))
    probes = np.array([[20.0, 7.0, 3.0], [10.0, 3.5, 1.5], [0.0, 0.0, 0.0]])
    sim = build_diff_simulator(
        mesh,
        ode_fun=fhn.forward_euler,
        init_states=fhn.init_state_values(),
        v_index=fhn.state_index("v"),
        I_s=I_s,
        probe_points=probes,
        dt=dt,
        n_steps=n_steps,
        dtype=jnp.float32,
        cg_rtol=1e-6,
        cg_atol=1e-8,
    )
    ionic = jnp.asarray(fhn.init_parameter_values(), jnp.float32)
    target = sim({"g": jnp.float32(0.0012), "ionic": ionic})
    target = jax.block_until_ready(target)

    def loss(params):
        return jnp.mean((sim({**params, "ionic": ionic}) - target) ** 2)

    fwd = jax.jit(loss)
    vg = jax.jit(jax.value_and_grad(loss))
    p = {"g": jnp.float32(0.001)}

    # drain the tunnel's first-pull stall BEFORE any timing (the same
    # pathology bench.py's link_pull_ms probe absorbs; an un-drained
    # first call absorbs minutes of warm-up into "compile time")
    np.asarray(jnp.ones((1024,), jnp.float32))

    # AOT compile timings: lower+compile only, no execution, no transfer
    t0 = time.perf_counter()
    fwd_c = fwd.lower(p).compile()
    fwd_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    vg_c = vg.lower(p).compile()
    vg_compile = time.perf_counter() - t0
    jax.block_until_ready(fwd_c(p))
    jax.block_until_ready(vg_c(p))
    fwd, vg = fwd_c, vg_c

    def best_of(f, n=3):
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            jax.block_until_ready(f(p))
            best = min(best, time.perf_counter() - t0)
        return best

    fwd_s = best_of(fwd)
    vg_s = best_of(vg)
    val, grad = vg(p)
    return {
        "dx": dx,
        "n_nodes": int(np.prod([int(round(L / dx)) + 1 for L in (20.0, 7.0, 3.0)])),
        "n_steps": n_steps,
        "dt": dt,
        "forward_s": round(fwd_s, 4),
        "value_and_grad_s": round(vg_s, 4),
        "adjoint_overhead_x": round(vg_s / fwd_s, 2),
        "forward_compile_s": round(fwd_compile, 1),
        "value_and_grad_compile_s": round(vg_compile, 1),
        "grad_g": float(grad["g"]),
        "loss": float(val),
    }


def main() -> int:
    import jax

    dxs = [float(a) for a in sys.argv[1:]] or [0.2, 0.1]
    out = {"backend": jax.default_backend(), "model": "FitzHugh-Nagumo", "configs": []}
    for dx in dxs:
        row = run_adjoint_scale(dx)
        print(row, file=sys.stderr)
        out["configs"].append(row)
    Path("ADJOINT_SCALE.json").write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
