"""Global precision / device configuration.

The reference runs all FEM in PETSc double precision.  On TPU the MXU/VPU
native dtype is float32 (f64 is unsupported), so the framework is dtype-
parametric: float64 when JAX x64 is enabled (CPU validation, matches the
reference's accuracy gates), float32 otherwise (TPU production path).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["default_dtype", "default_int"]


def default_dtype():
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def default_int():
    return jnp.int32
