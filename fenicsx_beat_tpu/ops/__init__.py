"""Compute kernels: quadrature, sparse ELL operators, CG solver, Pallas."""

from . import cg, quadrature, sparse  # noqa: F401
