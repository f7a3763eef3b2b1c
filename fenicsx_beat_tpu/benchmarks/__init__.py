"""Benchmark runners (Niederer 2011 slab benchmark, convergence studies)."""

from . import niederer  # noqa: F401
