"""Nonlinear solvers (Newton-Krylov)."""

from tpufem.nls.newton import NewtonSolver, NewtonResult

__all__ = ["NewtonSolver", "NewtonResult"]
