"""Constraint IR, witness solver, hint registry.

≙ reference constraint/ (core.go System, per-curve solver) +
constraint/solver (hint registry).
"""

from .system import R1CS
from .solver import solve, is_satisfied, SolveResult, UnsatisfiedConstraintError
from .hints import register_hint, get_hint, hint_id

__all__ = [
    "R1CS",
    "solve",
    "is_satisfied",
    "SolveResult",
    "UnsatisfiedConstraintError",
    "register_hint",
    "get_hint",
    "hint_id",
]
