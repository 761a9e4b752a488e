"""TPU compute kernels: structured KKT factorization (Riccati-style block
sweeps, sequential and cyclic-reduction), branch-induced-sparsity tree
factorizations, and, as profiling demands, Pallas kernels for the hot loops."""

from .block_tridiag import qd_block_tridiag_factor, qd_block_tridiag_solve
from .cyclic_reduction import cr_factor, cr_solve
from .branch_sparsity import (
    expand_lambda,
    ltdl,
    ltl,
    mpy_h,
    mpy_l,
    mpy_lt,
    solve_l,
    solve_lt,
    solve_ltl,
)

__all__ = [
    "qd_block_tridiag_factor",
    "qd_block_tridiag_solve",
    "cr_factor",
    "cr_solve",
    "expand_lambda",
    "ltdl",
    "ltl",
    "mpy_h",
    "mpy_l",
    "mpy_lt",
    "solve_l",
    "solve_lt",
    "solve_ltl",
]
