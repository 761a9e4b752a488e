"""TPU compute kernels: structured KKT factorization (Riccati-style block
sweeps: sequential scan, cyclic-reduction, and the Pallas inverse-based
cyclic reduction used on TPU), lane-batched Pallas block linear algebra,
and branch-induced-sparsity tree factorizations."""

from .block_tridiag import qd_block_tridiag_factor, qd_block_tridiag_solve
from .cr_inverse import CRInvFactor, cri_factor, cri_solve
from .cyclic_reduction import cr_factor, cr_solve
from .pallas_blocks import chol_inverse, make_qd_inverse, qd_inverse, qd_inverse_ref
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
    "CRInvFactor",
    "cri_factor",
    "cri_solve",
    "chol_inverse",
    "make_qd_inverse",
    "qd_inverse",
    "qd_inverse_ref",
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
