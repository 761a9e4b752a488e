"""TPU compute kernels: structured KKT factorization (Riccati-style block
sweeps) and, as profiling demands, Pallas kernels for the hot loops."""

from .block_tridiag import qd_block_tridiag_factor, qd_block_tridiag_solve

__all__ = ["qd_block_tridiag_factor", "qd_block_tridiag_solve"]
