"""Sparse operator containers and compute kernels (the performance core).

``ell.py`` defines the windowed-ELL format — the TPU-native replacement for
the reference's Eigen RowMajor CSR (grid.h:49) — plus XLA reference
implementations.  ``kernels.py`` holds the fused Pallas TPU kernels.
``smoothers.py`` implements the relaxation sweeps (weighted Jacobi /
sequential block-SOR / Neumann boundary row-solve) over either backend.
"""

from meshlessmultigridpoisson_tpu.ops.ell import (
    EllMatrix,
    ell_from_csr,
    ell_to_csr,
    spmv,
    global_cols,
)

__all__ = ["EllMatrix", "ell_from_csr", "ell_to_csr", "spmv", "global_cols"]
