"""Windowed ELL sparse format — the TPU-native operator container.

Replaces the reference's Eigen row-major CSR (``laplaceMat_``, grid.h:49).
Design (see SURVEY.md section 7): rows are RCM-ordered so that every
contiguous block of ``block_rows`` rows references a narrow, contiguous
window of columns.  Column indices are stored *relative to the per-block
window start*, so a kernel processing block ``i`` only needs
``x[win_start[i] : win_start[i] + win_size]`` — one contiguous slice it can
hold in VMEM and gather from with TPU lane-gathers, and, when row-partitioned
across chips, one bounded halo to exchange over ICI.

Layout:
  vals      [nrows_pad, width]  float   (zero-filled padding)
  lcols     [nrows_pad, width]  int32   (window-local column ids)
  win_start [nblocks]           int32   (window origin per row block)
  diag      [nrows_pad]         float   (diagonal entries, 1.0 padding)

Padding entries point at the row's own diagonal column with value 0 so they
are harmless under any mask.  ``nrows``/``ncols`` are the true dims; arrays
are padded to a multiple of ``block_rows``.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("vals", "lcols", "win_start", "diag"),
    meta_fields=("nrows", "ncols", "block_rows", "win_size"),
)
@dataclasses.dataclass(frozen=True)
class EllMatrix:
    vals: jnp.ndarray
    lcols: jnp.ndarray
    win_start: jnp.ndarray
    diag: jnp.ndarray
    nrows: int
    ncols: int
    block_rows: int
    win_size: int

    @property
    def width(self) -> int:
        return self.vals.shape[1]

    @property
    def nrows_pad(self) -> int:
        return self.vals.shape[0]

    @property
    def nblocks(self) -> int:
        return self.nrows_pad // self.block_rows

    @property
    def nnz(self) -> int:
        return self.nrows * self.width  # padded-ELL nnz (stored)

    def astype(self, dtype) -> "EllMatrix":
        return dataclasses.replace(
            self, vals=self.vals.astype(dtype), diag=self.diag.astype(dtype)
        )


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def ell_from_csr(
    a,
    block_rows: int = 256,
    win_align: int = 128,
    width: int | None = None,
    ncols: int | None = None,
) -> EllMatrix:
    """Pack a scipy CSR matrix into windowed ELL (host-side, numpy).

    ``width`` may force a wider ELL than max-nnz-per-row (for cross-level
    consistency); ``ncols`` overrides the logical column count.
    """
    import scipy.sparse as sp

    a = sp.csr_matrix(a)
    a.sum_duplicates()
    nrows = a.shape[0]
    ncols = int(ncols if ncols is not None else a.shape[1])
    row_nnz = np.diff(a.indptr)
    w = max(int(row_nnz.max()), 1) if row_nnz.size else 1
    if width is not None:
        if width < w:
            raise ValueError(f"width={width} < max row nnz {w}")
        w = width
    nrows_pad = _round_up(max(nrows, 1), block_rows)
    nblocks = nrows_pad // block_rows

    a.sort_indices()
    vals = np.zeros((nrows_pad, w), dtype=a.dtype)
    gcols = np.zeros((nrows_pad, w), dtype=np.int64)
    real = np.zeros((nrows_pad, w), dtype=bool)
    diag = np.ones(nrows_pad, dtype=a.dtype)

    rows = np.repeat(np.arange(nrows), row_nnz)
    pos = np.arange(a.nnz) - np.repeat(a.indptr[:-1], row_nnz)
    vals[rows, pos] = a.data
    gcols[rows, pos] = a.indices
    real[rows, pos] = True
    on_diag = (a.indices == rows) & (rows < ncols)
    diag[rows[on_diag]] = a.data[on_diag]

    # per-block windows over REAL entries; padding entries (unused slots,
    # empty rows, padded rows) are pointed at the block's window origin so
    # they never widen the window.
    blocked = gcols.reshape(nblocks, block_rows, w)
    rmask = real.reshape(nblocks, block_rows, w)
    big = np.where(rmask, blocked, np.int64(np.iinfo(np.int64).max))
    small = np.where(rmask, blocked, np.int64(-1))
    lo = big.min(axis=(1, 2))
    hi = small.max(axis=(1, 2))
    empty = ~rmask.any(axis=(1, 2))
    lo[empty] = 0
    hi[empty] = 0
    win_size = int(_round_up(int((hi - lo).max()) + 1, win_align))
    win_start = lo.astype(np.int64)
    gcols = np.where(real, gcols, np.repeat(win_start, block_rows)[:, None])
    lcols = gcols - np.repeat(win_start, block_rows)[:, None]
    assert (lcols >= 0).all() and (lcols < win_size).all()

    return EllMatrix(
        vals=jnp.asarray(vals),
        lcols=jnp.asarray(lcols.astype(np.int32)),
        win_start=jnp.asarray(win_start.astype(np.int32)),
        diag=jnp.asarray(diag),
        nrows=int(nrows),
        ncols=ncols,
        block_rows=int(block_rows),
        win_size=win_size,
    )


def global_cols(ell: EllMatrix) -> jnp.ndarray:
    """[nrows_pad, width] global column indices."""
    starts = jnp.repeat(ell.win_start, ell.block_rows)
    return ell.lcols + starts[:, None].astype(jnp.int32)


def ell_to_csr(ell: EllMatrix):
    """Back to scipy CSR (drops explicit zeros) — for tests/debug."""
    import scipy.sparse as sp

    gc = np.asarray(global_cols(ell))[: ell.nrows]
    v = np.asarray(ell.vals)[: ell.nrows]
    rows = np.repeat(np.arange(ell.nrows), ell.width)
    m = sp.coo_matrix(
        (v.ravel(), (rows, gc.ravel())), shape=(ell.nrows, ell.ncols)
    ).tocsr()
    m.sum_duplicates()
    m.eliminate_zeros()
    return m


def spmv(ell, x: jnp.ndarray) -> jnp.ndarray:
    """y = A @ x (padded-length output [nrows_pad]).

    Dispatches to the Pallas TPU kernel for KernelEll operands; the XLA
    gather path below is the semantics oracle and the CPU/testing backend.
    """
    if type(ell).__name__ == "KernelEll":
        from meshlessmultigridpoisson_tpu.ops.kernels import spmv_tpu

        return spmv_tpu(ell, x)
    if type(ell).__name__ == "KernelEll2":
        from meshlessmultigridpoisson_tpu.ops.kernels import spmv_tpu2

        return spmv_tpu2(ell, x)
    if type(ell).__name__ == "KernelEll6":
        from meshlessmultigridpoisson_tpu.ops.kernels6 import spmv_tpu6

        return spmv_tpu6(ell, x)
    gc = global_cols(ell)
    return jnp.sum(ell.vals * jnp.take(x, gc, axis=0), axis=1)


def spmv_n(ell: EllMatrix, x: jnp.ndarray) -> jnp.ndarray:
    """y = A @ x with the logical row count."""
    return spmv(ell, x)[: ell.nrows]
