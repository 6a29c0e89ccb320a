"""Relaxation sweeps and residuals (backend-dispatching solver protocol).

Semantics mirror Grid::sor / bound_eval_neumann / residual
(grid.cpp:73-151) with one deliberate deviation (SURVEY.md "hard parts" #1):
the reference's in-place lexicographic SOR is inherently sequential, and
weighted JACOBI measurably diverges on these non-diagonally-dominant RBF-FD
operators (rho(D^-1(L+U)) ~ 1.55) — so the smoother is EXACT Gauss-Seidel
under the (block, class, slot) row permutation prepared at setup
(geometry/coloring.py): scanning the in-block independent-set tiles in
order with fresh values is a true GS ordering with the same fixed point and
measured convergence at least as good as lexicographic.  The Lagrange row
relaxes after the point rows (it is the last row of the reference sweep)
and the Neumann boundary rows are re-solved exactly after every sweep
(grid.cpp:144).

Every function here dispatches: LevelOperator -> the XLA/f64 path below
(the semantics oracle, CPU tests, sharded in-shard math); TpuLevel ->
mg/tpu_backend's fused Pallas kernels (identical semantics, f32).

The Lagrange rank-1 border (grid.cpp:566-576) appears as:
  row i (non-Neumann):  ... + x_lag
  row N (border):       sum_{j non-Neumann} x_j + x_lag = b_lag
applied via lag_col/lag_row dot products — psum-friendly when sharded.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from meshlessmultigridpoisson_tpu.ops.ell import spmv
from meshlessmultigridpoisson_tpu.stencil.operators import LevelOperator


def _is_tpu(op) -> bool:
    return type(op).__name__ == "TpuLevel"


def _tpu():
    from meshlessmultigridpoisson_tpu.mg import tpu_backend

    return tpu_backend


def matvec(op, x: jnp.ndarray, x_lag) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Full bordered matvec: (A x + lag_col*x_lag, lag_row.x + x_lag)."""
    if _is_tpu(op):
        return _tpu().matvec(op, x, x_lag)
    y = spmv(op.A, x)
    if op.has_lagrange:
        y = y + op.lag_col * x_lag
        y_lag = jnp.vdot(op.lag_row, x) + x_lag
    else:
        y_lag = jnp.zeros((), x.dtype)
    return y, y_lag


def bound_eval_neumann(op, x: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Exactly solve each Neumann boundary row for its own unknown.

    x_b = (b_b - sum_{j != b} A_bj x_j) / A_bb  (grid.cpp:73-103).  Boundary
    stencils exclude other boundary points (grid.cpp:236-244), so all rows
    update independently in parallel.
    """
    if _is_tpu(op):
        return _tpu().bound_eval_neumann(op, x, b)
    if op.bound.nrows == 0:
        return x
    c = op.bound
    y = spmv(c.ell, x)  # includes the diagonal term
    xr = jnp.take(x, jnp.minimum(c.rows, op.n_pad - 1))
    br = jnp.take(b, jnp.minimum(c.rows, op.n_pad - 1))
    xb = (br - (y - c.ell.diag * xr)) / c.ell.diag
    return x.at[c.rows].set(xb, mode="drop")


def _gs_sweep(op: LevelOperator, x: jnp.ndarray, x_lag, b: jnp.ndarray):
    """One exact SOR sweep in (block, class) order — the XLA reference path.

    Rows were permuted at setup (geometry/coloring.py) so that each
    [class_size]-row tile is an in-block independent set; scanning tiles in
    order with fresh x is exact Gauss-Seidel under that ordering.  The TPU
    Pallas kernel (ops/kernels.py) implements identical semantics.
    """
    S = op.class_size
    n_pad = op.n_pad
    ntiles = n_pad // S
    width = op.A.width
    vals_t = op.A.vals.reshape(ntiles, S, width)
    # global cols per tile (win_start folded in)
    starts = jnp.repeat(op.A.win_start, op.A.block_rows // S)
    gcols_t = op.A.lcols.reshape(ntiles, S, width) + starts[:, None, None]
    diag_t = op.A.diag.reshape(ntiles, S)
    b_t = b.reshape(ntiles, S)
    m_t = op.smooth_mask.reshape(ntiles, S)
    w_t = (op.omega * op.omega_scale).reshape(ntiles, S)
    lagc_t = op.lag_col.reshape(ntiles, S)

    def step(x, args):
        vals, gcols, d, bb, m, w, lagc, t = args
        xt = jax.lax.dynamic_slice(x, (t * S,), (S,))
        y = jnp.sum(vals * jnp.take(x, gcols, axis=0), axis=1) + lagc * x_lag
        xi = (1.0 - w) * xt + (w / d) * (bb - (y - d * xt))
        xt_new = jnp.where(m > 0, xi, xt)
        x = jax.lax.dynamic_update_slice(x, xt_new, (t * S,))
        return x, None

    tids = jnp.arange(ntiles, dtype=jnp.int32)
    x, _ = jax.lax.scan(
        step, x, (vals_t, gcols_t, diag_t, b_t, m_t, w_t, lagc_t, tids)
    )
    return x


def smooth(
    op,
    x: jnp.ndarray,
    x_lag,
    b: jnp.ndarray,
    b_lag,
    iters: int | None = None,
):
    """``iters`` SOR sweeps (reference sor(), grid.cpp:104-146).

    Each sweep: exact (block, class)-ordered SOR over the interior mask ->
    Lagrange-row relax (the border is the last row of the reference sweep)
    -> Neumann boundary row solve (grid.cpp:144).
    """
    if _is_tpu(op):
        return _tpu().smooth(op, x, x_lag, b, b_lag, iters)
    iters = op.iters if iters is None else iters
    w = op.omega
    for _ in range(iters):
        x = _gs_sweep(op, x, x_lag, b)
        if op.has_lagrange:
            # border row: A_NN = 1 (grid.cpp:573)
            x_lag = (1.0 - w) * x_lag + w * (b_lag - jnp.vdot(op.lag_row, x))
        x = bound_eval_neumann(op, x, b)
    return x, x_lag


def residual(op, x, x_lag, b, b_lag):
    """r = b - A_full x, zeroed at Dirichlet rows (grid.cpp:147-151,197-205).

    Returns (r [n_pad], r_lag scalar).
    """
    y, y_lag = matvec(op, x, x_lag)
    r = b - y
    r = jnp.where(op.dirichlet_mask > 0, 0.0, r)
    r_lag = (b_lag - y_lag) if op.has_lagrange else jnp.zeros((), x.dtype)
    return r, r_lag


def relative_residual_l1(op, x, x_lag, b, b_lag):
    """||r||_1 / ||b||_1 over the full bordered system (multigrid.cpp:112-115)."""
    r, r_lag = residual(op, x, x_lag, b, b_lag)
    num = jnp.sum(jnp.abs(r)) + jnp.abs(r_lag)
    den = jnp.sum(jnp.abs(b)) + jnp.abs(b_lag)
    return num / den


def push_inhomog_to_rhs(op, b: jnp.ndarray) -> jnp.ndarray:
    """b_i -= sum_j C_ij b_j for interior rows (grid.cpp:664-685).

    C = S D^{-1} acts on the CURRENT b (whose Neumann slots hold the
    boundary data g); single application like the reference's copy-based
    loop.
    """
    if _is_tpu(op):
        return _tpu().push_inhomog_to_rhs(op, b)
    if op.cond.nrows == 0:
        return b
    c = op.cond
    delta = spmv(c.ell, b)
    br = jnp.take(b, jnp.minimum(c.rows, op.n_pad - 1))
    return b.at[c.rows].set(br - delta, mode="drop")


def apply_dirichlet(op, x: jnp.ndarray, coarse: bool) -> jnp.ndarray:
    """boundaryOp: pin Dirichlet values to g (fine) or 0 (coarse) (grid.cpp:42-51)."""
    val = jnp.zeros_like(x) if coarse else op.dirichlet_values
    return jnp.where(op.dirichlet_mask > 0, val, x)


def set_neumann_source(op, b: jnp.ndarray, coarse: bool):
    """modify_coeff_neumann: b at Neumann rows := g (fine) or 0 (coarse);
    border slot zeroed by the caller (grid.cpp:62-72)."""
    val = jnp.zeros_like(b) if coarse else op.neumann_values
    return jnp.where(op.neumann_mask > 0, val, b)


def zero_dirichlet(op, v: jnp.ndarray) -> jnp.ndarray:
    """fix_vector_bound_coarse (grid.cpp:197-205)."""
    return jnp.where(op.dirichlet_mask > 0, 0.0, v)


def condition_estimate(op) -> float:
    """1 / rcond of the EFFECTIVELY-SOLVED operator (cf. Grid::cond_L,
    grid.cpp:152-155).

    The reference densifies and LU-factorizes; here scipy's 1-norm condition
    estimator on the sparse matrix (exact enough for the diagnostics the
    reference prints, without the O(n^3) densify).

    Deliberate deviation from grid.cpp:152: the reference conditions the RAW
    assembled matrix, which keeps full Laplacian rows at Dirichlet points
    (grid.cpp:553-565 assembles weights for every bcFlag != 2).  Since the
    smoother never relaxes those rows — they are pinned by boundaryOp
    (grid.cpp:42-51) — this estimate replaces them with identity rows and
    reports the conditioning of the system actually being solved.  Numbers
    differ from the reference's on Dirichlet problems (ours exclude the
    pinned rows' spectrum).
    """
    import numpy as _np
    import scipy.sparse.linalg as _spla

    from meshlessmultigridpoisson_tpu.ops.ell import ell_to_csr

    a = ell_to_csr(op.A).tolil()
    # Dirichlet rows are pinned by the smoother (boundaryOp, grid.cpp:42-51),
    # not relaxed — the solved system has identity rows there.
    for j in _np.where(_np.asarray(op.dirichlet_mask)[: a.shape[0]] > 0)[0]:
        a.rows[j] = [int(j)]
        a.data[j] = [1.0]
    a = a.tocsc()
    if op.has_lagrange:
        # the reference's matrix carries the Lagrange row/col + unit corner
        # in the sparse matrix itself (grid.cpp:566-576); without it the
        # Neumann operator is singular and the estimate meaningless
        import scipy.sparse as _sp

        n = a.shape[0]
        col = _np.asarray(op.lag_col)[:n].reshape(-1, 1)
        row = _np.asarray(op.lag_row)[:n].reshape(1, -1)
        a = _sp.bmat(
            [[a, _sp.csc_matrix(col)],
             [_sp.csc_matrix(row), _sp.csc_matrix([[1.0]])]],
            format="csc",
        )
    lu = _spla.splu(a + 1e-300 * _sp_eye(a.shape[0]))
    one_norm = _np.abs(a).sum(axis=0).max()
    inv_norm = _spla.onenormest(
        _spla.LinearOperator(
            a.shape,
            matvec=lu.solve,
            rmatvec=lambda v: lu.solve(v, trans="T"),
        )
    )
    return float(one_norm * inv_norm)


def _sp_eye(n):
    import scipy.sparse as _sp

    return _sp.identity(n, format="csc")


def single_grid_probe(op, x, b, sweeps: int = 1000):
    """Raw-smoother convergence history (testGmshSingleGrid,
    testing_functions.cpp:422-479): ``sweeps`` single sweeps with the
    per-sweep relative L1 residual recorded."""
    import jax as _jax

    zl = jnp.zeros((), x.dtype)

    def body(carry, _):
        x, xl = carry
        r = relative_residual_l1(op, x, xl, b, zl)
        x, xl = smooth(op, x, xl, b, zl, iters=1)
        return (x, xl), r

    (x, xl), hist = _jax.lax.scan(body, (x, zl), None, length=sweeps)
    return x, hist
