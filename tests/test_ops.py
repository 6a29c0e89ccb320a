"""Property tests: windowed ELL vs scipy, smoother semantics, BC machinery."""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

from meshlessmultigridpoisson_tpu.config import GridConfig
from meshlessmultigridpoisson_tpu.geometry import square_cloud
from meshlessmultigridpoisson_tpu.ops.ell import (
    ell_from_csr,
    ell_to_csr,
    spmv,
    global_cols,
)
from meshlessmultigridpoisson_tpu.ops import smoothers as sm
from meshlessmultigridpoisson_tpu.stencil.operators import (
    bc_flags_from_cloud,
    build_level_operator,
)


def random_csr(m, n, density, seed, square_diag=False):
    rng = np.random.default_rng(seed)
    a = sp.random(m, n, density=density, random_state=rng, format="csr")
    if square_diag:
        a = a + sp.diags(rng.uniform(1, 2, size=min(m, n)), shape=(m, n))
    return a.tocsr()


@pytest.mark.parametrize("shape", [(300, 300), (100, 500), (500, 100)])
def test_ell_roundtrip_and_spmv(shape):
    m, n = shape
    a = random_csr(m, n, 0.05, seed=m + n, square_diag=(m == n))
    ell = ell_from_csr(a, block_rows=64)
    back = ell_to_csr(ell)
    assert (abs(a - back)).max() < 1e-14

    x = np.random.default_rng(0).standard_normal(n)
    y = np.asarray(spmv(ell, jnp.asarray(x)))[:m]
    assert np.allclose(y, a @ x, atol=1e-12)

    gc = np.asarray(global_cols(ell))
    assert gc.min() >= 0 and gc.max() < n


def test_window_locality_bound():
    """Windows must contain every column their block references."""
    a = random_csr(400, 400, 0.03, seed=7, square_diag=True)
    ell = ell_from_csr(a, block_rows=64)
    gc = np.asarray(global_cols(ell))
    ws = np.asarray(ell.win_start)
    for blk in range(ell.nblocks):
        rows = slice(blk * 64, (blk + 1) * 64)
        assert gc[rows].min() >= ws[blk]
        assert gc[rows].max() < ws[blk] + ell.win_size


@pytest.fixture(scope="module")
def dirichlet_op():
    cloud = square_cloud(700, seed=3)
    flags = bc_flags_from_cloud(cloud, ["dirichlet"])
    vals = np.zeros(cloud.n)
    cfg = GridConfig(poly_deg=3)
    return build_level_operator(cloud, flags, vals, cfg), cloud, flags


@pytest.fixture(scope="module")
def neumann_op():
    cloud = square_cloud(700, seed=4)
    flags = bc_flags_from_cloud(cloud, ["neumann"])
    vals = np.where(flags == 2, 0.1, 0.0)  # inhomogeneous g
    cfg = GridConfig(poly_deg=3)
    return build_level_operator(cloud, flags, vals, cfg), cloud, flags


def test_smoother_fixed_point(dirichlet_op):
    """If x solves the pinned system, a sweep leaves it unchanged."""
    op, cloud, flags = dirichlet_op
    A = ell_to_csr(op.A).tolil()
    n_pad = op.n_pad
    smask = np.asarray(op.smooth_mask) > 0
    # solve the system with Dirichlet rows pinned to g=0
    rng = np.random.default_rng(0)
    b = np.where(smask, rng.standard_normal(n_pad), 0.0)
    Afix = A.tocsr().copy().tolil()
    for i in np.nonzero(~smask)[0]:
        Afix.rows[i] = [i]
        Afix.data[i] = [1.0]
    x_star = sp.linalg.spsolve(Afix.tocsr().tocsc(), b)
    x1, _ = sm.smooth(op, jnp.asarray(x_star), jnp.zeros(()), jnp.asarray(b), jnp.zeros(()))
    assert np.abs(np.asarray(x1) - x_star).max() < 1e-9


def test_smoother_reduces_error(dirichlet_op):
    op, cloud, flags = dirichlet_op
    n_pad = op.n_pad
    rng = np.random.default_rng(1)
    b = np.where(np.asarray(op.smooth_mask) > 0, rng.standard_normal(n_pad), 0.0)
    x = jnp.zeros(n_pad)
    r0 = float(sm.relative_residual_l1(op, x, jnp.zeros(()), jnp.asarray(b), jnp.zeros(())))
    for _ in range(4):
        x, _ = sm.smooth(op, x, jnp.zeros(()), jnp.asarray(b), jnp.zeros(()))
    r1 = float(sm.relative_residual_l1(op, x, jnp.zeros(()), jnp.asarray(b), jnp.zeros(())))
    assert r1 < r0 * 0.9


def test_bound_eval_solves_neumann_rows(neumann_op):
    op, cloud, flags = neumann_op
    n_pad = op.n_pad
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(n_pad))
    b = op.neumann_values + jnp.asarray(
        np.where(np.asarray(op.smooth_mask) > 0, rng.standard_normal(n_pad), 0)
    )
    x2 = sm.bound_eval_neumann(op, x, b)
    # every Neumann row must now satisfy its equation exactly
    A = ell_to_csr(op.bound.ell)
    rows = np.asarray(op.bound.rows)[: op.bound.nrows]
    res = np.asarray(b)[rows] - A[: op.bound.nrows] @ np.asarray(x2)
    assert np.abs(res).max() < 1e-10
    # non-boundary rows untouched
    mask = np.ones(n_pad, bool)
    mask[rows] = False
    assert np.array_equal(np.asarray(x2)[mask], np.asarray(x)[mask])


def test_condensation_decouples_boundary_columns(neumann_op):
    """Condensed interior rows have no Neumann columns; rows reverted by the
    partial-condensation guard (kept explicit) may still couple."""
    op, cloud, flags = neumann_op
    A = ell_to_csr(op.A).tocsr()
    crows = np.asarray(op.cond.rows)[: op.cond.nrows]
    assert op.cond.nrows > 0
    nmask = np.asarray(op.neumann_mask) > 0
    sub = A[crows][:, np.nonzero(nmask)[0]]
    assert abs(sub).max() == 0.0


def test_push_inhomog_matches_manual(neumann_op):
    op, cloud, flags = neumann_op
    n_pad = op.n_pad
    rng = np.random.default_rng(3)
    b = np.where(np.asarray(op.smooth_mask) > 0, rng.standard_normal(n_pad), 0.0)
    b = b + np.asarray(op.neumann_values)
    b2 = np.asarray(sm.push_inhomog_to_rhs(op, jnp.asarray(b)))
    # manual: b_i -= sum_j C_ij b_j
    C = ell_to_csr(op.cond.ell)
    rows = np.asarray(op.cond.rows)[: op.cond.nrows]
    expect = b.copy()
    expect[rows] -= C[: op.cond.nrows] @ b
    assert np.abs(b2 - expect).max() < 1e-12


def test_lagrange_border_in_matvec(neumann_op):
    op, cloud, flags = neumann_op
    assert op.has_lagrange
    n_pad = op.n_pad
    rng = np.random.default_rng(4)
    x = rng.standard_normal(n_pad)
    x_lag = 0.7
    y, y_lag = sm.matvec(op, jnp.asarray(x), jnp.asarray(x_lag))
    A = ell_to_csr(op.A)
    expect = A @ x + np.asarray(op.lag_col) * x_lag
    assert np.allclose(np.asarray(y), expect, atol=1e-12)
    assert np.isclose(
        float(y_lag), float(np.dot(np.asarray(op.lag_row), x) + x_lag)
    )
