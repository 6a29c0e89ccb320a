"""Measure the convergence-rate cost of in-block coloring conflicts.

The (block, class) permutation (geometry/coloring.py) tries to make each
class_size-row tile an independent set; at deg 6 the mean in-block degree
(~50) exceeds the 32 available classes in dense blocks, so an equitable
coloring cannot exist and some conflicting pairs remain.  On those pairs
the class-parallel sweep reads a stale intra-class neighbor (Jacobi-like),
deviating from exact Gauss-Seidel.

This script bounds the deviation: for each config it measures the
asymptotic smoother contraction factor rho of

  (a) the framework sweep (ops/smoothers.smooth, class-parallel tiles), vs
  (b) EXACT sequential SOR in the identical global row order
      (numpy, reference grid.cpp:104-146 semantics; zero conflicts),

via power iteration on the error map (b = 0), and reports
rho_framework - rho_exact alongside the conflict-pair count.

Usage: python scripts/rho_delta.py [--out results/rho_delta_r2.json]
"""

import argparse
import json
import os
import sys
import warnings

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from meshlessmultigridpoisson_tpu.config import GridConfig  # noqa: E402
from meshlessmultigridpoisson_tpu.geometry.pointclouds import make_cloud  # noqa: E402
from meshlessmultigridpoisson_tpu.mg.setup import order_cloud  # noqa: E402
from meshlessmultigridpoisson_tpu.ops import smoothers as sm  # noqa: E402
from meshlessmultigridpoisson_tpu.ops.ell import ell_to_csr  # noqa: E402
from meshlessmultigridpoisson_tpu.stencil.operators import (  # noqa: E402
    bc_flags_from_cloud,
    build_level_operator,
)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from test_reference_parity import reference_sor_sweep  # noqa: E402


def build_op(geom, n, deg, neumann, seed=0):
    cloud = make_cloud(geom, n, seed=seed)
    cfg = GridConfig(poly_deg=deg)
    oc = order_cloud(cloud, cfg.stencil_size, neumann)
    flags = bc_flags_from_cloud(
        oc, ["neumann" if neumann else "dirichlet"] * len(oc.boundaries)
    )
    gvals = np.where(flags != 0, 0.1, 0.0)
    with warnings.catch_warnings(record=True) as wl:
        warnings.simplefilter("always")
        op = build_level_operator(oc, flags, gvals, cfg)
    conflicts = 0
    for w in wl:
        msg = str(w.message)
        if "conflicting pairs" in msg:
            conflicts = int(msg.split("left ")[1].split(" conflicting")[0])
    return op, conflicts


def rho_framework(op, iters=120, burn=60):
    n_pad = op.n_pad
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n_pad))
    xl = jnp.asarray(0.7)
    zero = jnp.zeros(n_pad)
    zl = jnp.zeros(())

    step = jax.jit(lambda x, xl: sm.smooth(op, x, xl, zero, zl, iters=1))
    norms = []
    for k in range(iters):
        x, xl = step(x, xl)
        nn = float(jnp.abs(x).sum() + jnp.abs(xl))
        norms.append(nn)
        x, xl = x / nn, xl / nn
    tail = np.asarray(norms[burn:])
    return float(np.exp(np.mean(np.log(tail))))


def rho_exact(op, iters=120, burn=60):
    A = ell_to_csr(op.A).tocsr()
    A.sum_duplicates()
    n_pad = op.n_pad
    smask = np.asarray(op.smooth_mask) > 0
    lagc = np.asarray(op.lag_col)
    lagr = np.asarray(op.lag_row)
    bd_rows = np.asarray(op.bound.rows)
    bd_rows = bd_rows[bd_rows < n_pad] if op.bound.nrows else np.array([], int)
    if op.bound.nrows:
        bd_full = ell_to_csr(op.bound.ell).tocsr()
        # compact rows -> scatter into [n_pad, n_pad]
        import scipy.sparse as sp

        rows = np.asarray(op.bound.rows)[: op.bound.nrows]
        coo = bd_full.tocoo()
        A_bd = sp.coo_matrix(
            (coo.data, (rows[coo.row], coo.col)), shape=(n_pad, n_pad)
        ).tocsr()
        bd_diag = np.asarray(op.bound.ell.diag)[: op.bound.nrows]
        bd_rows = rows
    else:
        A_bd = None
        bd_diag = np.array([])
    # effective per-row omega (stabilized rows carry omega_scale)
    omega_row = op.omega * np.asarray(op.omega_scale)

    rng = np.random.default_rng(0)
    x = rng.standard_normal(n_pad)
    xl = 0.7
    b = np.zeros(n_pad)
    norms = []
    indptr, indices, data = A.indptr, A.indices, A.data
    for k in range(iters):
        # inline reference_sor_sweep but with per-row omega
        for i in range(n_pad):
            if not smask[i]:
                continue
            acc = lagc[i] * xl
            diag = 0.0
            sl = slice(indptr[i], indptr[i + 1])
            cols = indices[sl]
            vals = data[sl]
            own = cols == i
            diag = vals[own].sum()
            acc += vals[~own] @ x[cols[~own]]
            w = omega_row[i]
            x[i] = (1 - w) * x[i] + w / diag * (b[i] - acc)
        if op.has_lagrange:
            xl = (1 - op.omega) * xl + op.omega * (0.0 - lagr @ x)
        if A_bd is not None and len(bd_rows):
            y = (A_bd @ x)[bd_rows]
            x[bd_rows] = (b[bd_rows] - (y - bd_diag * x[bd_rows])) / bd_diag
        nn = np.abs(x).sum() + abs(xl)
        norms.append(nn)
        x /= nn
        xl /= nn
    tail = np.asarray(norms[burn:])
    return float(np.exp(np.mean(np.log(tail))))


def _numpy_sweep_parallel(A, S, x, xl, b, bl, smask, lagc, lagr, bd_rows,
                          bd_diag, A_bd, omega_row, omega, has_lag):
    """The framework's class-parallel sweep (ops/smoothers._gs_sweep) in
    numpy: each S-row tile updates simultaneously from the CURRENT x —
    conflicting in-tile pairs read stale values, exactly as on device."""
    n = x.size
    for t0 in range(0, n, S):
        sl = slice(t0, t0 + S)
        y = A[sl] @ x + lagc[sl] * xl
        dg = A_diag_cache[id(A)][sl]  # tile-row diagonals
        xi = (1 - omega_row[sl]) * x[sl] + omega_row[sl] / dg * (
            b[sl] - (y - dg * x[sl])
        )
        x[sl] = np.where(smask[sl], xi, x[sl])
    if has_lag:
        xl = (1 - omega) * xl + omega * (bl - lagr @ x)
    if A_bd is not None and len(bd_rows):
        y = (A_bd @ x)[bd_rows]
        x[bd_rows] = (b[bd_rows] - (y - bd_diag * x[bd_rows])) / bd_diag
    return x, xl


def _numpy_sweep_exact(A, S, x, xl, b, bl, smask, lagc, lagr, bd_rows,
                       bd_diag, A_bd, omega_row, omega, has_lag):
    """Exact sequential SOR in the identical global order."""
    indptr, indices, data = A.indptr, A.indices, A.data
    for i in range(x.size):
        if not smask[i]:
            continue
        sl = slice(indptr[i], indptr[i + 1])
        cols = indices[sl]
        vals = data[sl]
        own = cols == i
        diag = vals[own].sum()
        acc = lagc[i] * xl + vals[~own] @ x[cols[~own]]
        w = omega_row[i]
        x[i] = (1 - w) * x[i] + w / diag * (b[i] - acc)
    if has_lag:
        xl = (1 - omega) * xl + omega * (bl - lagr @ x)
    if A_bd is not None and len(bd_rows):
        y = (A_bd @ x)[bd_rows]
        x[bd_rows] = (b[bd_rows] - (y - bd_diag * x[bd_rows])) / bd_diag
    return x, xl


A_diag_cache: dict = {}


def two_grid_rho(geom, sizes, deg, neumann, sweep_fn, iters=40, burn=15):
    """Asymptotic two-grid convergence factor with ``sweep_fn`` smoothing,
    numpy end-to-end (exact bordered coarse solve isolates the smoother)."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    from meshlessmultigridpoisson_tpu.models.poisson import make_poisson_problem

    prob = make_poisson_problem(geom, sizes=sizes, poly_deg=deg,
                                neumann=neumann, seed=0)
    hier = prob.hierarchy
    opc, opf = hier.levels[0], hier.levels[1]
    R = ell_to_csr(hier.restrict[0]).tocsr()
    P = ell_to_csr(hier.prolong[0]).tocsr()
    Af = ell_to_csr(opf.A).tocsr()
    Ac = ell_to_csr(opc.A).tocsr()
    A_diag_cache[id(Af)] = np.asarray(opf.A.diag)

    nc = opc.n_pad
    if opc.has_lagrange:
        lc = np.asarray(opc.lag_col)[:, None]
        lr = np.asarray(opc.lag_row)[None, :]
        Acb = sp.bmat([[Ac, lc], [lr, np.ones((1, 1))]], format="csc")
    else:
        Acb = Ac.tocsc()
    coarse_lu = spla.splu(Acb)

    nf = opf.n_pad
    smask = np.asarray(opf.smooth_mask) > 0
    lagc = np.asarray(opf.lag_col)
    lagr = np.asarray(opf.lag_row)
    omega_row = opf.omega * np.asarray(opf.omega_scale)
    dmask = np.asarray(opf.dirichlet_mask) > 0
    nmask_c = np.asarray(opc.neumann_mask) > 0
    dmask_c = np.asarray(opc.dirichlet_mask) > 0
    if opf.bound.nrows:
        rows = np.asarray(opf.bound.rows)[: opf.bound.nrows]
        coo = ell_to_csr(opf.bound.ell).tocoo()
        A_bd = sp.coo_matrix(
            (coo.data, (rows[coo.row], coo.col)), shape=(nf, nf)).tocsr()
        bd_diag = np.asarray(opf.bound.ell.diag)[: opf.bound.nrows]
        bd_rows = rows
    else:
        A_bd, bd_rows, bd_diag = None, np.array([], int), np.array([])

    nu = opf.iters
    has_lag = opf.has_lagrange

    def cycle(x, xl):
        b = np.zeros(nf)
        x = np.where(dmask, 0.0, x)  # boundaryOp("fine"), zero BC data
        for _ in range(nu):
            x, xl = sweep_fn(Af, opf.class_size, x, xl, b, 0.0, smask, lagc,
                             lagr, bd_rows, bd_diag, A_bd, omega_row,
                             opf.omega, has_lag)
        r = b - (Af @ x + lagc * xl)
        r = np.where(dmask, 0.0, r)
        bc = R @ r
        bc = np.where(dmask_c, 0.0, bc)
        if has_lag:
            bc = np.where(nmask_c, 0.0, bc)
        if opc.has_lagrange:
            sol = coarse_lu.solve(np.concatenate([bc, [0.0]]))
            xc = sol[:nc]
        else:
            xc = coarse_lu.solve(bc)
        corr = P @ xc
        if not has_lag:
            corr = np.where(dmask, 0.0, corr)
        x = x + corr
        for _ in range(nu):
            x, xl = sweep_fn(Af, opf.class_size, x, xl, b, 0.0, smask, lagc,
                             lagr, bd_rows, bd_diag, A_bd, omega_row,
                             opf.omega, has_lag)
        return x, xl

    rng = np.random.default_rng(1)
    x = rng.standard_normal(nf)
    x[~smask & ~dmask] = 0.0
    xl = 0.3
    norms = []
    for k in range(iters):
        x, xl = cycle(x, xl)
        nn = np.abs(x).sum() + abs(xl)
        norms.append(nn)
        x /= nn
        xl /= nn
    tail = np.asarray(norms[burn:])
    return float(np.exp(np.mean(np.log(tail))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/rho_delta_r2.json")
    ap.add_argument("--iters", type=int, default=120)
    ap.add_argument("--two-grid", action="store_true",
                    help="also measure two-grid cycle rho for both smoothers")
    args = ap.parse_args()

    configs = [
        ("square", 2500, 6, True),
        ("square", 2500, 6, False),
        ("square", 10000, 6, True),
        ("square_with_circle", 2532, 6, True),
    ]
    rows = []
    for geom, n, deg, neumann in configs:
        op, conflicts = build_op(geom, n, deg, neumann)
        nnz_conflict_frac = conflicts / max(op.n, 1)
        rf = rho_framework(op, iters=args.iters)
        re_ = rho_exact(op, iters=args.iters)
        row = dict(
            geom=geom, n=n, deg=deg, neumann=neumann,
            conflict_pairs=conflicts,
            conflict_pair_per_row=nnz_conflict_frac,
            rho_framework=rf, rho_exact_gs=re_, rho_delta=rf - re_,
        )
        rows.append(row)
        print(json.dumps(row), flush=True)
    if args.two_grid:
        for geom, sizes, deg, neumann in [
            ("square", [600, 2500], 6, False),
            ("square", [600, 2500], 6, True),
            ("square", [2500, 10000], 6, True),
        ]:
            rp = two_grid_rho(geom, sizes, deg, neumann, _numpy_sweep_parallel)
            re2 = two_grid_rho(geom, sizes, deg, neumann, _numpy_sweep_exact)
            row = dict(
                kind="two_grid", geom=geom, sizes=sizes, deg=deg,
                neumann=neumann, rho_framework=rp, rho_exact_gs=re2,
                rho_delta=rp - re2,
            )
            rows.append(row)
            print(json.dumps(row), flush=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
