"""Convergence-rate cost of the v7 stale-program sweep mode.

sor_sweep_tpu7(stale_program=True) lets the 8 blocks of one MB-program
read the program-start snapshot (breaking the serial per-block chain that
dominates the exact sweep's wall time: 5.9 -> 2.2 ms at 1M).  The fixed
point is unchanged; this script measures the asymptotic smoother
contraction rho of

  (a) exact (block, class)-GS (one-shot K applied block-sequentially), vs
  (b) stale-program semantics (all 8 blocks of a 1024-row group updated
      from the group-start snapshot),

by power iteration on the error map (b = 0), numpy emulation on real
operators.  Companion of scripts/rho_delta.py (coloring-conflict cost).

Usage: python scripts/rho_stale.py [--out results/rho_stale_r3.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from meshlessmultigridpoisson_tpu.ops.ell import ell_to_csr  # noqa: E402
from meshlessmultigridpoisson_tpu.ops.kernels4 import build_oneshot_K  # noqa: E402

sys.path.insert(0, os.path.dirname(__file__))
from rho_delta import build_op  # noqa: E402

MBROWS = 8 * 128  # rows per MB-program (kernels6.MB blocks)


def _sweep_oneshot(A, K, x, xl, b, lagc, group_rows):
    """One sweep: blocks of 128 rows, groups of ``group_rows`` rows share a
    snapshot (group_rows=128 -> exact block-sequential GS)."""
    n = x.size
    for g0 in range(0, n, group_rows):
        g1 = min(g0 + group_rows, n)
        y = A[g0:g1] @ x + lagc[g0:g1] * xl  # snapshot
        t = b[g0:g1] - y
        for b0 in range(g0, g1, 128):
            j = b0 - g0
            x[b0:b0 + 128] = x[b0:b0 + 128] + t[j:j + 128] @ K[b0 // 128]
    return x


def measure(op, group_rows, iters=120, burn=60):
    A = ell_to_csr(op.A).tocsr()
    A.sum_duplicates()
    n_pad = op.n_pad
    K = np.asarray(build_oneshot_K(
        op.A, op.omega * np.asarray(op.omega_scale),
        np.asarray(op.smooth_mask)))
    lagc = np.asarray(op.lag_col)
    lagr = np.asarray(op.lag_row)
    if op.bound.nrows:
        import scipy.sparse as sp

        rows = np.asarray(op.bound.rows)[: op.bound.nrows]
        coo = ell_to_csr(op.bound.ell).tocoo()
        A_bd = sp.coo_matrix(
            (coo.data, (rows[coo.row], coo.col)), shape=(n_pad, n_pad)
        ).tocsr()
        bd_diag = np.asarray(op.bound.ell.diag)[: op.bound.nrows]
        bd_rows = rows
    else:
        A_bd, bd_rows, bd_diag = None, np.array([], int), np.array([])

    rng = np.random.default_rng(0)
    x = rng.standard_normal(n_pad)
    xl = 0.7
    b = np.zeros(n_pad)
    norms = []
    for _ in range(iters):
        x = _sweep_oneshot(A, K, x, xl, b, lagc, group_rows)
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/rho_stale_r3.json")
    args = ap.parse_args()

    rows = []
    for geom, n, deg, neumann in [
        ("square", 10000, 6, True),
        ("square", 10000, 6, False),
        ("square", 2500, 4, True),
        ("square_with_circle", 10000, 6, True),
    ]:
        op, _ = build_op(geom, n, deg, neumann)
        r_exact = measure(op, group_rows=128)
        r_stale = measure(op, group_rows=MBROWS)
        row = dict(geom=geom, n=n, deg=deg, neumann=neumann,
                   rho_exact_blockseq=r_exact, rho_stale_program=r_stale,
                   rho_delta=r_stale - r_exact)
        rows.append(row)
        print(f"{geom} n={n} deg={deg} neumann={neumann}: "
              f"rho exact={r_exact:.6f} stale={r_stale:.6f} "
              f"delta={r_stale - r_exact:+.2e}", flush=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
