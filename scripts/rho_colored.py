"""Contraction-rate cost of the v8 COLORED block order (VERDICT r4 #2).

The v8 sweep (ops/kernels8.py) is exact one-shot (block, class)-GS under a
colored block order instead of storage order.  Same fixed point; the
contraction factor rho moves because the GS order changed.  This script
bounds that delta with f64 numpy power iteration on the error map of the
FULL production smoother iteration (one-shot block sweeps + Lagrange row
relax + Neumann boundary re-solve), comparing

  (a) storage block order  (v6/v7 production semantics), vs
  (b) the exact colored order the device executes (ColoredSweep.blkid,
      duplicates collapsed — tests/test_kernels8 proves the kernel matches
      this oracle bit-for-bit at f32).

Usage: python scripts/rho_colored.py [--out results/rho_colored_r4.json]
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

import jax.numpy as jnp  # noqa: E402

from meshlessmultigridpoisson_tpu.ops.ell import ell_to_csr, global_cols  # noqa: E402
from meshlessmultigridpoisson_tpu.ops.kernels4 import build_oneshot_K  # noqa: E402
from meshlessmultigridpoisson_tpu.ops import kernels6 as k6  # noqa: E402
from meshlessmultigridpoisson_tpu.ops import kernels8 as k8  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
from rho_delta import build_op  # noqa: E402


def smoother_factory(op, order):
    """One production smoother iteration (iters=1) as a numpy map, with the
    one-shot block sweep applied in ``order`` (duplicates skipped)."""
    gcols = np.asarray(global_cols(op.A))
    vals = np.asarray(op.A.vals, np.float64)
    K = build_oneshot_K(
        op.A, op.omega * np.asarray(op.omega_scale), np.asarray(op.smooth_mask))
    lagc = np.asarray(op.lag_col)
    lagr = np.asarray(op.lag_row)
    n_pad = op.n_pad
    has_lag = op.has_lagrange
    omega = op.omega
    if op.bound.nrows:
        import scipy.sparse as sp

        rows = np.asarray(op.bound.rows)[: op.bound.nrows]
        coo = ell_to_csr(op.bound.ell).tocoo()
        A_bd = sp.coo_matrix(
            (coo.data, (rows[coo.row], coo.col)), shape=(n_pad, n_pad)).tocsr()
        bd_diag = np.asarray(op.bound.ell.diag)[: op.bound.nrows]
        bd_rows = rows
    else:
        A_bd, bd_rows, bd_diag = None, np.array([], int), np.array([])

    seen_order = []
    seen = set()
    for b in order:
        if int(b) not in seen:
            seen.add(int(b))
            seen_order.append(int(b))

    def step(x, xl):
        for bi in seen_order:
            sl = slice(bi * 128, (bi + 1) * 128)
            y = (vals[sl] * x[gcols[sl]]).sum(axis=1)
            tvec = 0.0 - y - lagc[sl] * xl
            x[sl] = x[sl] + tvec @ K[bi]
        if has_lag:
            xl = (1 - omega) * xl + omega * (0.0 - lagr @ x)
        if A_bd is not None and len(bd_rows):
            y = (A_bd @ x)[bd_rows]
            x[bd_rows] = (0.0 - (y - bd_diag * x[bd_rows])) / bd_diag
        return x, xl

    return step


def rho_of(step, n_pad, iters, burn):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(n_pad)
    xl = 0.7
    norms = []
    for _ in range(iters):
        x, xl = step(x, xl)
        nn = np.abs(x).sum() + abs(xl)
        norms.append(nn)
        x /= nn
        xl /= nn
    return float(np.exp(np.mean(np.log(np.asarray(norms[burn:])))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/rho_colored_r4.json")
    ap.add_argument("--iters", type=int, default=120)
    ap.add_argument("--burn", type=int, default=60)
    args = ap.parse_args()

    configs = [
        ("square", 2500, 6, True),
        ("square", 2500, 6, False),
        ("square", 10000, 6, True),
        ("square_with_circle", 2532, 6, True),
        ("square_with_circle", 10197, 6, True),
    ]
    rows = []
    for geom, n, deg, neumann in configs:
        op, _ = build_op(geom, n, deg, neumann)
        kell = k6.prepare_kernel_ell6(op.A)
        nb = kell.nblocks
        kinvT = build_oneshot_K(
            op.A, op.omega * np.asarray(op.omega_scale),
            np.asarray(op.smooth_mask))
        lagc2 = np.zeros((nb, 128), np.float32)
        lagc2.reshape(-1)[: op.lag_col.shape[0]] = np.asarray(
            op.lag_col, np.float32)
        try:
            c8 = k8.prepare_colored_sweep(kell, kinvT, lagc2, max_expand=3.0, min_blocks=2)
            colored_order = c8.block_order()
            ncolors, expansion = c8.ncolors, c8.expansion
        except k6.Ell4Unsupported as e:
            print(f"{geom} n={n}: colored unsupported ({e})", flush=True)
            continue
        rho_s = rho_of(smoother_factory(op, np.arange(nb)), op.n_pad,
                       args.iters, args.burn)
        rho_c = rho_of(smoother_factory(op, colored_order), op.n_pad,
                       args.iters, args.burn)
        row = dict(geom=geom, n=n, deg=deg, neumann=neumann,
                   ncolors=int(ncolors), expansion=round(float(expansion), 4),
                   rho_storage=rho_s, rho_colored=rho_c,
                   rho_delta=rho_c - rho_s)
        rows.append(row)
        print(json.dumps(row), flush=True)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
