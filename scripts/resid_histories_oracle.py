"""Reference-semantics (lexicographic SOR) V-cycle histories, side by side
with the framework's (VERDICT r3 next #7).

The round-3 artifact (results/resid_histories_r3.json) records only the
framework solver's per-cycle histories; the claim that small-hierarchy
Neumann V-cycling "diverges as the reference's algorithm does" had no
reference-semantics curve to back it.  This script runs BOTH for each
config of the same slice:

  framework — mg/vcycle.run_v_cycles (exact (block, class)-GS smoother);
  oracle    — a numpy V-cycle with the IDENTICAL schedule
              (multigrid.cpp:62-110: pre-residual record, descend with
              pre-smooth + Dirichlet-zeroed restriction, coarsest double
              smooth from zero, ascend with prolong + post-smooth) whose
              smoother is EXACT sequential lexicographic SOR in global row
              order (grid.cpp:104-146 semantics, per-row omega, Lagrange
              border last, Neumann rows re-solved after each sweep).

Writes results/resid_histories_oracle_r4.json with both curves per config.

Run: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo CYCLES=60 \
     python scripts/resid_histories_oracle.py
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

SWEEP_SIZES = {
    "square": [170, 600, 2500],
    "square_with_circle": [176, 640, 2532],
    "concentric_circles": [165, 650, 2530],
}


def _level_ctx(op):
    """Dense-ish numpy context for one level: CSR A, bound rows, omegas."""
    import scipy.sparse as sp

    from meshlessmultigridpoisson_tpu.ops.ell import ell_to_csr

    n_pad = op.n_pad
    A = ell_to_csr(op.A).tocsr()
    A.sum_duplicates()
    if op.bound.nrows:
        rows = np.asarray(op.bound.rows)[: op.bound.nrows]
        coo = ell_to_csr(op.bound.ell).tocoo()
        A_bd = sp.coo_matrix(
            (coo.data, (rows[coo.row], coo.col)), shape=(n_pad, n_pad)).tocsr()
        bd_diag = np.asarray(op.bound.ell.diag)[: op.bound.nrows]
        bd_rows = rows
    else:
        A_bd, bd_rows, bd_diag = None, np.array([], int), np.array([])
    return dict(
        op=op, A=A, A_bd=A_bd, bd_rows=bd_rows, bd_diag=bd_diag,
        smask=np.asarray(op.smooth_mask) > 0,
        dmask=np.asarray(op.dirichlet_mask) > 0,
        nmask=np.asarray(op.neumann_mask) > 0,
        dvals=np.asarray(op.dirichlet_values),
        lagc=np.asarray(op.lag_col), lagr=np.asarray(op.lag_row),
        omega_row=op.omega * np.asarray(op.omega_scale),
        indptr=A.indptr, indices=A.indices, data=A.data,
    )


def _bound_eval(c, x, b):
    if c["A_bd"] is not None and len(c["bd_rows"]):
        y = (c["A_bd"] @ x)[c["bd_rows"]]
        x[c["bd_rows"]] = (
            b[c["bd_rows"]] - (y - c["bd_diag"] * x[c["bd_rows"]])
        ) / c["bd_diag"]
    return x


def _lex_sweep(c, x, xl, b):
    """One EXACT sequential lexicographic SOR sweep (grid.cpp:112-145)."""
    indptr, indices, data = c["indptr"], c["indices"], c["data"]
    smask, lagc, w_row = c["smask"], c["lagc"], c["omega_row"]
    for i in range(x.size):
        if not smask[i]:
            continue
        sl = slice(indptr[i], indptr[i + 1])
        cols = indices[sl]
        vals = data[sl]
        own = cols == i
        diag = vals[own].sum()
        acc = lagc[i] * xl + vals[~own] @ x[cols[~own]]
        w = w_row[i]
        x[i] = (1 - w) * x[i] + w / diag * (b[i] - acc)
    return x


def _smooth(c, x, xl, b, bl, iters):
    op = c["op"]
    for _ in range(iters):
        x = _lex_sweep(c, x, xl, b)
        if op.has_lagrange:
            xl = (1 - op.omega) * xl + op.omega * (bl - c["lagr"] @ x)
        x = _bound_eval(c, x, b)
    return x, xl


def _residual(c, x, xl, b, bl):
    op = c["op"]
    y = c["A"] @ x + c["lagc"] * xl
    r = b - y
    r[c["dmask"]] = 0.0
    rl = (bl - (c["lagr"] @ x + xl)) if op.has_lagrange else 0.0
    return r, rl


def oracle_v_cycles(hier, b_fine, cycles):
    """The framework V-cycle schedule with the lexicographic-SOR smoother."""
    from meshlessmultigridpoisson_tpu.ops.ell import ell_to_csr

    L = len(hier.levels)
    ctxs = [_level_ctx(op) for op in hier.levels]
    R = [ell_to_csr(r).tocsr() for r in hier.restrict]
    P = [ell_to_csr(p).tocsr() for p in hier.prolong]
    fine = L - 1
    x = [np.zeros(op.n_pad) for op in hier.levels]
    xl = [0.0] * L
    b = [np.zeros(op.n_pad) for op in hier.levels]
    bl = [0.0] * L
    b[fine] = np.asarray(b_fine, np.float64).copy()
    hist = []
    for _ in range(cycles):
        cf = ctxs[fine]
        r, rl = _residual(cf, x[fine], xl[fine], b[fine], bl[fine])
        den = np.abs(b[fine]).sum() + abs(bl[fine])
        hist.append(float((np.abs(r).sum() + abs(rl)) / den))
        x[fine] = _bound_eval(cf, x[fine], b[fine])
        # descend
        for i in range(fine, 0, -1):
            c = ctxs[i]
            op = c["op"]
            if i != fine:
                x[i][:] = 0.0
                xl[i] = 0.0
            x[i] = np.where(
                c["dmask"], 0.0 if i != fine else c["dvals"], x[i])
            x[i], xl[i] = _smooth(c, x[i], xl[i], b[i], bl[i], op.iters)
            r, _ = _residual(c, x[i], xl[i], b[i], bl[i])
            cc = ctxs[i - 1]
            bc = R[i - 1] @ r
            bc[cc["dmask"]] = 0.0
            if op.has_lagrange:
                bl[i - 1] = 0.0
                bc[cc["nmask"]] = 0.0
            b[i - 1] = bc
        # coarsest: zero guess, double smooth
        c0 = ctxs[0]
        x[0][:] = 0.0
        xl[0] = 0.0
        x[0], xl[0] = _smooth(c0, x[0], xl[0], b[0], bl[0],
                              c0["op"].iters)
        x[0], xl[0] = _smooth(c0, x[0], xl[0], b[0], bl[0],
                              c0["op"].iters)
        # ascend
        for i in range(1, L):
            c = ctxs[i]
            op = c["op"]
            corr = P[i - 1] @ x[i - 1]
            if not op.has_lagrange:
                corr[c["dmask"]] = 0.0
            x[i] = x[i] + corr
            x[i], xl[i] = _smooth(c, x[i], xl[i], b[i], bl[i], op.iters)
    return hist


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    from meshlessmultigridpoisson_tpu.mg.vcycle import run_v_cycles
    from meshlessmultigridpoisson_tpu.models.poisson import (
        l1_error,
        make_poisson_problem,
    )

    cycles = int(os.environ.get("CYCLES", 60))
    rows = []
    for geom, sizes in SWEEP_SIZES.items():
        for deg in (4, 6):
            for neumann in (False, True):
                t0 = time.time()
                prob = make_poisson_problem(
                    geom, sizes=sizes, poly_deg=deg, k1=1, neumann=neumann)
                state, hist_fw = run_v_cycles(
                    prob.hierarchy, prob.state0, cycles)
                hist_fw = np.asarray(hist_fw)
                hist_or = oracle_v_cycles(
                    prob.hierarchy,
                    np.asarray(prob.state0.b[-1]), cycles)
                row = dict(
                    geom=geom, sizes=[c.n for c in prob.clouds], deg=deg,
                    k=1, neumann=neumann, cycles=cycles,
                    framework_history=hist_fw.tolist(),
                    reference_sor_history=hist_or,
                    framework_final=float(hist_fw[-1]),
                    reference_final=float(hist_or[-1]),
                    l1_error=float(l1_error(prob, state.x[-1])),
                    wall_s=round(time.time() - t0, 1),
                )
                rows.append(row)
                print(
                    f"{geom} deg={deg} neumann={neumann}: "
                    f"fw={hist_fw[-1]:.3e} oracle={hist_or[-1]:.3e} "
                    f"({row['wall_s']}s)", file=sys.stderr, flush=True)
    with open("results/resid_histories_oracle_r4.json", "w") as f:
        json.dump(dict(cycles=cycles, configs=rows), f, indent=1)
    print("wrote results/resid_histories_oracle_r4.json")


if __name__ == "__main__":
    main()
