"""shard_map solve path: exact cross-shard GS fine level + replicated coarse.

One `shard_map` closure contains the WHOLE V-cycle: the fine level runs
row-sharded, the coarse hierarchy is replicated and reuses the generic
engine (mg/vcycle.py) verbatim inside the mapped function.  Restriction is
a per-shard partial product psum-reduced; prolongation is purely local.

The fine smoother is EXACT Gauss-Seidel under the frontier-phased global
order built by the partitioner (parallel/partition.py docstring):

  per sweep:  for phase p in 0..C-1:
                  ppermute the nf-row frontier slices   (tiny: nf << Ns)
                  scan frontier tiles; apply on shards ≡ p (mod C)
              scan interior tiles                        (NO communication)

Cross-shard reads only ever touch frontier rows (symmetric-pattern
argument), so the exchanges move O(nf) rows instead of full halos, and the
interior scan — the bulk of the work — runs communication-free; XLA's
scheduler is free to overlap the next phase's ppermute with it.  No seam
damping: the sharded sweep has the same fixed point AND a true GS
contraction, so sharded solves converge like serial ones (test_parallel
asserts solution parity at 1e-8).

Reference semantics preserved per sweep: Lagrange row relaxes last
(psum dot), Neumann rows re-solved exactly (grid.cpp:104-146,73-103).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from meshlessmultigridpoisson_tpu.mg import vcycle as vc
from meshlessmultigridpoisson_tpu.ops import smoothers as sm
from meshlessmultigridpoisson_tpu.parallel.partition import (
    ShardedFineLevel,
    ShardedHierarchy,
)

AXIS = "points"


def _frontier_exchange(f: ShardedFineLevel, x: jnp.ndarray) -> jnp.ndarray:
    """x [Ns] -> x_ext [Ns + 2*hops*nf]: own rows, then per hop distance d
    the left(-d) and right(+d) neighbors' frontier slices (zeros off-end)."""
    p = f.num_shards
    nf = f.frontier_rows
    hops = f.phases - 1
    if nf == 0 or hops == 0:
        return x
    xf = x[:nf]
    parts = [x]
    for d in range(1, hops + 1):
        parts.append(lax.ppermute(xf, AXIS, [(i, i + d) for i in range(p - d)]))
        parts.append(lax.ppermute(xf, AXIS, [(i + d, i) for i in range(p - d)]))
    return jnp.concatenate(parts)


def _scan_tiles(f: ShardedFineLevel, x_ext, x_lag, b, t0: int, t1: int, gate):
    """Exact in-shard GS over tiles [t0, t1); updates applied where ``gate``.

    x_ext own rows live at [0, Ns); tiles are class_size-row independent
    sets (recolored per group by the partitioner).
    """
    s = f.class_size
    ns = f.shard_rows
    w = f.width
    sl = slice(t0 * s, t1 * s)
    vals_t = f.vals[sl].reshape(-1, s, w)
    lcols_t = f.lcols_ext[sl].reshape(-1, s, w)
    diag_t = f.diag[sl].reshape(-1, s)
    b_t = b[sl].reshape(-1, s)
    m_t = f.smooth_mask[sl].reshape(-1, s)
    w_t = f.omega_w[sl].reshape(-1, s)
    lagc_t = f.lag_col[sl].reshape(-1, s)

    def step(x_ext, args):
        vals, lc, d, bb, m, ww, lagc, t = args
        pos0 = t0 * s + t * s
        xt = lax.dynamic_slice(x_ext, (pos0,), (s,))
        y = jnp.sum(vals * jnp.take(x_ext, lc, axis=0), axis=1) + lagc * x_lag
        xi = (1.0 - ww) * xt + (ww / d) * (bb - (y - d * xt))
        apply = jnp.logical_and(m > 0, gate)
        x_ext = lax.dynamic_update_slice(
            x_ext, jnp.where(apply, xi, xt), (pos0,))
        return x_ext, None

    tids = jnp.arange(t1 - t0, dtype=jnp.int32)
    x_ext, _ = lax.scan(
        step, x_ext, (vals_t, lcols_t, diag_t, b_t, m_t, w_t, lagc_t, tids)
    )
    return x_ext


def _ext_pad_rows(f: ShardedFineLevel) -> int:
    return -(-max(f.ext_rows, 1) // 128) * 128


def _kell_of(f: ShardedFineLevel):
    """Reassemble the shard-local KernelEll6 from the stacked leaves."""
    from meshlessmultigridpoisson_tpu.ops import kernels6 as K6

    seg = K6.Segment(
        vals=f.k6_vals, lcols=f.k6_lcols, windows=f.k6_windows,
        nblocks=f.k6_nblocks, block_base=0,
    )
    return K6.KernelEll6(
        segments=(seg,), pids=f.k6_pids, perm=f.k6_perm,
        nrows=f.shard_rows, ncols=_ext_pad_rows(f), nrows_pad=f.shard_rows,
        gmax=f.k6_gmax,
    )


def _c8_of(f: ShardedFineLevel):
    """Reassemble the shard-local ColoredSweep from the stacked leaves."""
    from meshlessmultigridpoisson_tpu.ops import kernels8 as K8

    return K8.ColoredSweep(
        vals8=f.k8_vals, lcols8=f.k8_lcols, pids8=f.k8_pids,
        blkid=f.k8_blkid, perm8=f.k8_perm, lagc8=f.k8_lagc,
        kinvT8=f.k8_kinvT,
        g8max=f.k8_g8max, mb=f.k8_mb, nprog=f.k8_nprog,
        nb=f.shard_rows // 128, windows=f.k6_windows, ncolors=0,
        nrows=f.shard_rows, nrows_pad=f.shard_rows,
    )


def _interior_sweep_kernel(f: ShardedFineLevel, x, x_lag, b):
    """Communication-free interior pass on the v8/v6 Pallas kernels.

    The one-shot K was built with frontier rows masked out (constants), so
    sweeping every own block moves only interior rows — identical
    semantics to the tile scan over [nft, ntiles).  Halo slots are fed
    zeros: only masked (frontier) rows reference them.  When the
    partitioner built uniform colored tables the sweep runs v8 (exact GS
    under the colored block order — same deviation class as the
    single-chip production sweep); otherwise the storage-order v6.
    """
    from meshlessmultigridpoisson_tpu.ops.kernels6 import sor_sweep_tpu6
    from meshlessmultigridpoisson_tpu.ops.kernels8 import (
        permute_b8,
        sor_sweep_tpu8,
    )

    ns = f.shard_rows
    nb = ns // 128
    xp = jnp.zeros(_ext_pad_rows(f), x.dtype).at[:ns].set(x)
    x2 = xp.reshape(-1, 128)
    xl = x_lag.astype(x.dtype) if hasattr(x_lag, "astype") else x_lag
    if f.k8_vals is not None:
        c8 = _c8_of(f)
        b8 = permute_b8(c8, b.reshape(nb, 128))
        out = sor_sweep_tpu8(c8, x2, xl, b8)
    else:
        out = sor_sweep_tpu6(
            _kell_of(f), (f.k6_kinvT,), x2,
            xl, b.reshape(nb, 128), f.lag_col.reshape(nb, 128),
        )
    return out.reshape(-1)[:ns]


def _gs_sweep_sharded(f: ShardedFineLevel, x, x_lag, b):
    """One exact global GS sweep (frontier phases then interior)."""
    s = f.class_size
    ns = f.shard_rows
    nf = f.frontier_rows
    ntiles = ns // s
    nft = nf // s
    me = lax.axis_index(AXIS)
    # frontier phases
    for ph in range(f.phases if nf else 0):
        x_ext = _frontier_exchange(f, x)
        gate = (me % f.phases) == ph
        x_ext = _scan_tiles(f, x_ext, x_lag, b, 0, nft, gate)
        x = x_ext[:ns]
    # interior phase: no cross-shard reads
    if f.has_kernels:
        return _interior_sweep_kernel(f, x, x_lag, b)
    pad = jnp.zeros(2 * (f.phases - 1) * nf, x.dtype)
    x_ext = jnp.concatenate([x, pad]) if pad.size else x
    x_ext = _scan_tiles(f, x_ext, x_lag, b, nft, ntiles, True)
    return x_ext[:ns]


def _bound_eval_local(f: ShardedFineLevel, x, b):
    """Neumann row-solve on locally owned boundary rows."""
    x_ext = _frontier_exchange(f, x)
    y = jnp.sum(f.bound_vals * jnp.take(x_ext, f.bound_lcols_ext, axis=0), axis=1)
    safe = jnp.minimum(f.bound_rows, f.shard_rows - 1)
    xr = jnp.take(x, safe)
    br = jnp.take(b, safe)
    xb = (br - (y - f.bound_diag * xr)) / f.bound_diag
    return x.at[f.bound_rows].set(xb, mode="drop")


def _psum(v):
    return lax.psum(v, AXIS)


def _smooth_sharded(f: ShardedFineLevel, x, x_lag, b, b_lag, iters=None):
    iters = f.iters if iters is None else iters
    w = f.omega
    for _ in range(iters):
        x = _gs_sweep_sharded(f, x, x_lag, b)
        if f.has_lagrange:
            x_lag = (1.0 - w) * x_lag + w * (b_lag - _psum(jnp.vdot(f.lag_row, x)))
        x = _bound_eval_local(f, x, b)
    return x, x_lag


def _matvec_sharded(f: ShardedFineLevel, x, x_lag):
    x_ext = _frontier_exchange(f, x)
    if f.has_kernels:
        from meshlessmultigridpoisson_tpu.ops.kernels6 import spmv_tpu6

        y = spmv_tpu6(_kell_of(f), x_ext)[: f.shard_rows]
    else:
        y = jnp.sum(f.vals * jnp.take(x_ext, f.lcols_ext, axis=0), axis=-1)
    if f.has_lagrange:
        y = y + f.lag_col * x_lag
        y_lag = _psum(jnp.vdot(f.lag_row, x)) + x_lag
    else:
        y_lag = jnp.zeros((), x.dtype)
    return y, y_lag


def _residual_sharded(f: ShardedFineLevel, x, x_lag, b, b_lag):
    y, y_lag = _matvec_sharded(f, x, x_lag)
    r = jnp.where(f.dirichlet_mask > 0, 0.0, b - y)
    r_lag = (b_lag - y_lag) if f.has_lagrange else jnp.zeros((), x.dtype)
    return r, r_lag


def _rel_resid_sharded(f, x, x_lag, b, b_lag):
    r, r_lag = _residual_sharded(f, x, x_lag, b, b_lag)
    num = _psum(jnp.sum(jnp.abs(r))) + jnp.abs(r_lag)
    den = _psum(jnp.sum(jnp.abs(b))) + jnp.abs(b_lag)
    return num / den


def _zeroed_dirichlet_hier(hier: vc.Hierarchy) -> vc.Hierarchy:
    """Pin the sub-cycle's top level to 0 (reference "coarse" pinning)."""
    if not hier.levels:
        return hier
    top = hier.levels[-1]
    top0 = dataclasses.replace(
        top, dirichlet_values=jnp.zeros_like(top.dirichlet_values)
    )
    return vc.Hierarchy(
        levels=hier.levels[:-1] + (top0,),
        restrict=hier.restrict,
        prolong=hier.prolong,
    )


def _cycle_core(ls, irv, irc, ipv, ipc, rv, rc, pv, pc, *,
                coarse, has_coarse, xf, x_lag, bf, b_lag, homogeneous: bool):
    """One V-cycle on the unstacked per-shard level list ``ls`` (runs INSIDE
    shard_map).  ``homogeneous`` zeroes the fine Dirichlet pin so the cycle
    is a linear map (the Krylov-preconditioner form, mg/krylov.py)."""
    L = len(ls)

    def tail_solve(f, r):
        """Restrict the last sharded level's residual into the
        replicated tail, sub-cycle, return the correction."""
        bc = _psum(jnp.sum(rv * jnp.take(r, rc, axis=0), axis=-1))
        opc = coarse.levels[-1]
        bc = sm.zero_dirichlet(opc, bc)
        if f.has_lagrange:
            bc = jnp.where(opc.neumann_mask > 0, 0.0, bc)
        cstate = vc.init_state(coarse, jnp.zeros(opc.n, bc.dtype))
        cstate = cstate.replace_level(
            len(coarse.levels) - 1, b=bc, b_lag=jnp.zeros((), bc.dtype))
        cstate, _ = vc.v_cycle(coarse, cstate)
        xc = cstate.x[-1]
        return jnp.sum(pv * jnp.take(xc, pc, axis=0), axis=-1)

    def cycle_level(j, x, xl, b, bl):
        f = ls[j]
        pin = (0.0 if homogeneous else f.dirichlet_values) if j == 0 else 0.0
        x = jnp.where(f.dirichlet_mask > 0, pin, x)  # boundaryOp
        if j == L - 1 and not has_coarse:
            # coarsest is sharded: reference double-smooth
            # (multigrid.cpp:91-95); single-level runs smooth once
            x, xl = _smooth_sharded(f, x, xl, b, bl)
            if j > 0:
                x, xl = _smooth_sharded(f, x, xl, b, bl)
            return x, xl
        x, xl = _smooth_sharded(f, x, xl, b, bl)  # pre-smooth
        r, _ = _residual_sharded(f, x, xl, b, bl)
        if j == L - 1:
            corr = tail_solve(f, r)
        else:
            fc = ls[j + 1]
            bc_full = _psum(jnp.sum(
                irv[j] * jnp.take(r, irc[j], axis=0), axis=-1))
            me = lax.axis_index(AXIS)
            bc = lax.dynamic_slice(
                bc_full, (me * fc.shard_rows,), (fc.shard_rows,))
            bc = jnp.where(fc.dirichlet_mask > 0, 0.0, bc)
            if f.has_lagrange:
                bc = jnp.where(fc.neumann_mask > 0, 0.0, bc)
            xc, _ = cycle_level(
                j + 1, jnp.zeros_like(bc), jnp.zeros((), bc.dtype),
                bc, jnp.zeros((), bc.dtype))
            xc_full = lax.all_gather(xc, AXIS, tiled=True)
            corr = jnp.sum(
                ipv[j] * jnp.take(xc_full, ipc[j], axis=0), axis=-1)
        if not f.has_lagrange:
            corr = jnp.where(f.dirichlet_mask > 0, 0.0, corr)
        x = x + corr
        x, xl = _smooth_sharded(f, x, xl, b, bl)  # post-smooth
        return x, xl

    x = _bound_eval_local(ls[0], xf, bf)
    return cycle_level(0, x, x_lag, bf, b_lag)


def _unstack(lvl_arrs, irv, irc, ipv, ipc, rv, rc, pv, pc):
    """Drop the leading per-shard axis shard_map leaves on every operand."""
    ls = [jax.tree_util.tree_map(lambda a: a[0], la) for la in lvl_arrs]
    return (ls, [a[0] for a in irv], [a[0] for a in irc],
            [a[0] for a in ipv], [a[0] for a in ipc],
            rv[0], rc[0], pv[0], pc[0])


def _sharded_in_specs(shier: ShardedHierarchy):
    spec_of = lambda t: jax.tree_util.tree_map(lambda _: P(AXIS), t)
    return (
        spec_of(shier.sharded),
        spec_of(shier.inter_restrict_vals),
        spec_of(shier.inter_restrict_lcols),
        spec_of(shier.inter_prolong_vals),
        spec_of(shier.inter_prolong_cols),
        P(AXIS), P(AXIS), P(AXIS), P(AXIS),
    )


def _sharded_operands(shier: ShardedHierarchy):
    return (
        shier.sharded,
        shier.inter_restrict_vals, shier.inter_restrict_lcols,
        shier.inter_prolong_vals, shier.inter_prolong_cols,
        shier.restrict_vals, shier.restrict_lcols,
        shier.prolong_vals, shier.prolong_cols,
    )


def make_sharded_vcycle(shier: ShardedHierarchy, mesh: Mesh):
    """Returns vcycle_fn(xf, x_lag, bf, b_lag) -> (xf, x_lag, resid) with
    xf/bf sharded [P*Ns] over the mesh axis; Lagrange scalars replicated.

    The top len(shier.sharded) levels run row-sharded (each with its own
    frontier-phase exact GS); the tail runs the replicated generic engine.
    Between two sharded levels, restriction partial-products psum to a
    replicated coarse source which each shard slices, and the coarse
    solution is all_gathered for the local prolongation product.
    Coarse-level sources/solutions are internal (recomputed each cycle
    from the restriction, like the reference)."""
    coarse = _zeroed_dirichlet_hier(shier.coarse)
    has_coarse = len(coarse.levels) > 0

    def mapped(lvl_arrs, irv, irc, ipv, ipc, rv, rc, pv, pc,
               xf, x_lag, bf, b_lag):
        ops = _unstack(lvl_arrs, irv, irc, ipv, ipc, rv, rc, pv, pc)
        f0 = ops[0][0]
        resid = _rel_resid_sharded(f0, xf, x_lag, bf, b_lag)
        x, x_lag = _cycle_core(*ops, coarse=coarse, has_coarse=has_coarse,
                               xf=xf, x_lag=x_lag, bf=bf, b_lag=b_lag,
                               homogeneous=False)
        return x, x_lag, resid

    mapped_sharded = jax.shard_map(
        mapped,
        mesh=mesh,
        in_specs=_sharded_in_specs(shier) + (P(AXIS), P(), P(AXIS), P()),
        out_specs=(P(AXIS), P(), P()),
        check_vma=False,
    )

    @jax.jit
    def vcycle_fn(xf, x_lag, bf, b_lag):
        return mapped_sharded(*_sharded_operands(shier), xf, x_lag, bf, b_lag)

    return vcycle_fn


def make_sharded_solver(shier: ShardedHierarchy, mesh: Mesh, max_cycles: int = 200):
    """solve-to-tolerance loop over the sharded cycle (PPE-style,
    FractionalStepSim.cpp:139-142)."""
    cycle = make_sharded_vcycle(shier, mesh)

    @partial(jax.jit, static_argnames=())
    def solve(xf, x_lag, bf, b_lag, tol):
        def cond(c):
            xf, x_lag, i, resid = c
            return jnp.logical_and(resid >= tol, i < max_cycles)

        def body(c):
            xf, x_lag, i, _ = c
            xf, x_lag, resid = cycle(xf, x_lag, bf, b_lag)
            return xf, x_lag, i + 1, resid

        xf, x_lag, r0 = cycle(xf, x_lag, bf, b_lag)
        xf, x_lag, it, resid = lax.while_loop(
            cond, body, (xf, x_lag, jnp.ones((), jnp.int32), r0)
        )
        return xf, x_lag, it, resid

    return solve


def make_sharded_bicgstab(shier: ShardedHierarchy, mesh: Mesh,
                          max_iters: int = 100):
    """V-cycle-preconditioned BiCGStab on the sharded bordered fine system.

    The distributed production solve (mirrors mg/krylov.solve_bicgstab):
    raw V-cycling diverges on small Neumann multi-level hierarchies
    (PARITY.md deviation 5), so the sharded path needs the same Krylov
    wrapper to reach reference tolerances.  Every dot product is a
    ``psum``; the preconditioner is one homogeneous sharded V-cycle from
    zero (linear by construction); the whole loop — including the inner
    cycle — lives in ONE ``shard_map`` so frontier ppermutes and coarse
    psums compose inside ``lax.while_loop``.

    Returns solve(xf, x_lag, bf, b_lag, tol) -> (xf, x_lag, iters, resid)
    with xf/bf sharded over the mesh axis (shard_vector layout).
    """
    coarse = _zeroed_dirichlet_hier(shier.coarse)
    has_coarse = len(coarse.levels) > 0

    def mapped(lvl_arrs, irv, irc, ipv, ipc, rv, rc, pv, pc,
               xf, x_lag, bf, b_lag, tol):
        ops = _unstack(lvl_arrs, irv, irc, ipv, ipc, rv, rc, pv, pc)
        f0 = ops[0][0]

        def precond(v, vl):
            z, zl = _cycle_core(*ops, coarse=coarse, has_coarse=has_coarse,
                                xf=jnp.zeros_like(v),
                                x_lag=jnp.zeros((), v.dtype),
                                bf=v, b_lag=vl, homogeneous=True)
            return _bound_eval_local(f0, z, v), zl

        def mv(x, xl):
            y, yl = _matvec_sharded(f0, x, xl)
            y = jnp.where(f0.dirichlet_mask > 0, x, y)
            if not f0.has_lagrange:
                yl = xl  # keep the extra slot trivially consistent
            return y, yl

        def dot(u, ul, v, vl):
            return _psum(jnp.vdot(u, v)) + ul * vl

        def l1(u, ul):
            return _psum(jnp.sum(jnp.abs(u))) + jnp.abs(ul)

        # Dirichlet rows carry the equation x_d = g
        b = jnp.where(f0.dirichlet_mask > 0, f0.dirichlet_values, bf)
        bnorm = l1(b, b_lag)

        ax, axl = mv(xf, x_lag)
        r, rl = b - ax, b_lag - axl
        rhat, rhatl = r, rl
        init = dict(
            x=xf, xl=x_lag, r=r, rl=rl, p=r, pl=rl,
            rho=dot(rhat, rhatl, r, rl),
            it=jnp.zeros((), jnp.int32),
            resid=l1(r, rl) / bnorm,
        )

        def cond(c):
            return jnp.logical_and(c["resid"] >= tol, c["it"] < max_iters)

        def body(c):
            p, pl = c["p"], c["pl"]
            phat, phatl = precond(p, pl)
            v, vl = mv(phat, phatl)
            den = dot(rhat, rhatl, v, vl)
            alpha = c["rho"] / jnp.where(den == 0, 1e-300, den)
            s, sl = c["r"] - alpha * v, c["rl"] - alpha * vl
            shat, shatl = precond(s, sl)
            t, tl = mv(shat, shatl)
            tt = dot(t, tl, t, tl)
            omega = dot(t, tl, s, sl) / jnp.where(tt == 0, 1e-300, tt)
            x = c["x"] + alpha * phat + omega * shat
            xl = c["xl"] + alpha * phatl + omega * shatl
            r2, r2l = s - omega * t, sl - omega * tl
            rho2 = dot(rhat, rhatl, r2, r2l)
            beta = (rho2 / jnp.where(c["rho"] == 0, 1e-300, c["rho"])) * (
                alpha / jnp.where(omega == 0, 1e-300, omega))
            p2 = r2 + beta * (p - omega * v)
            p2l = r2l + beta * (pl - omega * vl)
            resid2 = l1(r2, r2l) / bnorm
            # breakdown: keep the previous iterate, stop via sentinel
            ok = (jnp.isfinite(resid2) & jnp.isfinite(rho2)
                  & jnp.isfinite(_psum(jnp.sum(jnp.abs(p2)))))
            sel = lambda a, bb: jnp.where(ok, a, bb)
            return dict(
                x=sel(x, c["x"]), xl=sel(xl, c["xl"]),
                r=sel(r2, c["r"]), rl=sel(r2l, c["rl"]),
                p=sel(p2, c["p"]), pl=sel(p2l, c["pl"]),
                rho=sel(rho2, c["rho"]), it=c["it"] + 1,
                resid=jnp.where(ok, resid2, -1.0),
            )

        out = lax.while_loop(cond, body, init)
        x = jnp.where(f0.dirichlet_mask > 0, f0.dirichlet_values, out["x"])
        x = _bound_eval_local(f0, x, bf)
        return x, out["xl"], out["it"], out["resid"]

    mapped_sharded = jax.shard_map(
        mapped,
        mesh=mesh,
        in_specs=_sharded_in_specs(shier) + (P(AXIS), P(), P(AXIS), P(), P()),
        out_specs=(P(AXIS), P(), P(), P()),
        check_vma=False,
    )

    @jax.jit
    def solve(xf, x_lag, bf, b_lag, tol):
        return mapped_sharded(*_sharded_operands(shier),
                              xf, x_lag, bf, b_lag, jnp.asarray(tol))

    return solve


def shard_vector(shier: ShardedHierarchy, mesh: Mesh, v_logical: np.ndarray):
    """Scatter a logical fine vector to the sharded padded layout."""
    op = shier.fine_op_cpu
    v = np.zeros(shier.fine.n_pad2)
    v[shier.newpos[np.asarray(op.row_map)]] = np.asarray(v_logical)
    return jax.device_put(
        jnp.asarray(v), NamedSharding(mesh, P(AXIS))
    )


def unshard_vector(shier: ShardedHierarchy, v_sharded) -> np.ndarray:
    """Gather back to logical order."""
    op = shier.fine_op_cpu
    full = np.asarray(v_sharded)
    return full[shier.newpos[np.asarray(op.row_map)]]
