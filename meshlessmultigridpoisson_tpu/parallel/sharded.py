"""shard_map solve path: halo-exchanged fine level + replicated coarse cycle.

One `shard_map` closure contains the WHOLE V-cycle: the fine level runs
row-sharded (halo exchange via two edge `ppermute`s per sweep, in-shard
exact (block, class) GS, Lagrange/norm reductions via `psum`); the coarse
hierarchy is replicated and reuses the generic engine (mg/vcycle.py)
verbatim inside the mapped function.  Restriction is a per-shard partial
product psum-reduced; prolongation is purely local.

Structural deviations from the serial cycle (documented): the replicated
sub-cycle recomputes its own entry residual, and level L-2's Dirichlet
values are pinned to 0 (the partitioner hands the sub-hierarchy zeroed pin
values), matching the reference's "coarse" pinning.
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


def _halo_exchange(x: jnp.ndarray, h: int, p: int) -> jnp.ndarray:
    """x [Ns] -> x_ext [Ns + 2h]; out-of-domain halo entries are zeros.

    Production shards have h << Ns (one hop); tiny test meshes may need the
    window context of several neighbor shards, so the exchange generalizes
    to ceil(h/Ns) hops.
    """
    ns = x.shape[0]
    hops = min(-(-h // ns), p - 1) if ns else 0
    lefts, rights = [], []
    for d in range(1, hops + 1):
        lefts.append(lax.ppermute(x, AXIS, [(i, i + d) for i in range(p - d)]))
        rights.append(lax.ppermute(x, AXIS, [(i + d, i) for i in range(p - d)]))
    zero_pad = jnp.zeros(max(h - hops * ns, 0), x.dtype)
    left_ctx = jnp.concatenate([zero_pad] + lefts[::-1]) if lefts else zero_pad
    right_ctx = jnp.concatenate(rights + [zero_pad]) if rights else zero_pad
    return jnp.concatenate([left_ctx[-h:] if h else left_ctx, x,
                            right_ctx[:h]])


def _local_sweep(f: ShardedFineLevel, x_ext, x_lag, b):
    """In-shard exact (block, class) GS sweep against frozen halos."""
    s = f.class_size
    ns = f.shard_rows
    h = f.halo
    w = f.width
    ntiles = ns // s
    vals_t = f.vals.reshape(ntiles, s, w)
    lcols_t = f.lcols_ext.reshape(ntiles, s, w)
    diag_t = f.diag.reshape(ntiles, s)
    b_t = b.reshape(ntiles, s)
    m_t = f.smooth_mask.reshape(ntiles, s)
    w_t = f.omega_w.reshape(ntiles, s)
    lagc_t = f.lag_col.reshape(ntiles, s)

    def step(x_ext, args):
        vals, lc, d, bb, m, ww, lagc, t = args
        pos0 = h + t * s
        xt = lax.dynamic_slice(x_ext, (pos0,), (s,))
        y = jnp.sum(vals * jnp.take(x_ext, lc, axis=0), axis=1) + lagc * x_lag
        xi = (1.0 - ww) * xt + (ww / d) * (bb - (y - d * xt))
        x_ext = lax.dynamic_update_slice(x_ext, jnp.where(m > 0, xi, xt), (pos0,))
        return x_ext, None

    tids = jnp.arange(ntiles, dtype=jnp.int32)
    x_ext, _ = lax.scan(
        step, x_ext, (vals_t, lcols_t, diag_t, b_t, m_t, w_t, lagc_t, tids)
    )
    return x_ext


def _bound_eval_local(f: ShardedFineLevel, x, b):
    """Neumann row-solve on locally owned boundary rows."""
    x_ext = _halo_exchange(x, f.halo, f.num_shards)
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
        x_ext = _halo_exchange(x, f.halo, f.num_shards)
        x_ext = _local_sweep(f, x_ext, x_lag, b)
        x = lax.dynamic_slice(x_ext, (f.halo,), (f.shard_rows,))
        if f.has_lagrange:
            x_lag = (1.0 - w) * x_lag + w * (b_lag - _psum(jnp.vdot(f.lag_row, x)))
        x = _bound_eval_local(f, x, b)
    return x, x_lag


def _matvec_sharded(f: ShardedFineLevel, x, x_lag):
    x_ext = _halo_exchange(x, f.halo, f.num_shards)
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


def make_sharded_vcycle(shier: ShardedHierarchy, mesh: Mesh):
    """Returns (vcycle_fn, state_sharding helpers).

    ``vcycle_fn(xf, x_lag, bf, b_lag) -> (xf, x_lag, resid)`` with
    xf/bf sharded [P*Ns] over the mesh axis; Lagrange scalars replicated.
    Coarse-level sources/solutions are internal (recomputed each cycle from
    the restriction, like the reference).
    """
    fine = shier.fine
    p, ns, h = fine.num_shards, fine.shard_rows, fine.halo
    coarse = _zeroed_dirichlet_hier(shier.coarse)
    has_coarse = len(coarse.levels) > 0

    def mapped(fine_arrs, rv, rc, pv, pc, xf, x_lag, bf, b_lag):
        f = jax.tree_util.tree_map(lambda a: a[0], fine_arrs)
        x = xf
        b = bf
        resid = _rel_resid_sharded(f, x, x_lag, b, b_lag)
        x = _bound_eval_local(f, x, b)

        if not has_coarse:
            x, x_lag = _smooth_sharded(f, x, x_lag, b, b_lag)
            return x, x_lag, resid

        # fine pre-smooth + restrict (multigrid.cpp:71-88)
        x = jnp.where(
            f.dirichlet_mask > 0, f.dirichlet_values, x
        )  # boundaryOp("fine")
        x, x_lag = _smooth_sharded(f, x, x_lag, b, b_lag)
        r, _ = _residual_sharded(f, x, x_lag, b, b_lag)
        bc = _psum(jnp.sum(rv[0] * jnp.take(r, rc[0], axis=0), axis=-1))
        opc = coarse.levels[-1]
        bc = sm.zero_dirichlet(opc, bc)
        blc = jnp.zeros((), bc.dtype)
        if f.has_lagrange:
            bc = jnp.where(opc.neumann_mask > 0, 0.0, bc)

        # replicated coarse sub-cycle, zero initial guess
        cstate = vc.init_state(coarse, jnp.zeros(opc.n, bc.dtype))
        cstate = cstate.replace_level(len(coarse.levels) - 1, b=bc, b_lag=blc)
        cstate, _ = vc.v_cycle(coarse, cstate)
        xc = cstate.x[-1]

        # prolong + fine post-smooth (multigrid.cpp:98-109)
        corr = jnp.sum(pv[0] * jnp.take(xc, pc[0], axis=0), axis=-1)
        if not f.has_lagrange:
            corr = jnp.where(f.dirichlet_mask > 0, 0.0, corr)
        x = x + corr
        x, x_lag = _smooth_sharded(f, x, x_lag, b, b_lag)
        return x, x_lag, resid

    fine_specs = jax.tree_util.tree_map(lambda _: P(AXIS), fine)
    mapped_sharded = jax.shard_map(
        mapped,
        mesh=mesh,
        in_specs=(
            fine_specs,
            P(AXIS), P(AXIS), P(AXIS), P(AXIS),
            P(AXIS), P(), P(AXIS), P(),
        ),
        out_specs=(P(AXIS), P(), P()),
        check_vma=False,
    )

    @jax.jit
    def vcycle_fn(xf, x_lag, bf, b_lag):
        return mapped_sharded(
            fine,
            shier.restrict_vals, shier.restrict_lcols,
            shier.prolong_vals, shier.prolong_cols,
            xf, x_lag, bf, b_lag,
        )

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


def shard_vector(shier: ShardedHierarchy, mesh: Mesh, v_logical: np.ndarray):
    """Scatter a logical fine vector to the sharded padded layout."""
    op = shier.fine_op_cpu
    v = np.zeros(shier.fine.n_pad2)
    v[np.asarray(op.row_map)] = np.asarray(v_logical)
    return jax.device_put(
        jnp.asarray(v), NamedSharding(mesh, P(AXIS))
    )


def unshard_vector(shier: ShardedHierarchy, v_sharded) -> np.ndarray:
    """Gather back to logical order."""
    op = shier.fine_op_cpu
    full = np.asarray(v_sharded)
    return full[np.asarray(op.row_map)]
