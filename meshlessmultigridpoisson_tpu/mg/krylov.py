"""Krylov-accelerated multigrid: V-cycle-preconditioned BiCGStab.

The reference iterates raw V-cycles to tolerance (FractionalStepSim.cpp:
139-142) and can stall or diverge when the coarse correction is weak (its
coarsest solve is just 10 SOR sweeps, multigrid.cpp:91-95; two-grid spectral
radii > 1 were measured on its small Neumann configs).  Wrapping the cycle
as a preconditioner inside BiCGStab makes the solve robust on exactly those
configs while costing ~2 cycles + a few SpMVs per iteration — this is the
production solve path; `solve_to_tolerance` remains the reference-parity
path.

System solved: the full bordered fine-level system in defect form,
  rows:    Dirichlet -> identity;  others -> A x + lag_col * x_lag
  border:  lag_row . x + x_lag
with the preconditioner = one V-cycle from a zero guess on homogeneous
boundary data (linear by construction).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from meshlessmultigridpoisson_tpu.mg.vcycle import Hierarchy, MGState, v_cycle
from meshlessmultigridpoisson_tpu.ops import smoothers as sm


def _homogeneous_hier(hier: Hierarchy) -> Hierarchy:
    """Zero the fine Dirichlet pin values so the V-cycle is a linear map."""
    fine = hier.levels[-1]
    fine0 = dataclasses.replace(
        fine, dirichlet_values=jnp.zeros_like(fine.dirichlet_values)
    )
    return Hierarchy(
        levels=hier.levels[:-1] + (fine0,),
        restrict=hier.restrict,
        prolong=hier.prolong,
    )


def _full_matvec(op, x, x_lag):
    y, y_lag = sm.matvec(op, x, x_lag)
    y = jnp.where(op.dirichlet_mask > 0, x, y)
    if not op.has_lagrange:
        y_lag = x_lag  # keep the extra slot trivially consistent
    return y, y_lag


def _precond(hier0: Hierarchy, v, v_lag):
    """z ~ A^-1 v via one V-cycle from zero (linear in v)."""
    fine_i = len(hier0.levels) - 1
    state = MGState(
        x=tuple(jnp.zeros(op.n_pad, v.dtype) for op in hier0.levels),
        x_lag=tuple(jnp.zeros((), v.dtype) for _ in hier0.levels),
        b=tuple(
            v if i == fine_i else jnp.zeros(op.n_pad, v.dtype)
            for i, op in enumerate(hier0.levels)
        ),
        b_lag=tuple(
            v_lag if i == fine_i else jnp.zeros((), v.dtype)
            for i, _ in enumerate(hier0.levels)
        ),
    )
    state, _ = v_cycle(hier0, state)
    op = hier0.levels[fine_i]
    x = sm.bound_eval_neumann(op, state.x[fine_i], state.b[fine_i])
    return x, state.x_lag[fine_i]


@partial(jax.jit, static_argnames=("max_iters", "matvec"))
def solve_bicgstab(
    hier: Hierarchy,
    state: MGState,
    tol,
    max_iters: int = 100,
    matvec=None,
):
    """Preconditioned BiCGStab on the bordered fine system.

    Starts from ``state`` (x as initial guess, b as RHS); returns
    (state with solution, iterations, relative residual).  The tolerance is
    on ||r||_1 / ||b||_1 like the reference (multigrid.cpp:112-115).

    ``matvec(x, x_lag) -> (y, y_lag)`` optionally replaces the fine-level
    operator in the OUTER Krylov system while ``hier`` stays the
    preconditioner — e.g. the matrix-free compatible-projection PPE
    (models/fracstep) solves div o grad with a standard-Laplacian V-cycle
    preconditioner.
    """
    hier0 = _homogeneous_hier(hier)
    fine_i = len(hier.levels) - 1
    op = hier.levels[fine_i]
    b = state.b[fine_i]
    b_lag = state.b_lag[fine_i]
    # Dirichlet rows: equation x_d = g
    b = jnp.where(op.dirichlet_mask > 0, op.dirichlet_values, b)
    bnorm = jnp.sum(jnp.abs(b)) + jnp.abs(b_lag)

    x0 = state.x[fine_i]
    xl0 = state.x_lag[fine_i]

    def mv(p, pl):
        if matvec is not None:
            return matvec(p, pl)
        return _full_matvec(op, p, pl)

    ax, axl = mv(x0, xl0)
    r = b - ax
    rl = b_lag - axl
    rhat, rhatl = r, rl

    def dot(u, ul, v, vl):
        return jnp.vdot(u, v) + ul * vl

    def l1(u, ul):
        return jnp.sum(jnp.abs(u)) + jnp.abs(ul)

    init = dict(
        x=x0, xl=xl0, r=r, rl=rl, p=r, pl=rl,
        rho=dot(rhat, rhatl, r, rl),
        it=jnp.zeros((), jnp.int32),
        resid=l1(r, rl) / bnorm,
    )

    def cond(c):
        return jnp.logical_and(c["resid"] >= tol, c["it"] < max_iters)

    def body(c):
        p, pl = c["p"], c["pl"]
        phat, phatl = _precond(hier0, p, pl)
        v, vl = mv(phat, phatl)
        alpha = c["rho"] / jnp.where(dot(rhat, rhatl, v, vl) == 0, 1e-300,
                                     dot(rhat, rhatl, v, vl))
        s = c["r"] - alpha * v
        sl = c["rl"] - alpha * vl
        shat, shatl = _precond(hier0, s, sl)
        t, tl = mv(shat, shatl)
        tt = dot(t, tl, t, tl)
        omega = dot(t, tl, s, sl) / jnp.where(tt == 0, 1e-300, tt)
        x = c["x"] + alpha * phat + omega * shat
        xl = c["xl"] + alpha * phatl + omega * shatl
        r2 = s - omega * t
        r2l = sl - omega * tl
        rho2 = dot(rhat, rhatl, r2, r2l)
        beta = (rho2 / jnp.where(c["rho"] == 0, 1e-300, c["rho"])) * (
            alpha / jnp.where(omega == 0, 1e-300, omega)
        )
        p2 = r2 + beta * (p - omega * v)
        p2l = r2l + beta * (pl - omega * vl)
        resid2 = l1(r2, r2l) / bnorm
        # BiCGStab breakdown (common when starting from a near-converged
        # guess: rho/omega underflow): keep the previous iterate and stop by
        # reporting a negative residual sentinel clamped at the old value.
        ok = (
            jnp.isfinite(resid2)
            & jnp.isfinite(rho2)
            & jnp.isfinite(jnp.sum(jnp.abs(p2)))
        )
        sel = lambda a, b: jnp.where(ok, a, b)
        return dict(
            x=sel(x, c["x"]), xl=sel(xl, c["xl"]),
            r=sel(r2, c["r"]), rl=sel(r2l, c["rl"]),
            p=sel(p2, c["p"]), pl=sel(p2l, c["pl"]),
            rho=sel(rho2, c["rho"]),
            it=c["it"] + 1,
            resid=jnp.where(ok, resid2, -1.0),
        )

    out = jax.lax.while_loop(cond, body, init)
    x = jnp.where(op.dirichlet_mask > 0, op.dirichlet_values, out["x"])
    x = sm.bound_eval_neumann(op, x, state.b[fine_i])
    new_state = state.replace_level(fine_i, x=x, x_lag=out["xl"])
    return new_state, out["it"], out["resid"]


@partial(jax.jit, static_argnames=("matvec", "max_iters"))
def bicgstab_matfree(matvec, b, x0, tol, max_iters: int = 100):
    """Plain (unpreconditioned) BiCGStab for well-conditioned systems.

    Used by the semi-implicit diffusion predictor: (I - dt nu L) is strongly
    diagonally dominant, so a handful of iterations reaches 1e-12.
    """
    bnorm = jnp.linalg.norm(b)

    r = b - matvec(x0)
    rhat = r
    init = dict(
        x=x0, r=r, p=r, rho=jnp.vdot(rhat, r),
        it=jnp.zeros((), jnp.int32),
        resid=jnp.linalg.norm(r) / jnp.where(bnorm == 0, 1.0, bnorm),
    )

    def cond(c):
        return jnp.logical_and(c["resid"] >= tol, c["it"] < max_iters)

    def body(c):
        v = matvec(c["p"])
        denom = jnp.vdot(rhat, v)
        alpha = c["rho"] / jnp.where(denom == 0, 1e-300, denom)
        s = c["r"] - alpha * v
        t = matvec(s)
        tt = jnp.vdot(t, t)
        om = jnp.vdot(t, s) / jnp.where(tt == 0, 1e-300, tt)
        x = c["x"] + alpha * c["p"] + om * s
        r2 = s - om * t
        rho2 = jnp.vdot(rhat, r2)
        beta = (rho2 / jnp.where(c["rho"] == 0, 1e-300, c["rho"])) * (
            alpha / jnp.where(om == 0, 1e-300, om)
        )
        p2 = r2 + beta * (c["p"] - om * v)
        resid2 = jnp.linalg.norm(r2) / jnp.where(bnorm == 0, 1.0, bnorm)
        ok = jnp.isfinite(resid2)
        sel = lambda a, bb: jnp.where(ok, a, bb)
        return dict(
            x=sel(x, c["x"]), r=sel(r2, c["r"]), p=sel(p2, c["p"]),
            rho=sel(rho2, c["rho"]), it=c["it"] + 1,
            resid=jnp.where(ok, resid2, -1.0),
        )

    out = jax.lax.while_loop(cond, body, init)
    return out["x"], out["it"], out["resid"]
