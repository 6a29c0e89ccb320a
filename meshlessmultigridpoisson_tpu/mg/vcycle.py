"""The generic multigrid V-cycle engine (jit-compiled, trace-time unrolled).

ONE engine replaces both reference copies (Multigrid, multigrid.cpp:62-110,
and its ~95% duplicate FractionalStepMultigrid, FracStepMultigrid.cpp:61-117;
behavioral diffs are flags here).  Levels are a static tuple ordered
coarse -> fine (the reference sorts grids by point count ascending,
multigrid.cpp:116-122); the level loop unrolls at trace time so XLA sees a
fixed pipeline of masked sweeps, windowed SpMVs and transfer SpMMs.

Reference semantics preserved per step (multigrid.cpp:62-110):
  * per cycle, the finest relative L1 residual is computed and recorded
    BEFORE any smoothing (:66-69), then the fine Neumann rows re-solved;
  * descend: coarse values zeroed, Dirichlet pinned (g on fine, 0 coarse),
    pre-smooth, restrict the Dirichlet-zeroed residual, zero restricted
    source at coarse Dirichlet points, zero Neumann slots + border slot of
    the coarse source (:71-88);
  * coarsest: zero guess, TWO smoother calls (:91-95);
  * ascend: prolong coarse values, zero correction at Dirichlet points
    (non-Neumann grids only, :103-105), add, post-smooth (:98-109).
  * single-level fallback: just smooth (FracStepMultigrid.cpp:64-67).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from meshlessmultigridpoisson_tpu.ops.ell import EllMatrix, spmv
from meshlessmultigridpoisson_tpu.ops import smoothers as sm
from meshlessmultigridpoisson_tpu.stencil.operators import LevelOperator


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("levels", "restrict", "prolong"),
    meta_fields=(),
)
@dataclasses.dataclass(frozen=True)
class Hierarchy:
    """Static multigrid data: levels coarse->fine plus transfer operators.

    ``restrict[i]`` maps a level-(i+1) residual to the level-i source;
    ``prolong[i]`` maps level-i values to a level-(i+1) correction — the
    reference's restrictionMatrices_/prolongMatrices_ (multigrid.cpp:35-48).
    """

    levels: tuple[LevelOperator, ...]
    restrict: tuple[EllMatrix, ...]  # len L-1
    prolong: tuple[EllMatrix, ...]  # len L-1

    @property
    def num_levels(self) -> int:
        return len(self.levels)

    @property
    def finest(self) -> LevelOperator:
        return self.levels[-1]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("x", "x_lag", "b", "b_lag"),
    meta_fields=(),
)
@dataclasses.dataclass(frozen=True)
class MGState:
    """Per-level solution/source vectors (each padded to its level's n_pad)."""

    x: tuple[jnp.ndarray, ...]
    x_lag: tuple[jnp.ndarray, ...]
    b: tuple[jnp.ndarray, ...]
    b_lag: tuple[jnp.ndarray, ...]

    def replace_level(self, i: int, **kw) -> "MGState":
        def upd(field, name):
            if name in kw:
                lst = list(field)
                lst[i] = kw[name]
                return tuple(lst)
            return field

        return MGState(
            x=upd(self.x, "x"),
            x_lag=upd(self.x_lag, "x_lag"),
            b=upd(self.b, "b"),
            b_lag=upd(self.b_lag, "b_lag"),
        )


def init_state(hier: Hierarchy, b_fine_logical: jnp.ndarray, dtype=None) -> MGState:
    """Zero solution; fine source = b (scattered to permuted padded rows)."""
    xs, xl, bs, bl = [], [], [], []
    for i, op in enumerate(hier.levels):
        dt = dtype or op.A.vals.dtype
        xs.append(jnp.zeros(op.n_pad, dt))
        xl.append(jnp.zeros((), dt))
        if i == hier.num_levels - 1:
            bs.append(op.to_padded(b_fine_logical.astype(dt)))
        else:
            bs.append(jnp.zeros(op.n_pad, dt))
        bl.append(jnp.zeros((), dt))
    return MGState(x=tuple(xs), x_lag=tuple(xl), b=tuple(bs), b_lag=tuple(bl))


def init_like(hier: Hierarchy, dtype=None) -> MGState:
    """All-zero state (solution AND source) shaped for ``hier``."""
    dts = [dtype or op.smooth_mask.dtype for op in hier.levels]
    return MGState(
        x=tuple(jnp.zeros(op.n_pad, dt) for op, dt in zip(hier.levels, dts)),
        x_lag=tuple(jnp.zeros((), dt) for dt in dts),
        b=tuple(jnp.zeros(op.n_pad, dt) for op, dt in zip(hier.levels, dts)),
        b_lag=tuple(jnp.zeros((), dt) for dt in dts),
    )


def mg_residual(hier: Hierarchy, state: MGState):
    """Finest-grid relative L1 residual (multigrid.cpp:112-115)."""
    L = hier.num_levels - 1
    return sm.relative_residual_l1(
        hier.levels[L], state.x[L], state.x_lag[L], state.b[L], state.b_lag[L]
    )


def v_cycle(hier: Hierarchy, state: MGState) -> tuple[MGState, jnp.ndarray]:
    """One V-cycle; returns (new_state, pre-cycle finest relative residual)."""
    L = hier.num_levels
    fine = L - 1
    resid = mg_residual(hier, state)

    if L == 1:
        # single-grid fallback (FracStepMultigrid.cpp:64-67)
        op = hier.levels[0]
        x, xl = sm.smooth(op, state.x[0], state.x_lag[0], state.b[0], state.b_lag[0])
        return state.replace_level(0, x=x, x_lag=xl), resid

    op_f = hier.levels[fine]
    xf = sm.bound_eval_neumann(op_f, state.x[fine], state.b[fine])
    state = state.replace_level(fine, x=xf)

    # ---- descend ----
    for i in range(fine, 0, -1):
        op = hier.levels[i]
        x, xl, b, bl = state.x[i], state.x_lag[i], state.b[i], state.b_lag[i]
        if i != fine:
            x = jnp.zeros_like(x)
            xl = jnp.zeros_like(xl)
        x = sm.apply_dirichlet(op, x, coarse=(i != fine))
        x, xl = sm.smooth(op, x, xl, b, bl)
        r, _ = sm.residual(op, x, xl, b, bl)

        opc = hier.levels[i - 1]
        # R rows/cols live in the levels' permuted padded spaces (mg.cpp:81)
        bc = spmv(hier.restrict[i - 1], r)
        bc = sm.zero_dirichlet(opc, bc)
        blc = state.b_lag[i - 1]
        if op.has_lagrange:
            blc = jnp.zeros_like(blc)
            bc = jnp.where(opc.neumann_mask > 0, 0.0, bc)
        state = state.replace_level(i, x=x, x_lag=xl)
        state = state.replace_level(i - 1, b=bc, b_lag=blc)

    # ---- coarsest: zero guess, double smooth (multigrid.cpp:91-95) ----
    op0 = hier.levels[0]
    x0 = jnp.zeros(op0.n_pad, state.x[0].dtype)
    xl0 = jnp.zeros_like(state.x_lag[0])
    x0, xl0 = sm.smooth(op0, x0, xl0, state.b[0], state.b_lag[0])
    x0, xl0 = sm.smooth(op0, x0, xl0, state.b[0], state.b_lag[0])
    state = state.replace_level(0, x=x0, x_lag=xl0)

    # ---- ascend ----
    for i in range(1, L):
        op = hier.levels[i]
        corr = spmv(hier.prolong[i - 1], state.x[i - 1])
        if not op.has_lagrange:
            corr = sm.zero_dirichlet(op, corr)
        x = state.x[i] + corr
        x, xl = sm.smooth(op, x, state.x_lag[i], state.b[i], state.b_lag[i])
        state = state.replace_level(i, x=x, x_lag=xl)

    return state, resid


@partial(jax.jit, static_argnames=("num_cycles",))
def run_v_cycles(hier: Hierarchy, state: MGState, num_cycles: int):
    """Fixed cycle count (run_mg_sim's loop, testing_functions.cpp:341-344).

    Returns (state, residual_history [num_cycles]) — the per-cycle pre-smooth
    residuals the reference records (multigrid.cpp:66-69).
    """

    def body(state, _):
        state, resid = v_cycle(hier, state)
        return state, resid

    state, hist = jax.lax.scan(body, state, None, length=num_cycles)
    return state, hist


@partial(jax.jit, static_argnames=("max_cycles",))
def solve_to_tolerance(hier: Hierarchy, state: MGState, tol, max_cycles: int = 200):
    """Cycle until the finest relative residual < tol (the PPE loop,
    FractionalStepSim.cpp:139-142), with fine Neumann rows re-solved after
    each cycle (:141).  Returns (state, cycles_used, final_residual)."""

    def cond(carry):
        state, i, resid = carry
        return jnp.logical_and(resid >= tol, i < max_cycles)

    def body(carry):
        state, i, _ = carry
        state, _ = v_cycle(hier, state)
        fine = len(hier.levels) - 1
        op = hier.levels[fine]
        xf = sm.bound_eval_neumann(op, state.x[fine], state.b[fine])
        state = state.replace_level(fine, x=xf)
        resid = mg_residual(hier, state)
        return state, i + 1, resid

    resid0 = mg_residual(hier, state)
    state, cycles, resid = jax.lax.while_loop(
        cond, body, (state, jnp.zeros((), jnp.int32), resid0)
    )
    return state, cycles, resid
