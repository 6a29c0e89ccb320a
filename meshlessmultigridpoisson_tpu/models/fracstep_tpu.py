"""Fractional-step Navier-Stokes on TPU: f32 Pallas kernels + f64 PPE.

The production on-device path for the reference's shipped default run
(run_frac_step_test, FractionalStepSim.cpp:201-204).  Precision split:

* predictor / corrector / PPE source: f32 on the v6 segment-ragged
  kernels (spmv_tpu6; v2 patch tables as the fallback for unsupported
  layouts) — their per-step truncation (~1e-7 relative) is orders below
  the scheme's own O(dt) error and the steady fs_residual (~1e-4);
* the PPE solve — the reference's 1e-10 relative-L1 bar
  (FractionalStepSim.cpp:139,202) — runs through mg/mixed.solve_mixed:
  exact f64 outer residuals on the matrix-free compatible div∘grad
  operator (XLA-emulated f64 gathers) with the f32 TpuLevel hierarchy +
  compatible-kernel matvec as the inner defect solver, warm-started from
  the previous step's pressure.

Everything per step is one jitted graph; ``run_tpu`` chunks steps through
``lax.scan`` so 2000 steps cost ~steps/chunk dispatches, not 2000.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from meshlessmultigridpoisson_tpu.config import FracStepConfig
from meshlessmultigridpoisson_tpu.mg.krylov import bicgstab_matfree
from meshlessmultigridpoisson_tpu.mg.mixed import defect_hierarchy, solve_mixed
from meshlessmultigridpoisson_tpu.mg.tpu_backend import tpu_hierarchy
from meshlessmultigridpoisson_tpu.mg.vcycle import Hierarchy
from meshlessmultigridpoisson_tpu.models.fracstep import (
    FracStepProblem,
    FracStepState,
)
from meshlessmultigridpoisson_tpu.ops.ell import spmv
from meshlessmultigridpoisson_tpu.ops.kernels import prepare_kernel_ell2, spmv_tpu2
from meshlessmultigridpoisson_tpu.ops.kernels4 import Ell4Unsupported
from meshlessmultigridpoisson_tpu.ops.kernels6 import (
    KernelEll6,
    prepare_kernel_ell6,
    spmv_tpu6,
)
from meshlessmultigridpoisson_tpu.utils.jaxutils import to_device_tree


def _prep_deriv(ell):
    """v6 segment-ragged layout when supported, else the v2 patch tables."""
    try:
        return prepare_kernel_ell6(ell)
    except Ell4Unsupported:
        return prepare_kernel_ell2(ell)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=(
        "hd", "op64", "dx32", "dy32", "lap32", "dx64", "dy64",
        "bmask", "u_bc", "v_bc", "normals",
    ),
    meta_fields=("config", "n_pad"),
)
@dataclasses.dataclass(frozen=True)
class TpuFracStep:
    """Device-resident fractional-step problem (see module docstring)."""

    hd: Hierarchy  # TpuLevel defect hierarchy (fine pins zeroed)
    op64: object  # f64 fine LevelOperator (outer PPE residuals)
    dx32: object  # KernelEll2 f32 derivative operators
    dy32: object
    lap32: object
    dx64: object  # f64 EllMatrix (outer compatible matvec)
    dy64: object
    bmask: jnp.ndarray  # [n_pad] f64
    u_bc: jnp.ndarray
    v_bc: jnp.ndarray
    normals: jnp.ndarray  # [n_pad, 2] f64
    config: FracStepConfig
    n_pad: int


def build_tpu_fracstep(prob: FracStepProblem, device=None) -> TpuFracStep:
    """Repack a CPU-built FracStepProblem for the TPU (setup stays f64 on
    the host; only kernel-ready layouts move)."""
    if not prob.compatible_ppe:
        raise NotImplementedError(
            "the TPU fractional-step path implements the compatible "
            "div∘grad PPE only; --reference-ppe (assembled-Laplacian PPE) "
            "runs on the CPU path (--platform cpu)"
        )
    if (prob.config.hyperviscosity or 0.0) > 0.0:
        raise NotImplementedError(
            "hyperviscosity is not wired into the TPU predictor; use "
            "--platform cpu"
        )
    device = device or jax.devices()[0]
    thier = tpu_hierarchy(prob.hierarchy)
    hd = defect_hierarchy(thier)
    t = TpuFracStep(
        hd=hd,
        op64=prob.hierarchy.levels[-1],
        dx32=_prep_deriv(prob.dx),
        dy32=_prep_deriv(prob.dy),
        lap32=_prep_deriv(prob.lap),
        dx64=prob.dx,
        dy64=prob.dy,
        bmask=prob.bmask,
        u_bc=prob.u_bc,
        v_bc=prob.v_bc,
        normals=prob.normals,
        config=prob.config,
        n_pad=prob.hierarchy.finest.n_pad,
    )
    return to_device_tree(t, device=device)


def _mv32(t: TpuFracStep):
    """f32 compatible PPE matvec on the kernel operators (the inner-defect
    system; mirrors fracstep.make_compatible_matvec on TpuLevel)."""
    top = t.hd.levels[-1]
    n_pad = t.n_pad

    def mv(x, xl):
        gx = _spmv32(t.dx32, x, n_pad)
        gy = _spmv32(t.dy32, x, n_pad)
        y = _spmv32(t.dx32, gx, n_pad) + _spmv32(t.dy32, gy, n_pad)
        yb = spmv_tpu2(top.bound_kell, x)[: top.bound_rows.shape[0]]
        y = y.at[top.bound_rows].set(yb, mode="drop")
        y = jnp.where(top.smooth_mask + top.neumann_mask > 0, y, x)
        y = y + top.lag_col * xl
        return y, jnp.vdot(top.lag_row, x) + xl

    return mv


def _mv64(t: TpuFracStep):
    """Exact f64 compatible matvec (XLA-emulated gathers on TPU)."""
    op = t.op64
    bound = op.bound

    def mv(x, xl):
        gx = spmv(t.dx64, x)
        gy = spmv(t.dy64, x)
        y = spmv(t.dx64, gx) + spmv(t.dy64, gy)
        yb = spmv(bound.ell, x)[: bound.rows.shape[0]]
        y = y.at[bound.rows].set(yb, mode="drop")
        y = jnp.where(op.smooth_mask + op.neumann_mask > 0, y, x)
        y = y + op.lag_col * xl
        return y, jnp.vdot(op.lag_row, x) + xl

    return mv


def _spmv32(kell, x, n_pad):
    if isinstance(kell, KernelEll6):
        return spmv_tpu6(kell, x)[:n_pad]
    return spmv_tpu2(kell, x)[:n_pad]


def _predictor32(t: TpuFracStep, u, v):
    """f32 advection-diffusion predictor on the Pallas kernels."""
    c = t.config
    nu = jnp.float32(c.mu / c.rho)
    dt = jnp.float32(c.dt)
    n_pad = t.n_pad
    u32, v32 = u.astype(jnp.float32), v.astype(jnp.float32)
    u_x, u_y = _spmv32(t.dx32, u32, n_pad), _spmv32(t.dy32, u32, n_pad)
    v_x, v_y = _spmv32(t.dx32, v32, n_pad), _spmv32(t.dy32, v32, n_pad)
    adv_u = -(u32 * u_x + v32 * u_y)
    adv_v = -(u32 * v_x + v32 * v_y)

    if c.diffusion == "implicit":
        def helmholtz(w):
            return w - dt * nu * _spmv32(t.lap32, w, n_pad)

        # f32 floor ~1e-7 relative: orders below the scheme's O(dt) error
        u_hat, _, _ = bicgstab_matfree(
            helmholtz, u32 + dt * adv_u, u32, tol=1e-6, max_iters=60
        )
        v_hat, _, _ = bicgstab_matfree(
            helmholtz, v32 + dt * adv_v, v32, tol=1e-6, max_iters=60
        )
    else:
        lap_u = _spmv32(t.lap32, u32, n_pad)
        lap_v = _spmv32(t.lap32, v32, n_pad)
        u_hat = u32 + dt * (adv_u + nu * lap_u)
        v_hat = v32 + dt * (adv_v + nu * lap_v)
    return u_hat.astype(jnp.float64), v_hat.astype(jnp.float64)


@partial(jax.jit, static_argnames=("config",))
def timestep_tpu(t: TpuFracStep, state: FracStepState, *,
                 config: FracStepConfig):
    """One fractional step on the TPU (semantics of fracstep._timestep_impl
    in compatible-PPE mode; reference loop FractionalStepSim.cpp:130-156)."""
    c = config
    fine_i = len(t.hd.levels) - 1

    def bound(u, v):
        return (jnp.where(t.bmask > 0, t.u_bc, u),
                jnp.where(t.bmask > 0, t.v_bc, v))

    u, v = bound(state.u, state.v)
    u_old, v_old = u, v
    u_hat, v_hat = _predictor32(t, u, v)

    # PPE source (f32 divergence, f64 assembly)
    div = (_spmv32(t.dx32, u_hat.astype(jnp.float32), t.n_pad)
           + _spmv32(t.dy32, v_hat.astype(jnp.float32), t.n_pad))
    b = (c.rho / c.dt) * div.astype(jnp.float64)
    dpdx = -(c.rho / c.dt) * (u - u_hat)
    dpdy = -(c.rho / c.dt) * (v - v_hat)
    bnd = t.normals[:, 0] * dpdx + t.normals[:, 1] * dpdy
    b = jnp.where(t.bmask > 0, bnd, b)

    # PPE to reference tolerance: f64 defect outer + f32 kernel inner,
    # warm-started from the previous pressure
    p_old = state.mg.x[fine_i]
    p, pl, _, _ = solve_mixed(
        t.op64, t.hd,
        p_old.astype(jnp.float64), state.mg.x_lag[fine_i].astype(jnp.float64),
        b, jnp.zeros((), jnp.float64),
        tol=c.ppe_tol, matvec64=_mv64(t), matvec32=_mv32(t),
    )
    p = c.p_relax * p + (1.0 - c.p_relax) * p_old
    mg = state.mg.replace_level(fine_i, x=p, x_lag=pl, b=b)

    # corrector (f32 gradients)
    p32 = p.astype(jnp.float32)
    u = u_hat - (c.dt / c.rho) * _spmv32(t.dx32, p32, t.n_pad).astype(jnp.float64)
    v = v_hat - (c.dt / c.rho) * _spmv32(t.dy32, p32, t.n_pad).astype(jnp.float64)
    u, v = bound(u, v)
    res = jnp.sum(jnp.abs(u - u_hat)) / t.op64.n
    return FracStepState(u=u, v=v, u_old=u_old, v_old=v_old,
                         u_hat=u_hat, v_hat=v_hat, mg=mg), res


@partial(jax.jit, static_argnames=("config", "chunk"))
def _run_chunk(t: TpuFracStep, state: FracStepState, *,
               config: FracStepConfig, chunk: int):
    def body(s, _):
        s, res = timestep_tpu(t, s, config=config)
        return s, res

    return jax.lax.scan(body, state, None, length=chunk)


def run_tpu(prob: FracStepProblem, steps: int | None = None,
            chunk: int = 50, log=None):
    """Time loop on the TPU; same contract as fracstep.run.

    Returns (final state, fs_residual history, u L1 error vs Kovasznay).
    """
    from meshlessmultigridpoisson_tpu.models.fracstep import (
        u_error_vs_kovasznay,
    )

    steps = prob.config.max_steps if steps is None else steps
    t = build_tpu_fracstep(prob)
    dev = jax.devices()[0]
    state = to_device_tree(prob.state0, device=dev)
    hist = []
    done = 0
    while done < steps:
        n = min(chunk, steps - done)
        state, res = _run_chunk(t, state, config=prob.config, chunk=n)
        hist.extend(np.asarray(res).tolist())
        done += n
        if log is not None:
            log(f"step {done}/{steps} fs_residual={hist[-1]:.3e}")
    # host copy for the epilogue (prob's operators live on the CPU)
    state = to_device_tree(state, device=jax.devices("cpu")[0])
    err = u_error_vs_kovasznay(prob, state)
    return state, np.asarray(hist), err
