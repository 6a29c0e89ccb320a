"""Fractional-step incompressible Navier-Stokes with Kovasznay validation.

TPU-native redesign of FractionalStepGrid / FractionalStepSim
(fractionalStepGrid.cpp, FractionalStepSim.cpp): the velocity state is a
small pytree of padded vectors on the finest level; the predictor/corrector
are a few windowed-ELL SpMVs + pointwise ops inside ONE jitted timestep; the
pressure-Poisson solve reuses the generic multigrid engine with fixed
sparsity across all timesteps.

Reference semantics per timestep (run_fracstep_param, FractionalStepSim.cpp:
130-156):
  set_uv_bound -> u_hat = u + dt(-(u u_x + v u_y) + (mu/rho) lap u) (:101-124)
  -> PPE source: interior rho/dt (dx u_hat + dy v_hat), boundary
     n.(-rho/dt)(u - u_hat, v - v_hat) (:125-145), RHS pushdown (:137)
  -> solve PPE to tol (while residual >= tol: vCycle, :139-142)
  -> u = u_hat - dt/rho dx p ; v = v_hat - dt/rho dy p (:146-151)
  -> set_uv_bound; fs_residual = ||u - u_hat||_1 / N (:152-154)

Kovasznay exact solution (Re = rho/mu, lambda = Re/2 - sqrt(Re^2/4 + 4pi^2),
fractionalStepGrid.cpp:26-59):
  u = 1 - e^(lambda x) cos(2 pi y)
  v = lambda/(2 pi) e^(lambda x) sin(2 pi y)
  p = 0.5 e^(2 lambda x)
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from meshlessmultigridpoisson_tpu.config import (
    FracStepConfig,
    MultigridConfig,
    REFERENCE_MG_SIZES,
)
from meshlessmultigridpoisson_tpu.geometry.pointclouds import PointCloud, make_cloud
from meshlessmultigridpoisson_tpu.mg.setup import build_hierarchy
from meshlessmultigridpoisson_tpu.mg.vcycle import (
    Hierarchy,
    MGState,
    init_state,
    solve_to_tolerance,
)
from meshlessmultigridpoisson_tpu.mg.krylov import solve_bicgstab
from meshlessmultigridpoisson_tpu.ops.ell import EllMatrix, ell_from_csr, spmv
from meshlessmultigridpoisson_tpu.ops import smoothers as sm
from meshlessmultigridpoisson_tpu.stencil.operators import (
    assemble_operator_csr,
    bc_flags_from_cloud,
)

PI = np.pi


def kovasznay_lambda(re: float) -> float:
    return 0.5 * re - np.sqrt(0.25 * re * re + 4 * PI * PI)


def kovasznay_uvp(points: np.ndarray, re: float):
    lam = kovasznay_lambda(re)
    x, y = points[:, 0], points[:, 1]
    u = 1.0 - np.exp(lam * x) * np.cos(2 * PI * y)
    v = lam / (2 * PI) * np.exp(lam * x) * np.sin(2 * PI * y)
    p = 0.5 * np.exp(2 * lam * x)
    return u, v, p


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("u", "v", "u_old", "v_old", "u_hat", "v_hat", "mg"),
    meta_fields=(),
)
@dataclasses.dataclass(frozen=True)
class FracStepState:
    """Velocity fields (padded fine-level vectors) + pressure MG state."""

    u: jnp.ndarray
    v: jnp.ndarray
    u_old: jnp.ndarray
    v_old: jnp.ndarray
    u_hat: jnp.ndarray
    v_hat: jnp.ndarray
    mg: MGState  # pressure lives in mg.x[-1]


@dataclasses.dataclass
class FracStepProblem:
    hierarchy: Hierarchy
    clouds: list[PointCloud]
    dx: EllMatrix  # fine-level d/dx, permuted row space
    dy: EllMatrix
    lap: EllMatrix  # velocity Laplacian (no BC rows)
    bmask: jnp.ndarray  # [n_pad] 1.0 at boundary points
    u_bc: jnp.ndarray  # [n_pad] Kovasznay u at boundary (0 elsewhere)
    v_bc: jnp.ndarray
    normals: jnp.ndarray  # [n_pad, 2]
    config: FracStepConfig
    state0: FracStepState
    compatible_ppe: bool = True
    lap_scale: float = 1.0  # |lam_max(lap)| estimate for hyperviscosity


def _permuted_ell(a: sp.csr_matrix, row_map: np.ndarray, n_pad: int,
                  block_rows: int) -> EllMatrix:
    perm_mat = sp.coo_matrix(
        (np.ones(row_map.size), (row_map, np.arange(row_map.size))),
        shape=(n_pad, row_map.size),
    ).tocsr()
    ap = (perm_mat @ a @ perm_mat.T).tocsr()
    ap.sum_duplicates()
    return ell_from_csr(ap, block_rows=block_rows)


def build_fracstep_problem(
    sizes: list[int] | None = None,
    num_levels: int = 4,
    poly_deg: int = 6,
    config: FracStepConfig | None = None,
    seed: int = 0,
    block_rows: int = 256,
    stabilize: bool = True,
    compatible_ppe: bool = True,
    msh_files: list[str] | None = None,
) -> FracStepProblem:
    """genFractionalStepGrid + gen_fracstep_param equivalent
    (FractionalStepSim.cpp:3-79): square clouds, Neumann pressure BCs,
    implicit condensation, fine poly_deg / coarse 3, base-degree transfers
    (FracStepMultigrid.cpp:23).

    ``compatible_ppe`` (default, a deliberate improvement over the
    reference): the OUTER PPE system is the exact discrete
    div o grad = Dx.(Dx p) + Dy.(Dy p) the corrector applies (matrix-free,
    composed from the derivative operators; Neumann rows and the Lagrange
    border as usual), solved by BiCGStab preconditioned with the STANDARD
    Laplacian V-cycle.  This drops the projection-loop gain from ~5
    (divergent; the reference's assembled-Laplacian PPE measured on our
    clouds) to ~1, while keeping the solver on the operator it is good at
    (assembled-div-grad relaxation measured rho=2.8 at deg 6 — unusable as
    a smoother).  Set False for strict reference parity.
    """
    config = config or FracStepConfig()
    if msh_files:
        # real Gmsh v2 meshes, coarse -> fine (the reference's own input
        # path for the NS runs, FractionalStepSim.cpp:190-199)
        from meshlessmultigridpoisson_tpu.geometry.msh import (
            pointcloud_from_msh,
        )

        clouds = [pointcloud_from_msh(p, geomtype="square")
                  for p in msh_files]
        sizes = [c.n for c in clouds]
    else:
        if sizes is None:
            sizes = list(REFERENCE_MG_SIZES["square"][:num_levels])
        clouds = [make_cloud("square", n, seed=seed + i)
                  for i, n in enumerate(sizes)]
    mg_config = MultigridConfig(
        num_levels=len(sizes),
        fine_poly_deg=poly_deg,
        coarse_poly_deg=3,
        transfer_poly="base",  # FracStepMultigrid.cpp:23
    )
    bc_types = ["neumann"]

    re = config.reynolds
    lam = kovasznay_lambda(re)

    def bc_fn(pts, normals, comp):
        # reference stores p values as the "bc data" (FractionalStepSim.cpp:18)
        return 0.5 * np.exp(2 * lam * pts[:, 0])

    hier, ordered = build_hierarchy(
        clouds, bc_types, bc_fn, mg_config, block_rows, stabilize=stabilize,
    )

    fine = ordered[-1]
    op_f = hier.finest
    flags = bc_flags_from_cloud(fine, ["neumann"])
    cfg_f = mg_config.level_config(len(sizes) - 1)
    rm = np.asarray(op_f.row_map)

    dx_csr = assemble_operator_csr(fine, flags, cfg_f, op="dx")
    dy_csr = assemble_operator_csr(fine, flags, cfg_f, op="dy")
    lap_csr = assemble_operator_csr(
        fine, flags, cfg_f, op="laplace", neumann_rows=False
    )
    dxe = _permuted_ell(dx_csr, rm, op_f.n_pad, block_rows)
    dye = _permuted_ell(dy_csr, rm, op_f.n_pad, block_rows)
    lape = _permuted_ell(lap_csr, rm, op_f.n_pad, block_rows)

    u_ex, v_ex, _ = kovasznay_uvp(fine.points, re)
    bmask_l = fine.boundary_mask
    bmask = op_f.to_padded(jnp.asarray(bmask_l.astype(np.float64)))
    u_bc = op_f.to_padded(jnp.asarray(np.where(bmask_l, u_ex, 0.0)))
    v_bc = op_f.to_padded(jnp.asarray(np.where(bmask_l, v_ex, 0.0)))
    normals = jnp.zeros((op_f.n_pad, 2)).at[op_f.row_map].set(
        jnp.asarray(fine.normals)
    )

    # spectral-radius estimate of the velocity Laplacian (hyperviscosity
    # normalization): a few power iterations on the host
    lam = 1.0
    if (config.hyperviscosity or 0.0) > 0.0:
        vv = jnp.asarray(np.random.default_rng(7).standard_normal(op_f.n_pad))
        for _ in range(20):
            v2 = spmv(lape, vv)
            lam = float(jnp.linalg.norm(v2) / jnp.linalg.norm(vv))
            vv = v2 / jnp.linalg.norm(v2)

    mg0 = init_state(hier, jnp.zeros(fine.n))
    zero = jnp.zeros(op_f.n_pad)
    state0 = FracStepState(
        u=zero, v=zero, u_old=zero, v_old=zero, u_hat=zero, v_hat=zero, mg=mg0
    )
    return FracStepProblem(
        hierarchy=hier,
        clouds=ordered,
        dx=dxe,
        dy=dye,
        lap=lape,
        bmask=bmask,
        u_bc=u_bc,
        v_bc=v_bc,
        normals=normals,
        config=config,
        state0=state0,
        compatible_ppe=compatible_ppe,
        lap_scale=lam,
    )


def set_uv_bound(prob: FracStepProblem, u, v):
    """Pin boundary velocities to the exact flow (fractionalStepGrid.cpp:41-59)."""
    u = jnp.where(prob.bmask > 0, prob.u_bc, u)
    v = jnp.where(prob.bmask > 0, prob.v_bc, v)
    return u, v


def predictor(prob: FracStepProblem, u, v):
    """Advection-diffusion predictor (fractionalStepGrid.cpp:101-124).

    ``diffusion="explicit"``: the reference's forward-Euler form, with
    optional hyperviscosity -hv*nu*Lap(Lap u)/|lam_max|.
    ``diffusion="implicit"``: backward-Euler viscosity — solve
    (I - dt nu Lap) u_hat = u - dt (u.grad)u with plain BiCGStab (the
    Helmholtz operator is diagonally dominant; ~10-30 iterations).
    """
    c = prob.config
    nu = c.mu / c.rho
    u_x, u_y = spmv(prob.dx, u), spmv(prob.dy, u)
    v_x, v_y = spmv(prob.dx, v), spmv(prob.dy, v)
    adv_u = -(u * u_x + v * u_y)
    adv_v = -(u * v_x + v * v_y)

    if c.diffusion == "implicit":
        from meshlessmultigridpoisson_tpu.mg.krylov import bicgstab_matfree

        def helmholtz(w):
            return w - c.dt * nu * spmv(prob.lap, w)

        u_hat, _, _ = bicgstab_matfree(
            helmholtz, u + c.dt * adv_u, u, tol=1e-12, max_iters=200
        )
        v_hat, _, _ = bicgstab_matfree(
            helmholtz, v + c.dt * adv_v, v, tol=1e-12, max_iters=200
        )
        return u_hat, v_hat

    lap_u, lap_v = spmv(prob.lap, u), spmv(prob.lap, v)
    rhs_u = adv_u + nu * lap_u
    rhs_v = adv_v + nu * lap_v
    if c.hyperviscosity > 0.0:
        g = c.hyperviscosity * nu / prob.lap_scale
        rhs_u = rhs_u - g * spmv(prob.lap, lap_u)
        rhs_v = rhs_v - g * spmv(prob.lap, lap_v)
    u_hat = u + c.dt * rhs_u
    v_hat = v + c.dt * rhs_v
    return u_hat, v_hat


def ppe_source(prob: FracStepProblem, u, v, u_hat, v_hat):
    """PPE RHS (fractionalStepGrid.cpp:125-145).

    Reference mode also applies the condensation pushdown (grid.cpp:664);
    the matrix-free compatible system keeps boundary coupling explicit so
    the raw bordered RHS is used directly.
    """
    c = prob.config
    div = spmv(prob.dx, u_hat) + spmv(prob.dy, v_hat)
    b = c.rho / c.dt * div
    dpdx = -c.rho / c.dt * (u - u_hat)
    dpdy = -c.rho / c.dt * (v - v_hat)
    bnd = prob.normals[:, 0] * dpdx + prob.normals[:, 1] * dpdy
    b = jnp.where(prob.bmask > 0, bnd, b)
    if not prob.compatible_ppe:
        b = sm.push_inhomog_to_rhs(prob.hierarchy.finest, b)
    return b


def make_compatible_matvec(prob: FracStepProblem):
    """Bordered matrix-free div o grad PPE operator.

    Interior rows: Dx.(Dx p) + Dy.(Dy p) (exactly what the corrector
    removes); Neumann rows: the standard n.grad rows; Lagrange border as
    usual.  Boundary p columns stay explicitly coupled (no condensation).
    """
    op = prob.hierarchy.finest
    bound = op.bound

    def mv(x, xl):
        gx = spmv(prob.dx, x)
        gy = spmv(prob.dy, x)
        y = spmv(prob.dx, gx) + spmv(prob.dy, gy)
        # Neumann rows from the compact n.grad set
        yb = spmv(bound.ell, x)
        safe = jnp.minimum(bound.rows, op.n_pad - 1)
        y = y.at[bound.rows].set(yb[: bound.rows.shape[0]], mode="drop")
        del safe
        # identity on padding/Dirichlet rows keeps the bordered system square
        y = jnp.where(op.smooth_mask + op.neumann_mask > 0, y, x)
        y = y + op.lag_col * xl
        ylag = jnp.vdot(op.lag_row, x) + xl
        return y, ylag

    return mv


def corrector(prob: FracStepProblem, u_hat, v_hat, p):
    """Projection step (fractionalStepGrid.cpp:146-151)."""
    c = prob.config
    u = u_hat - c.dt / c.rho * spmv(prob.dx, p)
    v = v_hat - c.dt / c.rho * spmv(prob.dy, p)
    return u, v


def fs_residual(prob: FracStepProblem, u, u_hat):
    """||u - u_hat||_1 / N (fractionalStepGrid.cpp:152-154)."""
    return jnp.sum(jnp.abs(u - u_hat)) / prob.hierarchy.finest.n


@partial(jax.jit,
         static_argnames=("config", "ppe_solver", "max_cycles", "compatible"))
def _timestep_impl(hier, dx, dy, lap, bmask, u_bc, v_bc, normals,
                   state: FracStepState, *, config: FracStepConfig,
                   ppe_solver: str, max_cycles: int, compatible: bool,
                   lap_scale: float = 1.0):
    # lightweight view of the problem for the helper functions
    prob = FracStepProblem(
        hierarchy=hier, clouds=[], dx=dx, dy=dy, lap=lap, bmask=bmask,
        u_bc=u_bc, v_bc=v_bc, normals=normals, config=config, state0=state,
        compatible_ppe=compatible, lap_scale=lap_scale,
    )
    c = config
    fine_i = len(hier.levels) - 1

    u, v = set_uv_bound(prob, state.u, state.v)
    u_old, v_old = u, v
    u_hat, v_hat = predictor(prob, u, v)
    b = ppe_source(prob, u, v, u_hat, v_hat)

    p_old = state.mg.x[fine_i]
    mg = state.mg.replace_level(fine_i, b=b, b_lag=jnp.zeros((), b.dtype))
    if prob.compatible_ppe:
        mg, _, _ = solve_bicgstab(
            hier, mg, tol=c.ppe_tol, max_iters=max_cycles,
            matvec=make_compatible_matvec(prob),
        )
    elif ppe_solver == "bicgstab":
        mg, _, _ = solve_bicgstab(hier, mg, tol=c.ppe_tol, max_iters=max_cycles)
    else:
        mg, _, _ = solve_to_tolerance(hier, mg, tol=c.ppe_tol, max_cycles=max_cycles)
    # pressure under-relaxation (see FracStepConfig.p_relax)
    p = c.p_relax * mg.x[fine_i] + (1.0 - c.p_relax) * p_old
    mg = mg.replace_level(fine_i, x=p)

    u, v = corrector(prob, u_hat, v_hat, p)
    u, v = set_uv_bound(prob, u, v)
    res = fs_residual(prob, u, u_hat)
    new = FracStepState(
        u=u, v=v, u_old=u_old, v_old=v_old, u_hat=u_hat, v_hat=v_hat, mg=mg
    )
    return new, res


def timestep(prob: FracStepProblem, state: FracStepState,
             ppe_solver: str = "vcycle", max_cycles: int = 60):
    """One fractional step; returns (state, fs_residual)."""
    return _timestep_impl(
        prob.hierarchy, prob.dx, prob.dy, prob.lap, prob.bmask, prob.u_bc,
        prob.v_bc, prob.normals, state,
        config=prob.config, ppe_solver=ppe_solver, max_cycles=max_cycles,
        compatible=prob.compatible_ppe, lap_scale=prob.lap_scale,
    )


def run(prob: FracStepProblem, steps: int | None = None,
        ppe_solver: str = "vcycle", max_cycles: int = 60):
    """Time loop (run_fracstep_param, FractionalStepSim.cpp:130-156).

    Returns (final state, fs_residual history, u L1 error vs Kovasznay) —
    the reference's final validation metric (:158-168).
    """
    steps = prob.config.max_steps if steps is None else steps
    state = prob.state0
    hist = []
    for _ in range(steps):
        state, res = timestep(prob, state, ppe_solver, max_cycles)
        hist.append(float(res))
    err = u_error_vs_kovasznay(prob, state)
    return state, np.asarray(hist), err


def u_error_vs_kovasznay(prob: FracStepProblem, state: FracStepState) -> float:
    op = prob.hierarchy.finest
    u_log = np.asarray(op.to_logical(state.u))
    u_ex, _, _ = kovasznay_uvp(prob.clouds[-1].points, prob.config.reynolds)
    return float(np.abs(u_log - u_ex).mean())


def prescribe_solution(prob: FracStepProblem, state: FracStepState) -> FracStepState:
    """Set exact Kovasznay u, v, p (prescribe_soln, fractionalStepGrid.cpp:26-40)."""
    op = prob.hierarchy.finest
    u_ex, v_ex, p_ex = kovasznay_uvp(prob.clouds[-1].points, prob.config.reynolds)
    u = op.to_padded(jnp.asarray(u_ex))
    v = op.to_padded(jnp.asarray(v_ex))
    p = op.to_padded(jnp.asarray(p_ex))
    fine_i = len(prob.hierarchy.levels) - 1
    mg = state.mg.replace_level(fine_i, x=p)
    return dataclasses.replace(state, u=u, v=v, u_old=u, v_old=v, mg=mg)
