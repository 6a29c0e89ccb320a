"""3D extension tests (BASELINE.json config 3 direction).

The reference is strictly 2D (`distance` drops z,
general_computation_functions.cpp:4-6; 2D monomials, grid.cpp:285-297); 3D
here is a designed extension: the stencil factory/monomials/kNN are
dimension-generic, so a 3D Dirichlet Poisson solve runs through the same
pipeline.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from meshlessmultigridpoisson_tpu.config import GridConfig, stencil_size
from meshlessmultigridpoisson_tpu.geometry import box3d_cloud, knn
from meshlessmultigridpoisson_tpu.mg.setup import order_cloud
from meshlessmultigridpoisson_tpu.mg.vcycle import Hierarchy, MGState, init_state
from meshlessmultigridpoisson_tpu.mg.krylov import solve_bicgstab
from meshlessmultigridpoisson_tpu.stencil import batched_weights
from meshlessmultigridpoisson_tpu.stencil.operators import (
    bc_flags_from_cloud,
    build_level_operator,
)

PI = np.pi


def test_3d_stencils_reproduce_polynomial_derivatives():
    cloud = box3d_cloud(2000, seed=1)
    deg = 2
    k = stencil_size(deg, dim=3)
    nb = knn(cloud.points, k)
    pts = jnp.asarray(cloud.points)
    x, y, z = cloud.points.T
    f = x * x + 2 * y * z + 3 * z * z
    w = batched_weights(pts, jnp.asarray(nb), pts, op="laplace", poly_deg=deg)
    approx = np.sum(np.asarray(w) * f[nb], axis=1)
    assert np.abs(approx - (2 + 6)).max() < 1e-6
    wz = batched_weights(pts, jnp.asarray(nb), pts, op="dz", poly_deg=deg)
    approx_z = np.sum(np.asarray(wz) * f[nb], axis=1)
    assert np.abs(approx_z - (2 * y + 6 * z)).max() < 1e-6


def test_3d_dirichlet_poisson_solve():
    """Single-level 3D solve: u = prod sin(pi x_i) to truncation accuracy."""
    cloud = box3d_cloud(3000, seed=0)
    cfg = GridConfig(poly_deg=2, dim=3)
    k = cfg.stencil_size
    # order via RCM on the stencil graph (dimension-agnostic)
    oc = order_cloud(cloud, k, neumann=False)
    flags = bc_flags_from_cloud(oc, ["dirichlet"])
    x, y, z = oc.points.T
    exact = np.sin(PI * x) * np.sin(PI * y) * np.sin(PI * z)
    src = -3 * PI * PI * exact

    import dataclasses

    op = build_level_operator(oc, flags, np.zeros(oc.n), cfg)
    hier = Hierarchy(levels=(op,), restrict=(), prolong=())
    state = init_state(hier, jnp.asarray(src))
    state, it, resid = solve_bicgstab(hier, state, tol=1e-8, max_iters=400)
    assert float(resid) < 1e-8
    sol = np.asarray(op.to_logical(state.x[0]))
    err = np.abs(sol - exact).mean()
    assert err < 5e-2  # deg-2 on ~3k points: coarse but convergent


@pytest.mark.parametrize("neumann", [False, True])
def test_3d_multilevel_solve(neumann):
    """Full 3D pipeline through make_poisson_problem: 2-level V-cycle
    hierarchy on box clouds (BASELINE config 3 family), manufactured
    product solution, BiCGStab to 1e-8, truncation-level L1 error."""
    from meshlessmultigridpoisson_tpu.models.poisson import (
        l1_error,
        make_poisson_problem,
    )

    prob = make_poisson_problem(
        "box3d", sizes=[500, 1800], poly_deg=2, k1=1, neumann=neumann
    )
    assert prob.clouds[-1].points.shape[1] == 3
    state, it, resid = solve_bicgstab(
        prob.hierarchy, prob.state0, tol=1e-8, max_iters=200
    )
    assert float(resid) < 1e-8
    err = l1_error(prob, state.x[-1])
    assert err < 5e-2  # deg-2 truncation on ~1.8k pts
