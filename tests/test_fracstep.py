"""Fractional-step Navier-Stokes tests (reference check_derivs + Kovasznay).

The operator checks assert what check_derivs printed
(FractionalStepSim.cpp:80-113); the stepping test verifies the timestepper
holds the exact Kovasznay solution (the reference's end-of-run validation,
:158-168, inverted into a drift bound from exact initial conditions).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from meshlessmultigridpoisson_tpu.models import fracstep as fs
from meshlessmultigridpoisson_tpu.ops.ell import spmv


@pytest.fixture(scope="module")
def prob():
    return fs.build_fracstep_problem(sizes=[600, 2500], poly_deg=4)


def test_operator_verification(prob):
    """dudx/dudy/lap errors vs Kovasznay analytics (check_derivs)."""
    op = prob.hierarchy.finest
    pts = prob.clouds[-1].points
    re = prob.config.reynolds
    lam = fs.kovasznay_lambda(re)
    x, y = pts[:, 0], pts[:, 1]
    u_ex, v_ex, _ = fs.kovasznay_uvp(pts, re)
    u = op.to_padded(jnp.asarray(u_ex))
    v = op.to_padded(jnp.asarray(v_ex))

    exact_dudx = -lam * np.exp(lam * x) * np.cos(2 * np.pi * y)
    exact_dudy = np.exp(lam * x) * 2 * np.pi * np.sin(2 * np.pi * y)
    exact_lapu = np.cos(2 * np.pi * y) * np.exp(lam * x) * (
        4 * np.pi**2 - lam**2
    )
    got_dx = np.asarray(op.to_logical(spmv(prob.dx, u)))
    got_dy = np.asarray(op.to_logical(spmv(prob.dy, u)))
    got_lap = np.asarray(op.to_logical(spmv(prob.lap, u)))
    assert np.abs(got_dx - exact_dudx).mean() < 1e-3
    assert np.abs(got_dy - exact_dudy).mean() < 1e-3
    assert np.abs(got_lap - exact_lapu).mean() < 5e-2

    # discrete continuity of the exact flow (check_derivs "continuity")
    div = got_dx + np.asarray(op.to_logical(spmv(prob.dy, v)))
    assert np.abs(div).mean() < 1e-2


def test_predictor_matches_pressure_gradient_identity(prob):
    """For the exact steady flow, u_hat ~ u + dt/rho grad p (check_derivs)."""
    op = prob.hierarchy.finest
    c = prob.config
    pts = prob.clouds[-1].points
    re = c.reynolds
    u_ex, v_ex, p_ex = fs.kovasznay_uvp(pts, re)
    u = op.to_padded(jnp.asarray(u_ex))
    v = op.to_padded(jnp.asarray(v_ex))
    p = op.to_padded(jnp.asarray(p_ex))
    u_hat, v_hat = fs.predictor(prob, u, v)
    pred = u + c.dt / c.rho * spmv(prob.dx, p)
    err = float(jnp.abs(op.to_logical(u_hat - pred)).mean())
    # error is dt * (discretization error of the momentum balance)
    assert err < 10 * c.dt


def test_timestepper_holds_kovasznay(prob):
    """From exact ICs the flow must stay on the Kovasznay solution."""
    state = fs.prescribe_solution(prob, prob.state0)
    for _ in range(30):
        state, res = fs.timestep(prob, state, ppe_solver="bicgstab")
    err = fs.u_error_vs_kovasznay(prob, state)
    assert err < 2e-3
    assert float(res) < 1e-2


def test_fs_residual_metric(prob):
    state = fs.prescribe_solution(prob, prob.state0)
    r = fs.fs_residual(prob, state.u, state.u)
    assert float(r) == 0.0
