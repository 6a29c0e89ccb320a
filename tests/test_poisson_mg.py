"""Integration tests: manufactured-solution multigrid solves.

The reference's accuracy oracle (testing_functions.cpp:3-67 manufactured
L1 errors; run_mg_sim residual histories, :328-350) asserted as tests.
"""

import numpy as np
import pytest

from meshlessmultigridpoisson_tpu.models.poisson import make_poisson_problem, l1_error
from meshlessmultigridpoisson_tpu.mg.vcycle import run_v_cycles, solve_to_tolerance
from meshlessmultigridpoisson_tpu.mg.krylov import solve_bicgstab


def test_square_two_level_dirichlet_vcycle_converges():
    prob = make_poisson_problem(
        "square", sizes=[300, 1200], poly_deg=3, k1=1, neumann=False
    )
    state, hist = run_v_cycles(prob.hierarchy, prob.state0, 40)
    h = np.asarray(hist)
    assert h[0] == pytest.approx(1.0)  # zero initial guess
    assert h[-1] < 0.15  # residual reduced
    err = l1_error(prob, state.x[-1])
    assert err < 2e-2  # truncation-level accuracy for deg-3 on ~1.2k pts


def test_square_two_level_neumann_solves():
    # Small Neumann hierarchies are raw-V-cycle-marginal (two-grid rho can
    # exceed 1 — a reference-inherited fragility, see PARITY.md #5), so the
    # Neumann contract is the robust production path.
    prob = make_poisson_problem(
        "square", sizes=[300, 1200], poly_deg=3, k1=1, neumann=True
    )
    state, it, resid = solve_bicgstab(
        prob.hierarchy, prob.state0, tol=1e-10, max_iters=100
    )
    assert float(resid) < 1e-10
    assert l1_error(prob, state.x[-1]) < 2e-2


@pytest.mark.parametrize("neumann", [False, True])
def test_bicgstab_solves_hard_config_to_1e10(neumann):
    """The production path: V-cycle-preconditioned BiCGStab converges to
    1e-10 even on small Neumann hierarchies where raw cycling diverges."""
    prob = make_poisson_problem(
        "square", sizes=[170, 600], poly_deg=4, k1=1, neumann=neumann
    )
    state, iters, resid = solve_bicgstab(
        prob.hierarchy, prob.state0, tol=1e-10, max_iters=100
    )
    assert float(resid) < 1e-10
    assert int(iters) < 60
    assert l1_error(prob, state.x[-1]) < 5e-3


def test_square_dirichlet_reaches_truncation_error():
    prob = make_poisson_problem(
        "square", sizes=[600, 2500], poly_deg=4, k1=1, neumann=False
    )
    state, hist = run_v_cycles(prob.hierarchy, prob.state0, 60)
    err = l1_error(prob, state.x[-1])
    assert err < 6e-3
    h = np.asarray(hist)
    assert h[-1] < 0.05


def test_solve_to_tolerance_stops_early():
    prob = make_poisson_problem(
        "square", sizes=[300, 1200], poly_deg=3, k1=1, neumann=False
    )
    state, cycles, resid = solve_to_tolerance(
        prob.hierarchy, prob.state0, tol=0.5, max_cycles=100
    )
    assert float(resid) < 0.5
    assert 0 < int(cycles) < 100


def test_square_with_circle_dirichlet():
    prob = make_poisson_problem(
        "square_with_circle", sizes=[400, 1600], poly_deg=3, k1=1, neumann=False
    )
    state, hist = run_v_cycles(prob.hierarchy, prob.state0, 40)
    err = l1_error(prob, state.x[-1])
    assert err < 3e-2


def test_concentric_circles_dirichlet():
    prob = make_poisson_problem(
        "concentric_circles", sizes=[500, 2000], poly_deg=3, k1=1, neumann=False
    )
    state, hist = run_v_cycles(prob.hierarchy, prob.state0, 40)
    err = l1_error(prob, state.x[-1])
    assert err < 3e-2


def test_three_level_hierarchy():
    prob = make_poisson_problem(
        "square", sizes=[200, 700, 2500], poly_deg=3, k1=1, neumann=False
    )
    state, hist = run_v_cycles(prob.hierarchy, prob.state0, 40)
    h = np.asarray(hist)
    assert h[-1] < 0.15
    assert l1_error(prob, state.x[-1]) < 2e-2
