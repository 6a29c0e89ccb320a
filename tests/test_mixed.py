"""Mixed-precision defect-correction solver (mg/mixed.py).

The production path to reference tolerances on accelerators whose kernels
are f32-only: an exact f64 outer residual loop wrapped around an f32 inner
V-cycle/BiCGStab defect solve (reference bar: 1e-10 relative L1 per PPE
solve, FractionalStepSim.cpp:139,202).  On CPU both precisions are native,
so these tests exercise the identical composition the TPU path runs
(f64 LevelOperator outer + f32 hierarchy inner) and assert

  * convergence to 1e-10 even though the inner solver alone floors ~1e-6,
  * solution parity with the all-f64 BiCGStab solve, and
  * the Neumann/Lagrange bordered variant (gauge handled by the border).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from meshlessmultigridpoisson_tpu.mg.krylov import solve_bicgstab
from meshlessmultigridpoisson_tpu.mg.mixed import defect_hierarchy, solve_mixed
from meshlessmultigridpoisson_tpu.models.poisson import l1_error, make_poisson_problem
from meshlessmultigridpoisson_tpu.utils.jaxutils import to_device_tree


@pytest.mark.parametrize("neumann", [False, True])
def test_mixed_solve_reaches_1e10(neumann):
    prob = make_poisson_problem(
        "square", sizes=[600, 2500], poly_deg=4, k1=1, neumann=neumann
    )
    hier64 = prob.hierarchy
    op64 = hier64.levels[-1]
    hier32 = to_device_tree(hier64, dtype=jnp.float32)
    hd = defect_hierarchy(hier32)

    b = prob.state0.b[-1].astype(jnp.float64)
    bl = prob.state0.b_lag[-1].astype(jnp.float64)
    x0 = jnp.zeros(op64.n_pad, jnp.float64)
    x, xl, it, res = solve_mixed(
        op64, hd, x0, jnp.zeros((), jnp.float64), b, bl, tol=1e-10
    )
    assert float(res) < 1e-10, f"mixed solve stalled at {float(res):.2e}"
    assert int(it) <= 8

    # parity with the all-f64 solve
    st64, _, r64 = solve_bicgstab(hier64, prob.state0, tol=1e-10, max_iters=300)
    assert float(r64) < 1e-10
    sol_m = np.asarray(op64.to_logical(x))
    sol_d = np.asarray(op64.to_logical(st64.x[-1]))
    if neumann:  # gauge: compare mean-shifted
        sol_m = sol_m - sol_m.mean()
        sol_d = sol_d - sol_d.mean()
    scale = np.abs(sol_d).max()
    assert np.abs(sol_m - sol_d).max() / scale < 1e-8

    # accuracy identical to the f64 path (truncation-limited)
    e_m = l1_error(prob, x)
    e_d = l1_error(prob, st64.x[-1])
    assert abs(e_m - e_d) / e_d < 1e-3


def test_stepped_matches_whileloop():
    """solve_mixed_stepped (host outer loop, the large-scale production
    path) reaches the same tolerance and solution as the fused while_loop
    form on the same inputs."""
    prob = make_poisson_problem(
        "square", sizes=[600, 2500], poly_deg=4, k1=1, neumann=True
    )
    op64 = prob.hierarchy.levels[-1]
    hd = defect_hierarchy(to_device_tree(prob.hierarchy, dtype=jnp.float32))
    b = prob.state0.b[-1].astype(jnp.float64)
    bl = prob.state0.b_lag[-1].astype(jnp.float64)
    x0 = jnp.zeros(op64.n_pad, jnp.float64)
    xl0 = jnp.zeros((), jnp.float64)
    xw, _, itw, resw = solve_mixed(op64, hd, x0, xl0, b, bl, tol=1e-10)
    from meshlessmultigridpoisson_tpu.mg.mixed import solve_mixed_stepped

    xs, _, its, ress = solve_mixed_stepped(
        op64, hd, x0, xl0, b, bl, tol=1e-10)
    assert ress < 1e-10 and float(resw) < 1e-10
    assert its == int(itw)
    a = np.asarray(op64.to_logical(xs))
    c = np.asarray(op64.to_logical(xw))
    a, c = a - a.mean(), c - c.mean()  # Neumann gauge
    assert np.abs(a - c).max() / max(np.abs(c).max(), 1e-30) < 1e-9


def test_defect_hierarchy_zeroes_fine_pins():
    """The inner hierarchy solves for the ERROR: its fine Dirichlet pin
    values must be zero (the error at pinned rows is 0, not g), everything
    else untouched."""
    prob = make_poisson_problem(
        "square", sizes=[600, 2500], poly_deg=4, k1=1, neumann=False
    )
    hier32 = to_device_tree(prob.hierarchy, dtype=jnp.float32)
    hd = defect_hierarchy(hier32)
    assert float(jnp.abs(hd.levels[-1].dirichlet_values).max()) == 0.0
    np.testing.assert_array_equal(
        np.asarray(hd.levels[-1].dirichlet_mask),
        np.asarray(hier32.levels[-1].dirichlet_mask),
    )
