"""Unit tests: RBF-FD weights reproduce analytic operators.

The reference's closest analogue is check_derivs (FractionalStepSim.cpp:80-113)
which prints operator errors against Kovasznay analytics; here they are
asserted.  Polynomial reproduction up to poly_deg is the sharp correctness
property of PHS+poly RBF-FD stencils.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from meshlessmultigridpoisson_tpu.config import stencil_size
from meshlessmultigridpoisson_tpu.geometry import (
    square_cloud,
    knn,
    knn_queries,
)
from meshlessmultigridpoisson_tpu.stencil import batched_weights, shift_scale


@pytest.fixture(scope="module")
def cloud():
    return square_cloud(900, seed=1)


def poly_field(pts):
    x, y = pts[:, 0], pts[:, 1]
    return x**3 * y + 2 * y**2


def test_shift_scale_matches_reference_semantics():
    pts = jnp.asarray([[0.2, 0.4], [0.6, 0.4], [0.2, 0.5]])
    ev = jnp.asarray([0.3, 0.45])
    scaled, seval, scale = shift_scale(pts, ev)
    # scale = max(x-range, y-range) = max(0.4, 0.1) = 0.4
    assert np.isclose(float(scale), 0.4)
    assert np.allclose(np.asarray(scaled).min(axis=0), [0, 0])
    assert np.asarray(scaled).max() <= 1.0 + 1e-12
    assert np.allclose(np.asarray(seval), [(0.3 - 0.2) / 0.4, (0.45 - 0.4) / 0.4])


@pytest.mark.parametrize("deg", [3, 4])
def test_derivative_weights_exact_on_polynomials(cloud, deg):
    """Stencils of degree d reproduce derivatives of degree-d fields exactly."""
    k = stencil_size(deg)
    nb = knn(cloud.points, k)
    pts = jnp.asarray(cloud.points)
    x, y = cloud.points[:, 0], cloud.points[:, 1]
    if deg == 3:
        f = x**2 * y + 2 * y**2
        cases = {"laplace": 2 * y + 4, "dx": 2 * x * y, "dy": x**2 + 4 * y}
    else:
        f = poly_field(cloud.points)
        cases = {
            "laplace": 6 * x * y + 4,
            "dx": 3 * x**2 * y,
            "dy": x**3 + 4 * y,
        }
    for op, exact in cases.items():
        w = batched_weights(pts, jnp.asarray(nb), pts, op=op, poly_deg=deg)
        approx = np.sum(np.asarray(w) * f[nb], axis=1)
        assert np.abs(approx - exact).max() < 1e-7, op


def test_interp_weights_reproduce_polynomial(cloud):
    deg = 4
    k = stencil_size(deg)
    q = np.random.default_rng(0).uniform(0.2, 0.8, (64, 2))
    nb = knn_queries(cloud.points, q, k)
    w = batched_weights(
        jnp.asarray(cloud.points), jnp.asarray(nb), jnp.asarray(q),
        op="interp", poly_deg=deg,
    )
    f = poly_field(cloud.points)
    fq = poly_field(q)
    approx = np.sum(np.asarray(w) * f[nb], axis=1)
    assert np.abs(approx - fq).max() < 1e-8


def test_interp_exact_at_coincident_point(cloud):
    """A query exactly on a cloud point reproduces that point's value."""
    deg = 3
    k = stencil_size(deg)
    q = cloud.points[100:108]
    nb = knn_queries(cloud.points, q, k)
    w = batched_weights(
        jnp.asarray(cloud.points), jnp.asarray(nb), jnp.asarray(q),
        op="interp", poly_deg=deg,
    )
    f = np.sin(cloud.points[:, 0] * 3) * np.cos(cloud.points[:, 1] * 2)
    approx = np.sum(np.asarray(w) * f[nb], axis=1)
    assert np.abs(approx - f[100:108]).max() < 1e-9


def test_neumann_stencils_exclude_other_boundary_points(cloud):
    k = stencil_size(3)
    bmask = cloud.boundary_mask
    nb = knn(cloud.points, k, boundary_mask=bmask, neumann=True)
    bidx = np.nonzero(bmask)[0]
    for i in bidx[:20]:
        stencil = nb[i]
        assert stencil[0] == i  # self first (grid.cpp:254)
        assert not bmask[stencil[1:]].any()  # interior-only (grid.cpp:236-244)
