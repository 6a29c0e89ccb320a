"""Polyharmonic-spline + polynomial RBF-FD weights, batched.

Numerics follow the reference exactly (so weights agree to roundoff):

* stencil normalization: shift by per-stencil (min x, min y), divide by
  scale = max(x-range, y-range) (shifting_scaling,
  general_computation_functions.cpp:82-107);
* saddle system [[Phi, P], [P^T, 0]] with Phi_ij = r_ij^rbf_exp and P the 2D
  monomials x^(p-q) y^q, p=0..deg, q=0..p (Grid::buildCoeffMatrix,
  grid.cpp:263-299);
* analytic RHS of the target operator at the (scaled) eval point with the
  r->0 guards (grid.cpp:304-424: the i>0 / D>0 branches);
* un-scaling: /scale for first derivatives, /scale^2 for the Laplacian,
  none for interpolation (grid.cpp:337-340, 375-378, 419-422, interp none).

Solved with batched LU in float64.  Weight generation is setup-time only;
run it on the CPU backend (f64 LAPACK) — the solve path consumes only the
resulting sparse operators.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def monomial_exponents(poly_deg: int, dim: int = 2) -> np.ndarray:
    """Exponent table [P, dim] in the reference's ordering.

    2D: for p in 0..deg, for q in 0..p -> x^(p-q) y^q (grid.cpp:287-297).
    3D (designed extension): graded lexicographic over total degree.
    """
    exps = []
    if dim == 2:
        for p in range(poly_deg + 1):
            for q in range(p + 1):
                exps.append((p - q, q))
    elif dim == 3:
        for p in range(poly_deg + 1):
            for i in range(p + 1):
                for j in range(p - i + 1):
                    exps.append((p - i - j, i, j))
    else:
        raise ValueError(f"dim must be 2 or 3, got {dim}")
    return np.asarray(exps, dtype=np.int64)


def shift_scale(pts: jnp.ndarray, eval_pt: jnp.ndarray):
    """Normalize one stencil; returns (scaled_pts [k,d], scaled_eval [d], scale).

    Matches shifting_scaling (general_computation_functions.cpp:82-107):
    min/max over the NEIGHBOR set only; scale = max coordinate range.
    """
    lo = jnp.min(pts, axis=0)
    hi = jnp.max(pts, axis=0)
    scale = jnp.max(hi - lo)
    return (pts - lo) / scale, (eval_pt - lo) / scale, scale


def _powfix(base: jnp.ndarray, expo: int | jnp.ndarray) -> jnp.ndarray:
    """x**e with the convention 0**0 = 1 and no NaN for e<0 rows (guarded)."""
    return jnp.where(expo >= 0, jnp.power(base, jnp.maximum(expo, 0)), 0.0)


def _phs_matrix(scaled: jnp.ndarray, exps: np.ndarray, rbf_exp: int) -> jnp.ndarray:
    """Saddle matrix [[Phi, P],[P^T, 0]] for one scaled stencil [k, d]."""
    diff = scaled[:, None, :] - scaled[None, :, :]
    r = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    phi = r**rbf_exp
    e = jnp.asarray(exps)  # [P, d]
    # P[i, m] = prod_d scaled[i, d] ** e[m, d]
    pmat = jnp.prod(scaled[:, None, :] ** e[None, :, :], axis=-1)
    k, p = scaled.shape[0], e.shape[0]
    top = jnp.concatenate([phi, pmat], axis=1)
    bot = jnp.concatenate([pmat.T, jnp.zeros((p, p), scaled.dtype)], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _rhs_interp(scaled, seval, exps, rbf_exp):
    r = jnp.sqrt(jnp.sum((seval[None, :] - scaled) ** 2, axis=-1))
    rbf = r**rbf_exp
    e = jnp.asarray(exps)
    poly = jnp.prod(seval[None, :] ** e, axis=-1)
    return jnp.concatenate([rbf, poly])


def _rhs_first_deriv(scaled, seval, exps, rbf_exp, axis):
    """d/dx_axis of r^M and monomials at the eval point (grid.cpp:304-380)."""
    d = seval[None, :] - scaled
    r = jnp.sqrt(jnp.sum(d * d, axis=-1))
    m = float(rbf_exp)
    # M * r^(M-2) * (eval_axis - ref_axis); guard r=0 (self point)
    safe_r = jnp.where(r > 0, r, 1.0)
    rbf = jnp.where(r > 0, m * safe_r ** (m - 2) * d[:, axis], 0.0)
    e = np.asarray(exps)
    ed = jnp.asarray(e[:, axis])
    elow = e.copy()
    elow[:, axis] -= 1
    poly = ed * jnp.prod(_powfix(seval[None, :], jnp.asarray(elow)), axis=-1)
    poly = jnp.where(ed > 0, poly, 0.0)
    return jnp.concatenate([rbf, poly])


def _rhs_laplace(scaled, seval, exps, rbf_exp, dim):
    """Laplacian of r^M and monomials at the eval point (grid.cpp:381-417).

    For r^M in d dims: lap = M (M + d - 2) r^(M-2); the reference's 2D
    formula (grid.cpp:397-401) expands to exactly M^2 r^(M-2) with d=2.
    """
    d = seval[None, :] - scaled
    r2 = jnp.sum(d * d, axis=-1)
    m = float(rbf_exp)
    safe = jnp.where(r2 > 0, r2, 1.0)
    rbf = jnp.where(r2 > 0, m * (m + dim - 2.0) * safe ** ((m - 2) / 2.0), 0.0)
    e = np.asarray(exps)
    parts = []
    for ax in range(dim):
        ea = e[:, ax]
        elow = e.copy()
        elow[:, ax] -= 2
        term = (ea * (ea - 1)) * jnp.prod(
            _powfix(seval[None, :], jnp.asarray(elow)), axis=-1
        )
        parts.append(jnp.where(jnp.asarray(ea) >= 2, term, 0.0))
    poly = functools.reduce(jnp.add, parts)
    return jnp.concatenate([rbf, poly])


_OPS = ("laplace", "dx", "dy", "dz", "interp")


def _weights_one(pts, eval_pt, exps, rbf_exp, op, dim):
    scaled, seval, scale = shift_scale(pts, eval_pt)
    amat = _phs_matrix(scaled, exps, rbf_exp)
    if op == "interp":
        rhs = _rhs_interp(scaled, seval, exps, rbf_exp)
        unscale = 1.0
    elif op == "laplace":
        rhs = _rhs_laplace(scaled, seval, exps, rbf_exp, dim)
        unscale = 1.0 / scale**2
    elif op in ("dx", "dy", "dz"):
        axis = {"dx": 0, "dy": 1, "dz": 2}[op]
        rhs = _rhs_first_deriv(scaled, seval, exps, rbf_exp, axis)
        unscale = 1.0 / scale
    else:
        raise ValueError(f"op must be one of {_OPS}, got {op!r}")
    w = jnp.linalg.solve(amat, rhs)
    k = pts.shape[0]
    return w[:k] * unscale


@functools.partial(
    jax.jit, static_argnames=("op", "poly_deg", "rbf_exp", "chunk")
)
def batched_weights(
    points: jnp.ndarray,  # [N, d] cloud coords
    neighbors: jnp.ndarray,  # [M, k] stencil tables
    eval_points: jnp.ndarray,  # [M, d] evaluation points
    *,
    op: str,
    poly_deg: int,
    rbf_exp: int = 3,
    chunk: int = 4096,
) -> jnp.ndarray:
    """RBF-FD weights [M, k] for ``op`` at each eval point.

    Chunked vmap over stencils keeps the [chunk, k+p, k+p] solve batches in
    memory; one batched LU per chunk (MXU/LAPACK-friendly) replaces the
    reference's M sequential fullPivLu calls (grid.cpp:418).
    """
    mq, k = neighbors.shape
    dim = points.shape[1]
    exps = monomial_exponents(poly_deg, dim)

    def one(neigh, ev):
        return _weights_one(points[neigh], ev, exps, rbf_exp, op, dim)

    # pad M to a multiple of chunk, scan over chunks of vmapped solves
    nchunks = -(-mq // chunk)
    pad = nchunks * chunk - mq
    neigh_p = jnp.concatenate([neighbors, jnp.zeros((pad, k), neighbors.dtype)])
    ev_p = jnp.concatenate([eval_points, jnp.ones((pad, dim), eval_points.dtype)])
    neigh_c = neigh_p.reshape(nchunks, chunk, k)
    ev_c = ev_p.reshape(nchunks, chunk, dim)

    def body(_, args):
        nb, ev = args
        return None, jax.vmap(one)(nb, ev)

    _, out = jax.lax.scan(body, None, (neigh_c, ev_c))
    return out.reshape(nchunks * chunk, k)[:mq]
