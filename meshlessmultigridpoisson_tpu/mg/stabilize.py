"""Setup-time smoother stabilization by localized under-relaxation.

RBF-FD operators are nonsymmetric and not diagonally dominant; Gauss-Seidel
at the reference's omega=1.4 usually converges but on some cloud/degree
combinations a few pathological (usually corner/boundary-layer) rows carry
modes with spectral radius slightly above 1 — measured rho up to ~1.3 on
reference-sized Neumann configs, for lexicographic order just as for the
(block, class) order, i.e. the reference algorithm itself is fragile there
(it never asserts convergence; run_tests just logs residuals,
testing_functions.cpp:341-345).

This pass makes the smoother robust: power-iterate the homogeneous sweep
E = S(x) at setup, and while rho >= 1, damp omega on the rows where the
dominant error mode concentrates (omega_scale *= damp there), re-estimate,
repeat.  Localized damping preserves the fixed point (any per-row omega
does) and leaves convergence on healthy rows untouched.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from meshlessmultigridpoisson_tpu.ops import smoothers as sm
from meshlessmultigridpoisson_tpu.stencil.operators import LevelOperator
from meshlessmultigridpoisson_tpu.utils.jaxutils import on_cpu


def estimate_smoother_rho(
    op: LevelOperator, sweeps: int = 20, seed: int = 0
) -> tuple[float, np.ndarray]:
    """Power-iterate one-sweep error propagation; returns (rho, |mode|)."""
    rng = np.random.default_rng(seed)
    smask = np.asarray(op.smooth_mask) > 0
    e = jnp.asarray(np.where(smask, rng.standard_normal(op.n_pad), 0.0))
    el = jnp.zeros((), e.dtype)
    z = jnp.zeros(op.n_pad, e.dtype)
    zl = jnp.zeros((), e.dtype)

    @jax.jit
    def step(e, el):
        e2, el2 = sm.smooth(op, e, el, z, zl, iters=1)
        nrm = jnp.sqrt(jnp.sum(e2 * e2) + el2 * el2)
        return e2 / nrm, el2 / nrm, nrm

    nrm = jnp.ones(())
    for _ in range(sweeps):
        e, el, nrm = step(e, el)
    return float(nrm), np.abs(np.asarray(e))


def stabilize_level(
    op: LevelOperator,
    target_rho: float = 0.995,
    damp: float = 0.5,
    mode_quantile: float = 0.995,
    max_rounds: int = 10,
    sweeps: int = 20,
) -> LevelOperator:
    """Damp unstable rows until the smoother's estimated rho < target."""
    with on_cpu():
        for _ in range(max_rounds):
            rho, mode = estimate_smoother_rho(op, sweeps=sweeps)
            if rho < target_rho:
                break
            sel = mode[np.isfinite(mode) & (mode > 0)]
            if sel.size == 0:
                raise ValueError(
                    "smoother power iteration produced no finite mode "
                    f"(rho={rho}); the operator likely has zero/NaN rows"
                )
            thresh = np.quantile(sel, mode_quantile)
            bad = mode >= max(thresh, 1e-30)
            scale = np.asarray(op.omega_scale).copy()
            scale[bad] *= damp
            op = dataclasses.replace(op, omega_scale=jnp.asarray(scale))
    return op
