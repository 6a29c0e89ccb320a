"""TPU-native meshless multigrid Poisson framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``michaelxu3/MeshlessMultigridPoisson`` (reference: RBF-FD stencils on
scattered 2D point clouds, geometric-style multigrid with RBF transfer
operators, SOR smoothing, Dirichlet/Neumann BCs with a Lagrange-multiplier
null-space fix and implicit boundary condensation, and a fractional-step
incompressible Navier-Stokes timestepper).

Design stance (see SURVEY.md section 7): immutable, padded, statically-shaped
operator bundles + pure jitted functions.  Setup (neighbor search, RBF-FD
weight solves, operator assembly, coloring, partitioning) happens on host /
any backend; the solve path (smoother sweeps, SpMV, V-cycle, timestepping)
is jit-compiled, TPU-resident, and shardable over a ``jax.sharding.Mesh``
by row-partitioning the point axis with halo exchange.

The reference solver works in float64 throughout and converges pressure
solves to 1e-10 relative residual (FractionalStepSim.cpp:202); float64 is
therefore the default solver dtype here as well (TPUs execute f64 via a
slower emulated path; a float32 fast path is available per-config).
"""

import os

# Scientific solver: double precision is required for the reference parity
# tolerances (1e-8..1e-10 relative residuals).  Must happen before any JAX
# arrays are created.  Opt out with MMP_TPU_NO_X64=1.
if not os.environ.get("MMP_TPU_NO_X64"):
    import jax

    jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: kernel compiles through the remote-compile
# helper cost minutes each; cache them across processes.
try:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # older/newer jax knob drift — cache is best-effort
    pass

from meshlessmultigridpoisson_tpu.config import (  # noqa: E402
    GridConfig,
    MultigridConfig,
    FracStepConfig,
    stencil_size,
    poly_terms,
)

__all__ = [
    "GridConfig",
    "MultigridConfig",
    "FracStepConfig",
    "stencil_size",
    "poly_terms",
]

__version__ = "0.1.0"
