"""Frozen configuration dataclasses (replaces config-as-code in the reference).

The reference has no config layer: ``GridProperties`` (gridclasses.hpp:6-14)
is populated by hardcoded generator functions (testing_functions.cpp:351-395,
FractionalStepSim.cpp:50-79).  Here every preset is an immutable dataclass so
configs hash/compare cleanly and can key jit caches.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence


def poly_terms(poly_deg: int, dim: int = 2) -> int:
    """Number of monomials up to total degree ``poly_deg`` in ``dim`` D.

    2D reference rule: ``(polyDeg + 1) * (polyDeg + 2) / 2`` (grid.cpp:266);
    3D is the designed extension (C(deg+3, 3) terms).
    """
    if dim == 2:
        return (poly_deg + 1) * (poly_deg + 2) // 2
    if dim == 3:
        return (poly_deg + 1) * (poly_deg + 2) * (poly_deg + 3) // 6
    raise ValueError(f"dim must be 2 or 3, got {dim}")


def stencil_size(poly_deg: int, dim: int = 2) -> int:
    """Stencil size rule k = floor(2.5 * polyTerms) (grid.cpp:267)."""
    return int(2.5 * poly_terms(poly_deg, dim))


@dataclasses.dataclass(frozen=True)
class GridConfig:
    """Per-level grid/operator configuration.

    Mirrors the reference ``GridProperties`` (gridclasses.hpp:6-14) with the
    reference defaults: rbf_exp=3 (PHS r^3), omega=1.4, iters=5 sweeps per
    smoother call (testing_functions.cpp:372-380).
    """

    poly_deg: int = 3
    rbf_exp: int = 3
    omega: float = 1.4
    iters: int = 5
    dim: int = 2

    @property
    def stencil_size(self) -> int:
        return stencil_size(self.poly_deg, self.dim)

    @property
    def poly_terms(self) -> int:
        return poly_terms(self.poly_deg, self.dim)


@dataclasses.dataclass(frozen=True)
class MultigridConfig:
    """Multigrid hierarchy configuration.

    The reference hierarchy is a list of independently generated point clouds
    sorted by size ascending (multigrid.cpp:116-122); fine level uses
    ``poly_deg`` in 4..6, coarse levels use 3 (testing_functions.cpp:375).
    ``coarsest_extra_sweeps``: the coarsest grid is smoothed twice per cycle
    (multigrid.cpp:94-95).
    """

    num_levels: int = 3
    fine_poly_deg: int = 6
    coarse_poly_deg: int = 3
    dim: int = 2  # 3 = the designed 3D extension (BASELINE config 3)
    smoother: str = "jacobi"  # "jacobi" | "block_sor" | "colored_sor"
    omega: float = 1.4
    iters: int = 5
    rbf_exp: int = 3
    # Transfer-operator polynomial degree rule: the Poisson engine uses the
    # FINEST grid's poly_deg for all interpolation matrices (multigrid.cpp:22)
    # while the frac-step engine uses each base grid's own poly_deg
    # (FracStepMultigrid.cpp:23).  "finest" | "base".
    transfer_poly: str = "finest"
    dtype: str = "float64"

    def level_config(self, level: int) -> GridConfig:
        """Level 0 = coarsest; num_levels-1 = finest (reference ordering)."""
        deg = self.fine_poly_deg if level == self.num_levels - 1 else self.coarse_poly_deg
        return GridConfig(
            poly_deg=deg, rbf_exp=self.rbf_exp, omega=self.omega,
            iters=self.iters, dim=self.dim,
        )


@dataclasses.dataclass(frozen=True)
class FracStepConfig:
    """Fractional-step Navier-Stokes configuration.

    Reference defaults from gen_fracstep_param / run_frac_step_test
    (FractionalStepSim.cpp:50-79, 201-204): dt=2e-4, mu=0.025, rho=1
    (Re=40), PPE tolerance 1e-10, <=2000 timesteps, Kovasznay flow.
    """

    dt: float = 2e-4
    mu: float = 0.025
    rho: float = 1.0
    ppe_tol: float = 1e-10
    max_steps: int = 2000
    flow_type: str = "kovasznay"
    # Pressure under-relaxation p_used = p_relax*p_new + (1-p_relax)*p_old.
    # The fixed point is unchanged; it damps the measured period-2 marginal
    # mode (|lambda| ~ 1.01) of the discrete projection loop.  1.0 disables
    # (strict reference behavior).
    p_relax: float = 0.7
    # Diffusion treatment: "explicit" (reference forward-Euler,
    # fractionalStepGrid.cpp:101-124) or "implicit" (backward-Euler
    # Helmholtz solve (I - dt nu Lap) u_hat = u - dt (u.grad)u —
    # unconditionally diffusion-stable and damps the spurious high-degree
    # advective modes that destabilize deg-6 operators at fine resolution).
    diffusion: str = "explicit"
    # Hyperviscosity strength (standard RBF-FD advection stabilization,
    # Flyer/Fornberg practice): adds -hv * nu * Lap(Lap u)/|lam_max(Lap)| to
    # the predictor, damping the spurious high-order-stencil modes that make
    # explicit advection weakly unstable at fine resolution + high degree
    # (observed at deg 6 / 10k points).  0 disables (reference behavior).
    hyperviscosity: float = 0.0

    @property
    def reynolds(self) -> float:
        return self.rho / self.mu


# ---------------------------------------------------------------------------
# Named presets replicating the reference's hardcoded experiment generators.
# ---------------------------------------------------------------------------

REFERENCE_MG_SIZES: dict[str, Sequence[int]] = {
    # Point counts of the gitignored .msh fixtures named in the reference
    # (testing_functions.cpp:355-364).  Our geometry module generates
    # equivalent clouds at these sizes.
    "square": (170, 600, 2500, 10000),
    "square_with_circle": (176, 640, 2532, 10197, 37943, 150214),
    "concentric_circles": (188, 650, 2581, 10207),
    # 3D designed extension (BASELINE config 3: 1M pts, 27-ish neighbor
    # stencils at deg 2, 5 levels); the reference is strictly 2D.
    "box3d": (4000, 16000, 64000, 250000, 1000000),
}


def reference_mg_config(num_levels: int, poly_deg: int) -> MultigridConfig:
    """gen_mg_param equivalent (testing_functions.cpp:351-395)."""
    return MultigridConfig(
        num_levels=num_levels,
        fine_poly_deg=poly_deg,
        coarse_poly_deg=3,
        omega=1.4,
        iters=5,
        rbf_exp=3,
        transfer_poly="finest",
    )


def reference_fracstep_config() -> FracStepConfig:
    """gen_fracstep_param(4, 6, 2e-4, .025, 1, 1e-10) equivalent."""
    return FracStepConfig()
