from meshlessmultigridpoisson_tpu.mg.vcycle import (
    Hierarchy,
    MGState,
    v_cycle,
    mg_residual,
    run_v_cycles,
    solve_to_tolerance,
)
from meshlessmultigridpoisson_tpu.mg.setup import build_hierarchy

__all__ = [
    "Hierarchy",
    "MGState",
    "v_cycle",
    "mg_residual",
    "run_v_cycles",
    "solve_to_tolerance",
    "build_hierarchy",
]
