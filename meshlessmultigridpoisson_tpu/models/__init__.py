"""Physics / application modules over the operator library.

``poisson.py``: manufactured-solution Poisson problems on the three
reference geometries (testing_functions.cpp:68-284).
``fracstep.py``: the fractional-step incompressible Navier-Stokes
timestepper with Kovasznay validation (fractionalStepGrid.cpp,
FractionalStepSim.cpp).
"""

from meshlessmultigridpoisson_tpu.models.poisson import (
    PoissonProblem,
    make_poisson_problem,
    l1_error,
)

__all__ = ["PoissonProblem", "make_poisson_problem", "l1_error"]
