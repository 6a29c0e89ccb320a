"""RBF-FD stencil weight generation (setup-time operator factory).

TPU-native redesign of the reference's per-point dense solves
(Grid::buildCoeffMatrix / laplaceWeights / derivx_weights / derivy_weights /
pointInterpWeights, grid.cpp:263-424): neighbor coordinates are gathered into
[B, k, dim] batches, the PHS+polynomial saddle systems [B, k+p, k+p] are
built vectorized and solved with one batched LU, and the weights are
un-scaled — one chunked-vmap pass instead of N sequential fullPivLu calls.
"""

from meshlessmultigridpoisson_tpu.stencil.phs import (
    batched_weights,
    shift_scale,
    monomial_exponents,
)

__all__ = ["batched_weights", "shift_scale", "monomial_exponents"]
