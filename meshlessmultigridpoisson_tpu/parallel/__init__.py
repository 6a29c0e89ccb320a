"""Distributed execution: row-partitioned point axis over a device mesh.

The reference is strictly serial (SURVEY.md section 2: no threads, no MPI,
no GPU); these components are new, specified by BASELINE.json's north star.
Design ("sequence parallelism" for the point axis, SURVEY.md section 5):

* the FINE level's rows are partitioned into contiguous RCM blocks per
  device (contiguity + RCM banding => each shard's stencils reach only a
  bounded halo of neighbor-shard entries);
* halo exchange is two `ppermute` edge-slice sends per application,
  overlapped by XLA with local compute;
* the smoother stays the exact in-shard (block, class) GS; cross-shard
  seams relax concurrently (block-Jacobi at seam rows, damped via
  omega_scale — measured necessary and sufficient for stability);
* Lagrange border dots and residual norms are `psum` reductions;
* coarse levels are REPLICATED per device (they are cheap relative to the
  fine level at scale): restriction becomes per-shard partial products +
  psum, prolongation is local rows x replicated coarse values — no halo.
"""

from meshlessmultigridpoisson_tpu.parallel.partition import (
    ShardedFineLevel,
    ShardedHierarchy,
    partition_hierarchy,
)
from meshlessmultigridpoisson_tpu.parallel.sharded import (
    make_sharded_vcycle,
    make_sharded_solver,
)

__all__ = [
    "ShardedFineLevel",
    "ShardedHierarchy",
    "partition_hierarchy",
    "make_sharded_vcycle",
    "make_sharded_solver",
]
