"""Distributed execution: row-partitioned point axis over a device mesh.

The reference is strictly serial (SURVEY.md section 2: no threads, no MPI,
no GPU); these components are new, specified by BASELINE.json's north star.
Design ("sequence parallelism" for the point axis, SURVEY.md section 5):

* the FINE level's rows are partitioned into contiguous RCM blocks per
  device, each reordered [frontier | interior] (frontier = rows with any
  cross-shard coupling; under the symmetric pattern, ONLY frontier rows
  are ever read remotely);
* exchanges move just the nf-row frontier slices via `ppermute`; the
  interior phase — the bulk of the sweep — is communication-free;
* the smoother is EXACT global Gauss-Seidel under the frontier-phased
  order (shards ≡ p mod C update their frontiers in phase p; same-phase
  shards never couple) — no seam damping, serial-grade convergence
  (parallel/partition.py docstring has the proof sketch);
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
from meshlessmultigridpoisson_tpu.parallel.runtime import (
    init_distributed,
    solver_mesh,
    topology_summary,
)
from meshlessmultigridpoisson_tpu.parallel.sharded import (
    make_sharded_vcycle,
    make_sharded_solver,
    make_sharded_bicgstab,
)

__all__ = [
    "ShardedFineLevel",
    "ShardedHierarchy",
    "partition_hierarchy",
    "init_distributed",
    "solver_mesh",
    "topology_summary",
    "make_sharded_vcycle",
    "make_sharded_solver",
    "make_sharded_bicgstab",
]
