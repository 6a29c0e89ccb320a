"""Multi-host runtime: ``jax.distributed`` init and the solver device mesh.

The reference is a single process with no communication layer (SURVEY.md
section 2, parallelism inventory); scaling the point axis N across chips —
and across HOSTS — is a new first-class component of this framework.  This
module is the entry point for that topology:

* :func:`init_distributed` brings up the JAX distributed runtime (one
  controller process per host, coordinated over DCN).  On a single host it
  is a no-op, so every code path can call it unconditionally.
* :func:`solver_mesh` builds the 1-D ``points`` mesh the row-partitioned
  solve path (parallel/partition.py + parallel/sharded.py) shards over.

Topology contract (why a plain 1-D mesh is the right shape here): the
sharded solver's only communication patterns are

  1. nearest-neighbor ``ppermute`` between CONSECUTIVE shards (frontier
     exchange — parallel/sharded.py), and
  2. tree reductions (``psum``: norms, Lagrange row, restriction).

``jax.devices()`` enumerates devices process-major (all of host 0's
devices, then host 1's, ...) and within a process in ICI-neighbor order on
TPU pod slices.  Contiguous RCM row blocks are assigned to shards in that
same order (partition_fine_level), so the per-hop frontier ``ppermute``
rides ICI everywhere except the (num_hosts - 1) host-boundary seams, which
cross DCN once per phase — the minimum possible for a row partition.  The
``psum`` lowers to the standard ICI-then-DCN hierarchical all-reduce.
Coarse levels are replicated per chip (partition.py), so no coarse-level
traffic crosses DCN at all.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh

AXIS = "points"

# set by init_distributed once jax.distributed.initialize has run; the
# process_count() probe alone misses an explicit single-process init
# (num_processes=1), where a second initialize() would raise RuntimeError
_initialized = False


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize the JAX distributed runtime for multi-host solves.

    Resolution order per argument: explicit argument, then the standard
    environment (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``, or the cluster auto-detectors JAX itself supports
    via ``jax.distributed.initialize()``'s defaults).  Returns True when a
    multi-process runtime was started, False for the single-process no-op.

    Idempotent: calling again after initialization (or in a single-process
    run) is safe.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        # single-process run (or an auto-detectable cluster env JAX handles
        # without arguments — only attempt that when explicitly requested)
        return False
    global _initialized
    # Probe the distributed client directly: jax.process_count() would
    # initialize the XLA backend, after which jax.distributed.initialize
    # refuses to run at all.
    client = getattr(
        getattr(getattr(jax, "_src", None), "distributed", None),
        "global_state", None)
    already = _initialized or (
        client is not None and getattr(client, "client", None) is not None)
    if already:
        return jax.process_count() > 1  # already initialized
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    return jax.process_count() > 1


def solver_mesh(n_shards: int | None = None, devices=None) -> Mesh:
    """The 1-D ``points`` mesh for the row-partitioned solve path.

    Uses all addressable-cluster devices by default (process-major order —
    see module docstring for why that minimizes DCN crossings).  Pass
    ``n_shards`` to use a prefix subset (e.g. a power of two), or
    ``devices`` for explicit placement.
    """
    if devices is None:
        devices = jax.devices()
    if n_shards is not None:
        if n_shards > len(devices):
            raise ValueError(
                f"n_shards={n_shards} exceeds {len(devices)} devices"
            )
        devices = devices[:n_shards]
    return Mesh(np.asarray(devices), (AXIS,))


def topology_summary() -> dict:
    """Host/device topology as a JSON-ready dict (observability)."""
    devs = jax.devices()
    return dict(
        num_processes=jax.process_count(),
        process_id=jax.process_index(),
        num_devices=len(devs),
        local_devices=len(jax.local_devices()),
        platform=devs[0].platform if devs else "none",
        device_kind=devs[0].device_kind if devs else "none",
    )
