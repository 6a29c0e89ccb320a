"""Single-TPU timing: sharded(P=1, v6 kernels) vs unsharded v6 backend.

VERDICT round-1 item 3's closing measurement: with the fine level's
interior sweep and matvec dispatched to the same v6 Pallas kernels, a
1-shard sharded V-cycle should cost within ~10% of the unsharded TPU
backend cycle (the sharded path adds only layout glue at P=1: pad/concat,
trivial psums).

Usage: python scripts/shard_timing.py [--sizes 2500 10000] [--deg 4]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

import meshlessmultigridpoisson_tpu  # noqa: F401  (x64 on)


def timed(fn, reps=7):
    np.asarray(fn())  # warm/compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[2500, 10000])
    ap.add_argument("--deg", type=int, default=4)
    ap.add_argument("--cycles", type=int, default=20)
    ap.add_argument("--out", default="results/shard_timing_r2.json")
    args = ap.parse_args()

    from meshlessmultigridpoisson_tpu.models.poisson import make_poisson_problem
    from meshlessmultigridpoisson_tpu.mg import vcycle as vc
    from meshlessmultigridpoisson_tpu.mg.tpu_backend import tpu_hierarchy
    from meshlessmultigridpoisson_tpu.parallel import (
        make_sharded_vcycle,
        partition_hierarchy,
    )
    from meshlessmultigridpoisson_tpu.parallel.partition import hierarchy_to_f32
    from meshlessmultigridpoisson_tpu.parallel.sharded import AXIS, shard_vector

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}", file=sys.stderr)
    prob = make_poisson_problem("square", sizes=list(args.sizes),
                                poly_deg=args.deg, neumann=False)
    K = args.cycles

    # --- unsharded v6 backend ------------------------------------------------
    thier = tpu_hierarchy(prob.hierarchy)
    state32 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32) if a.dtype == jnp.float64 else a,
        prob.state0,
    )

    @jax.jit
    def cycles_unsharded(st):
        for _ in range(K):
            st, r = vc.v_cycle(thier, st)
        return st.x[-1][:128], r

    t_un = timed(lambda: cycles_unsharded(state32)[0]) / K

    # --- sharded P=1, kernel dispatch ---------------------------------------
    mesh = Mesh(np.array([dev]), (AXIS,))
    shier = hierarchy_to_f32(
        partition_hierarchy(prob.hierarchy, 1, kernels=True))
    assert shier.fine.has_kernels
    cycle_k = make_sharded_vcycle(shier, mesh)
    op = prob.hierarchy.finest
    b_log = np.asarray(op.to_logical(prob.state0.b[-1]))
    bf = shard_vector(shier, mesh, b_log).astype(jnp.float32)

    @jax.jit
    def cycles_sharded(xf):
        xl = jnp.zeros((), jnp.float32)
        bl = jnp.zeros((), jnp.float32)
        for _ in range(K):
            xf, xl, r = cycle_k(xf, xl, bf, bl)
        return xf[:128], r

    t_sh = timed(lambda: cycles_sharded(jnp.zeros_like(bf))[0]) / K

    row = dict(
        device=str(dev.device_kind), sizes=list(args.sizes), deg=args.deg,
        cycles=K,
        unsharded_ms_per_cycle=t_un * 1e3,
        sharded1_ms_per_cycle=t_sh * 1e3,
        overhead_pct=(t_sh / t_un - 1) * 100,
    )
    print(json.dumps(row))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(row, f, indent=1)


if __name__ == "__main__":
    main()
