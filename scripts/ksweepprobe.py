"""Sweep-kernel cost attribution probe (timing-only kernel variants).

The v6 one-shot sweep runs ~6 ms at 1M/k70 while the same gathers in the
spmv kernel take 1.9 ms.  This probe times WRONG-but-shaped variants to
attribute the difference:

  base     — the production sweep kernel (oracle)
  hoist    — scratch x loads hoisted out of the MB-block loop (stale
             reads; times the cost of the 16 serialized per-block loads)
  nodot    — skip the one-shot MXU dot (x += tvec)
  nogather — skip gather+reduce (tvec = b - lagc*xlag)

Uses the cached seg-1 operator (scripts/kcache.py build).
"""

import functools
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402
from scripts import kcache  # noqa: E402


def make_sweep_variant(mode):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from meshlessmultigridpoisson_tpu.ops.kernels6 import (
        GMAX, LANES, MB, _gather_rows, _vpu_reduce, _lanesel, _groupsel, _i32,
        _lane_gather,
    )

    def kern(pid_ref, xlag_ref, vals_ref, lcols_ref, perm_ref, kinvT_ref,
             lanesel_ref, groupsel_ref, b_ref, lagc_ref, x_in_ref, x_out_ref,
             scratch, *, t, w):
        i = pl.program_id(0)
        xlag = xlag_ref[0]

        @pl.when(i == _i32(0))
        def _():
            x_out_ref[...] = x_in_ref[...]

        if mode == "hoist":
            for k in range(GMAX):
                scratch[k, :] = x_out_ref[pid_ref[(i * MB) * GMAX + k], :]

        for j in range(MB):
            bi = i * MB + j

            def body(bs):
                if mode != "hoist":
                    for k in range(GMAX):
                        scratch[k, :] = x_out_ref[pid_ref[bs * GMAX + k], :]
                if mode == "nogather":
                    y = jnp.zeros((1, LANES), jnp.float32)
                else:
                    prod = _gather_rows(
                        scratch[...],
                        lcols_ref[j * t:(j + 1) * t, :].astype(jnp.int32),
                        vals_ref[j * t:(j + 1) * t, :],
                        t,
                    )
                    y_grp = _vpu_reduce(prod, w, lanesel_ref[...],
                                        groupsel_ref[...])
                    y = _lane_gather(y_grp, perm_ref[pl.ds(j, 1), :])
                tvec = (b_ref[pl.ds(j, 1), :] - y
                        - lagc_ref[pl.ds(j, 1), :] * xlag)
                if mode == "nodot":
                    dx = tvec
                else:
                    dx = jnp.dot(tvec, kinvT_ref[j, :, :],
                                 preferred_element_type=jnp.float32,
                                 precision=lax.Precision.HIGHEST)
                x_out_ref[pl.ds(bs, 1), :] = x_out_ref[pl.ds(bs, 1), :] + dx

            body(_i32(bi))

    def run(kell, kinvT_sg, x2, x_lag, b2, lagc2):
        sg = kell.segments[0]
        t = sg.tiles
        lanesel = jnp.asarray(_lanesel())
        groupsel = jnp.asarray(_groupsel())
        z2 = lambda i, pp: (np.int32(0),) * 2
        rowspec_full = pl.BlockSpec(x2.shape, z2, memory_space=pltpu.VMEM)
        xl = jnp.asarray([x_lag], jnp.float32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(sg.nblocks // MB,),
            in_specs=[
                pl.BlockSpec((1,), lambda i, pp: (np.int32(0),),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((MB * t, LANES), lambda i, pp: (i, np.int32(0))),
                pl.BlockSpec((MB * t, LANES), lambda i, pp: (i, np.int32(0))),
                pl.BlockSpec((MB, LANES), lambda i, pp: (i, np.int32(0))),
                pl.BlockSpec((MB, LANES, LANES),
                             lambda i, pp: (i, np.int32(0), np.int32(0))),
                pl.BlockSpec((8, LANES), z2, memory_space=pltpu.VMEM),
                pl.BlockSpec((8, LANES), z2, memory_space=pltpu.VMEM),
                pl.BlockSpec((MB, LANES), lambda i, pp: (i, np.int32(0))),
                pl.BlockSpec((MB, LANES), lambda i, pp: (i, np.int32(0))),
                rowspec_full,
            ],
            out_specs=pl.BlockSpec(x2.shape, z2, memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((GMAX, LANES), jnp.float32)],
        )
        return pl.pallas_call(
            functools.partial(kern, t=t, w=sg.windows),
            out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
            grid_spec=grid_spec,
            input_output_aliases={10: 0},
        )(kell.pids, xl, sg.vals, sg.lcols, kell.perm, kinvT_sg[0],
          lanesel, groupsel, b2, lagc2, x2)

    return run


def main():
    import jax
    import jax.numpy as jnp

    n = 1_048_576
    kell, k32, x0, _ = kcache.load(n, 1)
    dev = jax.devices()[0]
    kd = jax.device_put(kell, dev)
    kvd = jax.device_put(k32, dev)
    nb = kell.nblocks
    xd = jax.device_put(jnp.asarray(x0[: nb * 128], jnp.float32), dev)
    x2 = xd.reshape(nb, 128)
    b2 = jax.device_put(jnp.asarray(
        np.random.default_rng(2).standard_normal((nb, 128)), jnp.float32), dev)
    lagc2 = jax.device_put(jnp.zeros((nb, 128), jnp.float32), dev)

    from meshlessmultigridpoisson_tpu.ops.kernels6 import sor_sweep_tpu6

    dt = bench.chain_delta(
        lambda xx, kk, kv, bb: sor_sweep_tpu6(
            kk, kv, xx, jnp.zeros((), jnp.float32), bb, lagc2),
        x2, kd, kvd, b2)
    bench.log(f"base(prod): {dt*1e3:.3f} ms")

    for mode in ("base", "hoist", "nodot", "nogather"):
        run = make_sweep_variant(mode)
        dt = bench.chain_delta(
            lambda xx, kk, kv, bb: run(
                kk, kv, xx, jnp.zeros((), jnp.float32), bb, lagc2),
            x2, kd, kvd, b2)
        bench.log(f"{mode}: {dt*1e3:.3f} ms")


if __name__ == "__main__":
    main()
