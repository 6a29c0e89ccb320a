"""Bisect the prefetched-ids slowdown: v4-clone vs +unused-ids vs +bi-from-ids."""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from bench import synthetic_banded_csr
from meshlessmultigridpoisson_tpu.ops.ell import ell_from_csr
from meshlessmultigridpoisson_tpu.ops import kernels4 as k4
from meshlessmultigridpoisson_tpu.ops.kernels4 import _selr2, _gmask, GMAX, LANES


def med_time(f, *args, reps=5):
    np.asarray(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def chain(op, k):
    def f(x, *sa):
        y = op(x, *sa)
        for _ in range(k - 1):
            y = op(y * 1.0000001, *sa)
        return y.reshape(-1)[:128]
    return jax.jit(f)


def _kern(pid_ref, ids_ref, vals_ref, lcols_ref, perm_ref, selr2_ref,
          gmask_ref, ones_ref, x_ref, out_ref, scratch, *, t, mb, mode):
    i = pl.program_id(0)
    for j in range(mb):
        if mode == "affine":
            bi = i * mb + j
        else:
            bi = ids_ref[i * mb + j]
        for k in range(GMAX):
            scratch[k, :] = x_ref[pid_ref[bi * GMAX + k], :]
        y_grp = k4._gather_block(
            scratch[...],
            lcols_ref[j * t:(j + 1) * t, :],
            vals_ref[j * t:(j + 1) * t, :],
            selr2_ref[...], gmask_ref[...], ones_ref[...],
        )
        out_ref[pl.ds(j, 1), :] = k4._lane_gather(
            y_grp, perm_ref[pl.ds(j, 1), :])


def spmv_var(kell, x, mode):
    dtype = kell.vals_flat.dtype
    xr = kell.x_rows
    xp = jnp.zeros(xr * LANES, dtype).at[: x.shape[0]].set(x.astype(dtype))
    x2 = xp.reshape(xr, LANES)
    t, mb, nb = kell.tiles_per_block, kell.mb, kell.nblocks
    selr2 = jnp.asarray(_selr2(np.dtype(dtype)))
    gmask = jnp.asarray(_gmask(t, kell.windows, np.dtype(dtype)))
    ones_t = jnp.ones((1, t), dtype)
    ids = jnp.arange(nb, dtype=jnp.int32)
    z2 = lambda i, pp, ids: (np.int32(0),) * 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb // mb,),
        in_specs=[
            pl.BlockSpec((mb * t, LANES), lambda i, pp, ids: (i, np.int32(0))),
            pl.BlockSpec((mb * t, LANES), lambda i, pp, ids: (i, np.int32(0))),
            pl.BlockSpec((mb, LANES), lambda i, pp, ids: (i, np.int32(0))),
            pl.BlockSpec((LANES, LANES), z2, memory_space=pltpu.VMEM),
            pl.BlockSpec((t, LANES), z2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t), z2, memory_space=pltpu.VMEM),
            pl.BlockSpec(x2.shape, z2, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((mb, LANES), lambda i, pp, ids: (i, np.int32(0))),
        scratch_shapes=[pltpu.VMEM((GMAX, LANES), dtype)],
    )
    out = pl.pallas_call(
        functools.partial(_kern, t=t, mb=mb, mode=mode),
        out_shape=jax.ShapeDtypeStruct((nb, LANES), dtype),
        grid_spec=grid_spec,
    )(kell.pids, ids, kell.vals_flat, kell.lcols_flat, kell.perm, selr2,
      gmask, ones_t, x2)
    return out.reshape(-1)


def main():
    n = 262_144
    a = synthetic_banded_csr(n, 70, 512)
    ell = ell_from_csr(a, block_rows=128)
    nnz = n * 70
    kell = k4.prepare_kernel_ell4(ell)
    tb = kell.nblocks * kell.tiles_per_block * LANES * 8
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal(ell.nrows_pad), jnp.float32)

    op0 = lambda xx, kk: k4.spmv_tpu4(kk, xx)[: ell.nrows_pad]
    t1 = med_time(chain(op0, 1), x, kell)
    tk = med_time(chain(op0, 16), x, kell)
    dt = (tk - t1) / 15
    print(f"v4 stock    : {dt*1e3:8.3f} ms {nnz/dt/1e9:6.2f} Gnnz/s "
          f"{tb/dt/1e9:6.1f} GB/s", flush=True)

    for mode in ("affine", "ids"):
        op = lambda xx, kk: spmv_var(kk, xx, mode)
        t1 = med_time(chain(op, 1), x, kell)
        tk = med_time(chain(op, 16), x, kell)
        dt = (tk - t1) / 15
        print(f"v4 {mode:9s}: {dt*1e3:8.3f} ms {nnz/dt/1e9:6.2f} Gnnz/s "
              f"{tb/dt/1e9:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
