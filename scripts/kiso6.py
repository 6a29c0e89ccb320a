"""Isolate the v6 slowdown: i16 vs i32 lcols, pl.when vs unconditional."""

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
from meshlessmultigridpoisson_tpu.ops import kernels6 as k6
from meshlessmultigridpoisson_tpu.ops.kernels4 import (
    _selr2, GMAX, LANES,
)


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


def _kernel(ids_ref, pid_ref, vals_ref, lcols_ref, selr2_ref,
            gmask_ref, ones_ref, x_ref, out_ref, scratch, *, t,
            use_when, i16):
    i = pl.program_id(0)
    for j in range(k6.MB):
        bi = ids_ref[i * k6.MB + j]
        bsafe = jnp.maximum(bi, jnp.int32(0))

        def body():
            for k in range(GMAX):
                scratch[k, :] = x_ref[pid_ref[bsafe * GMAX + k], :]
            lc = lcols_ref[j * t:(j + 1) * t, :]
            if i16:
                lc = lc.astype(jnp.int32)
            prod = k6._gather_rows(
                scratch[...], lc, vals_ref[j * t:(j + 1) * t, :], t)
            out_ref[pl.ds(j, 1), :] = k6._reduce_rows(
                prod, selr2_ref[...], gmask_ref[...], ones_ref[...],
                lax.Precision.HIGHEST)

        if use_when:
            pl.when(bi >= jnp.int32(0))(body)
        else:
            body()


def spmv_var(kell, x, use_when, i16):
    dtype = kell.buckets[0].vals.dtype
    xr = kell.x_rows
    xp = jnp.zeros(xr * LANES, dtype).at[: x.shape[0]].set(x.astype(dtype))
    x2 = xp.reshape(xr, LANES)
    selr2 = jnp.asarray(_selr2(np.dtype(dtype)))
    z2 = lambda i, ids, pp: (np.int32(0),) * 2
    outs = []
    for bk in kell.buckets:
        t = bk.tiles
        gmask = jnp.asarray(k6._gmask(t, bk.windows, np.dtype(dtype)))
        ones_t = jnp.ones((1, t), dtype)
        lcols = bk.lcols if i16 else bk.lcols.astype(jnp.int32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bk.nblocks_pad // k6.MB,),
            in_specs=[
                pl.BlockSpec((k6.MB * t, LANES),
                             lambda i, ids, pp: (i, np.int32(0))),
                pl.BlockSpec((k6.MB * t, LANES),
                             lambda i, ids, pp: (i, np.int32(0))),
                pl.BlockSpec((LANES, LANES), z2, memory_space=pltpu.VMEM),
                pl.BlockSpec((t, LANES), z2, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, t), z2, memory_space=pltpu.VMEM),
                pl.BlockSpec(x2.shape, z2, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((k6.MB, LANES),
                                   lambda i, ids, pp: (i, np.int32(0))),
            scratch_shapes=[pltpu.VMEM((GMAX, LANES), dtype)],
        )
        out_k = pl.pallas_call(
            functools.partial(_kernel, t=t, use_when=use_when, i16=i16),
            out_shape=jax.ShapeDtypeStruct((bk.nblocks_pad, LANES), dtype),
            grid_spec=grid_spec,
        )(bk.ids, kell.pids, bk.vals, lcols, selr2, gmask, ones_t, x2)
        outs.append(out_k)
    cat = jnp.concatenate(outs, axis=0)
    y_grp = jnp.take(cat, kell.out_order, axis=0)
    from meshlessmultigridpoisson_tpu.ops.kernels4 import _lane_gather
    y = _lane_gather(y_grp, kell.perm)
    return y.reshape(-1)


def main():
    n = 262_144
    a = synthetic_banded_csr(n, 70, 512)
    ell = ell_from_csr(a, block_rows=128)
    nnz = n * 70
    for mbuck in (6, 1):
        kell = k6.prepare_kernel_ell6(ell, max_buckets=mbuck)
        tb = kell.table_bytes
        print(f"buckets={[(b.windows, b.nblocks_pad) for b in kell.buckets]} "
              f"{tb/1e6:.0f}MB", flush=True)
        x = jnp.asarray(
            np.random.default_rng(1).standard_normal(ell.nrows_pad), jnp.float32)
        for use_when in (True, False):
            for i16 in (True, False):
                tb_eff = tb if i16 else int(tb * 8 / 6)
                op = lambda xx, kk: spmv_var(kk, xx, use_when, i16)
                t1 = med_time(chain(op, 1), x, kell)
                tk = med_time(chain(op, 16), x, kell)
                dt = (tk - t1) / 15
                print(f"when={use_when} i16={i16}: {dt*1e3:8.3f} ms "
                      f"{nnz/dt/1e9:6.2f} Gnnz/s {tb_eff/dt/1e9:6.1f} GB/s",
                      flush=True)


if __name__ == "__main__":
    main()
