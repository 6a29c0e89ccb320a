"""Reduction-path shootout for the windowed-gather kernels.

Per 128-row block the kernels must turn prod[T,128] (T=8W tile rows, lane
l = member(l//8) slot(l%8) of group t//W) into [1,128] row sums in group
order.  Candidates:
  mxu      : v4's two HIGHEST dots (selr2 then masked ones) — baseline
  mxu-def  : same at DEFAULT precision (bf16 1-pass; numerics off — bound)
  vpu      : reshape (8,W,128) sum over W, 3 cyclic-roll slot reduce,
             then two tiny constant-index gathers for placement
"""

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
from meshlessmultigridpoisson_tpu.ops.ell import ell_from_csr, spmv as spmv_oracle
from meshlessmultigridpoisson_tpu.ops import kernels4 as k4
from meshlessmultigridpoisson_tpu.ops.kernels4 import (
    _selr2, _gmask, _sublane_gather, _lane_gather, GMAX, GROUP, LANES, WIN,
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


def _vpu_reduce(prod, w, lanesel_ref, groupsel_ref):
    """[T,128] -> [1,128] group-ordered row sums on the VPU.

    1. acc[g, :] = sum_w prod[g*W+w, :]                (reshape + sum)
    2. 3 cyclic rolls: lane 8j of acc[g] = member-j sum of group g
    3. lane gather lanesel (l -> 8*(l%16)) then sublane gather groupsel
       (l -> l//16) places member sums at lane g*16+j.
    """
    t = prod.shape[0]
    acc = jnp.sum(prod.reshape(8, w, LANES), axis=1)  # [8,128]
    from jax.experimental.pallas import tpu as pltpu
    r = acc + pltpu.roll(acc, jnp.int32(LANES - 1), 1)
    r = r + pltpu.roll(r, jnp.int32(LANES - 2), 1)
    r = r + pltpu.roll(r, jnp.int32(LANES - 4), 1)  # lane 8j holds sum of lanes 8j..8j+7
    tmp = _lane_gather(r, lanesel_ref[...])  # [8,128]: lane l <- 8*(l%16)
    out8 = _sublane_gather(tmp, groupsel_ref[...])  # [8,128], rows identical
    return out8[0:1, :]


def _kern(pid_ref, vals_ref, lcols_ref, perm_ref, selr2_ref, gmask_ref,
          ones_ref, lanesel_ref, groupsel_ref, x_ref, out_ref, scratch,
          *, t, mb, w, mode):
    i = pl.program_id(0)
    for j in range(mb):
        bi = i * mb + j
        for k in range(GMAX):
            scratch[k, :] = x_ref[pid_ref[bi * GMAX + k], :]
        lc = lcols_ref[j * t:(j + 1) * t, :]
        vv = vals_ref[j * t:(j + 1) * t, :]
        hi = lax.shift_right_logical(lc, jnp.int32(7))
        lo = lax.bitwise_and(lc, jnp.int32(LANES - 1))
        s8a = scratch[0:8, :]
        s8b = scratch[8:GMAX, :]
        parts = []
        for tt in range(t // 8):
            sl = slice(8 * tt, 8 * tt + 8)
            h8 = lax.bitwise_and(hi[sl], jnp.int32(7))
            ta = _sublane_gather(s8a, h8)
            tb = _sublane_gather(s8b, h8)
            tab = jnp.where(hi[sl] < jnp.int32(8), ta, tb)
            parts.append(_lane_gather(tab, lo[sl]))
        prod = vv * jnp.concatenate(parts, axis=0)
        if mode == "vpu":
            y_grp = _vpu_reduce(prod, w, lanesel_ref, groupsel_ref)
        else:
            prec = (lax.Precision.HIGHEST if mode == "mxu"
                    else lax.Precision.DEFAULT)
            q = jnp.dot(prod, selr2_ref[...], preferred_element_type=prod.dtype,
                        precision=prec)
            y_grp = jnp.dot(ones_ref[...], q * gmask_ref[...],
                            preferred_element_type=prod.dtype, precision=prec)
        out_ref[pl.ds(j, 1), :] = _lane_gather(y_grp, perm_ref[pl.ds(j, 1), :])


def spmv_var(kell, x, mode):
    dtype = kell.vals_flat.dtype
    xr = kell.x_rows
    xp = jnp.zeros(xr * LANES, dtype).at[: x.shape[0]].set(x.astype(dtype))
    x2 = xp.reshape(xr, LANES)
    t, mb, nb = kell.tiles_per_block, kell.mb, kell.nblocks
    w = kell.windows
    selr2 = jnp.asarray(_selr2(np.dtype(dtype)))
    gmask = jnp.asarray(_gmask(t, w, np.dtype(dtype)))
    ones_t = jnp.ones((1, t), dtype)
    lanesel = jnp.asarray(
        np.broadcast_to(8 * (np.arange(LANES) % GROUP), (8, LANES)).astype(np.int32))
    groupsel = jnp.asarray(np.broadcast_to(np.arange(LANES) // GROUP, (8, LANES)).astype(np.int32))
    z2 = lambda i, pp: (np.int32(0),) * 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb // mb,),
        in_specs=[
            pl.BlockSpec((mb * t, LANES), lambda i, pp: (i, np.int32(0))),
            pl.BlockSpec((mb * t, LANES), lambda i, pp: (i, np.int32(0))),
            pl.BlockSpec((mb, LANES), lambda i, pp: (i, np.int32(0))),
            pl.BlockSpec((LANES, LANES), z2, memory_space=pltpu.VMEM),
            pl.BlockSpec((t, LANES), z2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t), z2, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANES), z2, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANES), z2, memory_space=pltpu.VMEM),
            pl.BlockSpec(x2.shape, z2, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((mb, LANES), lambda i, pp: (i, np.int32(0))),
        scratch_shapes=[pltpu.VMEM((GMAX, LANES), dtype)],
    )
    out = pl.pallas_call(
        functools.partial(_kern, t=t, mb=mb, w=w, mode=mode),
        out_shape=jax.ShapeDtypeStruct((nb, LANES), dtype),
        grid_spec=grid_spec,
    )(kell.pids, kell.vals_flat, kell.lcols_flat, kell.perm, selr2,
      gmask, ones_t, lanesel, groupsel, x2)
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
    yref = np.asarray(spmv_oracle(ell.astype(jnp.float64),
                                  x.astype(jnp.float64)))[:8192]
    for mode in ("mxu", "vpu", "mxu-def"):
        op = lambda xx, kk: spmv_var(kk, xx, mode)
        y = np.asarray(jax.jit(op)(x, kell))[:8192]
        err = np.abs(y - yref).max() / np.abs(yref).max()
        t1 = med_time(chain(op, 1), x, kell)
        tk = med_time(chain(op, 16), x, kell)
        dt = (tk - t1) / 15
        print(f"{mode:8s}: {dt*1e3:8.3f} ms {nnz/dt/1e9:6.2f} Gnnz/s "
              f"{tb/dt/1e9:6.1f} GB/s  err={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
