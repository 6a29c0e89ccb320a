"""On-device kernel bottleneck probe (round 2).

Measures, on the live TPU:
  1. pure-stream ceiling: a Pallas kernel that streams [T,128] f32+i32
     tables through VMEM doing one add — the achievable HBM GB/s for the
     exact access pattern the SpMV/sweep kernels use;
  2. v4 SpMV as-is;
  3. v4 SpMV with the two-stage gather replaced by a direct slab read
     (isolates gather cost);
  4. v4 SpMV with the selr2/gmask MXU reduction replaced by a cheap sum
     (isolates the HIGHEST-precision MXU reduction cost).

Run:  python scripts/kprobe.py [n]
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

sys.path.insert(0, ".")
from bench import synthetic_banded_csr, timeit  # noqa: E402
from meshlessmultigridpoisson_tpu.ops.ell import ell_from_csr  # noqa: E402
from meshlessmultigridpoisson_tpu.ops import kernels4 as k4  # noqa: E402

LANES = 128


def log(*a):
    print(*a, flush=True)


# ---------------------------------------------------------------------------
# 1. pure-stream ceiling
# ---------------------------------------------------------------------------

def _stream_kernel(v_ref, c_ref, o_ref):
    s = jnp.sum(v_ref[...], axis=0, keepdims=True) + jnp.sum(
        c_ref[...], axis=0, keepdims=True, dtype=jnp.int32
    ).astype(jnp.float32)
    o_ref[...] = jnp.broadcast_to(s, o_ref.shape)


def stream_bench(total_tiles: int, tiles_per_prog: int):
    v = jnp.ones((total_tiles, LANES), jnp.float32)
    c = jnp.ones((total_tiles, LANES), jnp.int32)
    grid = total_tiles // tiles_per_prog
    f = pl.pallas_call(
        _stream_kernel,
        out_shape=jax.ShapeDtypeStruct((grid * 8, LANES), jnp.float32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tiles_per_prog, LANES), lambda i: (i, np.int32(0))),
            pl.BlockSpec((tiles_per_prog, LANES), lambda i: (i, np.int32(0))),
        ],
        out_specs=pl.BlockSpec((8, LANES), lambda i: (i, np.int32(0))),
    )
    fj = jax.jit(f)
    dt = timeit(fj, v, c)
    gb = total_tiles * LANES * 8 / dt / 1e9
    log(f"stream tiles/prog={tiles_per_prog:5d}: {dt*1e3:8.3f} ms  {gb:7.1f} GB/s")
    return gb


# ---------------------------------------------------------------------------
# v4 variants
# ---------------------------------------------------------------------------

def _spmv4_kernel_var(pid_ref, vals_ref, lcols_ref, perm_ref, selr2_ref,
                      gmask_ref, ones_ref, x_ref, out_ref, scratch,
                      *, t, mb, no_gather, no_mxu):
    i = pl.program_id(0)
    for j in range(mb):
        bi = i * mb + j
        for k in range(k4.GMAX):
            scratch[k, :] = x_ref[pid_ref[bi * k4.GMAX + k], :]
        lc = lcols_ref[j * t:(j + 1) * t, :]
        vv = vals_ref[j * t:(j + 1) * t, :]
        if no_gather:
            gx = lc.astype(jnp.float32) * 1e-9  # touch lcols, skip gather
        else:
            hi = lax.shift_right_logical(lc, jnp.int32(7))
            lo = lax.bitwise_and(lc, jnp.int32(LANES - 1))
            s8a = scratch[0:8, :]
            s8b = scratch[8:k4.GMAX, :]
            parts = []
            for tt in range(t // 8):
                sl = slice(8 * tt, 8 * tt + 8)
                h8 = lax.bitwise_and(hi[sl], jnp.int32(7))
                ta = k4._sublane_gather(s8a, h8)
                tb = k4._sublane_gather(s8b, h8)
                tab = jnp.where(hi[sl] < jnp.int32(8), ta, tb)
                parts.append(k4._lane_gather(tab, lo[sl]))
            gx = jnp.concatenate(parts, axis=0)
        prod = vv * gx
        if no_mxu:
            y_grp = jnp.sum(prod, axis=0, keepdims=True)
        else:
            q = jnp.dot(prod, selr2_ref[...], preferred_element_type=prod.dtype,
                        precision=lax.Precision.HIGHEST)
            y_grp = jnp.dot(ones_ref[...], q * gmask_ref[...],
                            preferred_element_type=prod.dtype,
                            precision=lax.Precision.HIGHEST)
        out_ref[pl.ds(j, 1), :] = k4._lane_gather(y_grp, perm_ref[pl.ds(j, 1), :])


def spmv4_variant(kell, x, no_gather=False, no_mxu=False, precision=None):
    dtype = kell.vals_flat.dtype
    xr = kell.x_rows
    xp = jnp.zeros(xr * LANES, dtype).at[: x.shape[0]].set(x.astype(dtype))
    x2 = xp.reshape(xr, LANES)
    t, mb, nb = kell.tiles_per_block, kell.mb, kell.nblocks
    selr2 = jnp.asarray(k4._selr2(np.dtype(dtype)))
    gmask = jnp.asarray(k4._gmask(t, kell.windows, np.dtype(dtype)))
    ones_t = jnp.ones((1, t), dtype)
    z2 = lambda i, ws: (np.int32(0),) * 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb // mb,),
        in_specs=[
            pl.BlockSpec((mb * t, LANES), lambda i, ws: (i, np.int32(0))),
            pl.BlockSpec((mb * t, LANES), lambda i, ws: (i, np.int32(0))),
            pl.BlockSpec((mb, LANES), lambda i, ws: (i, np.int32(0))),
            pl.BlockSpec((LANES, LANES), z2, memory_space=pltpu.VMEM),
            pl.BlockSpec((t, LANES), z2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t), z2, memory_space=pltpu.VMEM),
            pl.BlockSpec(x2.shape, z2, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((mb, LANES), lambda i, ws: (i, np.int32(0))),
        scratch_shapes=[pltpu.VMEM((k4.GMAX, LANES), dtype)],
    )
    out = pl.pallas_call(
        functools.partial(_spmv4_kernel_var, t=t, mb=mb,
                          no_gather=no_gather, no_mxu=no_mxu),
        out_shape=jax.ShapeDtypeStruct((nb, LANES), dtype),
        grid_spec=grid_spec,
    )(kell.pids, kell.vals_flat, kell.lcols_flat, kell.perm, selr2, gmask,
      ones_t, x2)
    return out.reshape(-1)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262_144
    k, band = 70, 512
    dev = jax.devices()[0]
    log(f"device: {dev}  n={n} k={k}")

    log("-- pure-stream ceiling (f32+i32 tables) --")
    for tpp in (64, 256, 1024, 4096):
        stream_bench(1 << 19, tpp)  # 512Ki tiles = 512 MB

    a = synthetic_banded_csr(n, k, band)
    ell = ell_from_csr(a, block_rows=128)
    kell = k4.prepare_kernel_ell4(ell)
    log(f"v4 layout: W={kell.windows} T={kell.tiles_per_block} mb={kell.mb} "
        f"nblocks={kell.nblocks}")
    # window distribution: recompute per-block max windows for raggedness info
    nnz = n * k
    table_bytes = kell.nblocks * kell.tiles_per_block * LANES * 8

    x = jnp.asarray(np.random.default_rng(1).standard_normal(n), jnp.float32)

    f_full = jax.jit(lambda kk, xx: k4.spmv_tpu4(kk, xx))
    dt = timeit(f_full, kell, x)
    log(f"v4 spmv full     : {dt*1e3:8.3f} ms  {nnz/dt/1e9:6.2f} Gnnz/s  "
        f"{table_bytes/dt/1e9:6.1f} GB/s(table)")

    f_ng = jax.jit(lambda kk, xx: spmv4_variant(kk, xx, no_gather=True))
    dt = timeit(f_ng, kell, x)
    log(f"v4 spmv no-gather: {dt*1e3:8.3f} ms  {table_bytes/dt/1e9:6.1f} GB/s(table)")

    f_nm = jax.jit(lambda kk, xx: spmv4_variant(kk, xx, no_mxu=True))
    dt = timeit(f_nm, kell, x)
    log(f"v4 spmv no-mxu   : {dt*1e3:8.3f} ms  {table_bytes/dt/1e9:6.1f} GB/s(table)")

    f_nn = jax.jit(lambda kk, xx: spmv4_variant(kk, xx, no_gather=True, no_mxu=True))
    dt = timeit(f_nn, kell, x)
    log(f"v4 spmv neither  : {dt*1e3:8.3f} ms  {table_bytes/dt/1e9:6.1f} GB/s(table)")


if __name__ == "__main__":
    main()
