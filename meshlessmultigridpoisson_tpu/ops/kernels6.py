"""v6 Pallas TPU kernels: bucketed-ragged windows + int16 column packing.

The v4 layout (ops/kernels4.py) pays the GLOBAL max windows-per-group W for
every 16-row group: measured mean W ~ 12 vs max ~ 29 on 1M-point RBF-FD
operators, i.e. ~2.4x of pure padding streamed from HBM on an operator
whose hot loop (reference grid.cpp:104-146) is bandwidth-bound.  v6 keeps
v4's single-pass two-stage gather and MXU/VPU reductions but makes the tile
count per 128-row block RAGGED:

  * per-block window count W_b = max over the block's 8 groups, quantized
    onto <= ``max_buckets`` values chosen (exact DP) to minimize total
    padded tiles;
  * one pallas_call per bucket with static T = 8*W_bucket; bucket membership
    is a scalar-prefetched block-id list, so the storage layout of x and all
    row vectors is untouched;
  * column indices are packed (local_patch << 7 | lane) < 2048 and stored
    int16 — 6 B/slot streamed instead of 8.

SpMV writes per-bucket contiguous outputs and restores row order with one
[nb,128]-row take.  The SOR sweep chains the bucket calls over an aliased
whole-x VMEM buffer; within a call, cross-block Gauss-Seidel is exact in
bucket-major block order (``block_order``) — a (block,class,slot)
permutation of the reference's lexicographic SOR with identical fixed point
(see ops/smoothers.py docstring; the XLA oracle `_gs_sweep_ordered` accepts
the same order for bit-level parity tests).
"""

from __future__ import annotations

import dataclasses
import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from meshlessmultigridpoisson_tpu.ops.ell import EllMatrix, global_cols
from meshlessmultigridpoisson_tpu.ops.kernels4 import (
    Ell4Unsupported,
    _i32,
    _lane_gather,
    _selr2,
    _sublane_gather,
    GMAX,
    GROUP,
    LANES,
    WIN,
)

MB = 8  # blocks per program (bucket block lists are padded to a multiple)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("vals", "lcols", "ids"),
    meta_fields=("windows", "nblocks_pad"),
)
@dataclasses.dataclass(frozen=True)
class Bucket:
    vals: jnp.ndarray  # [nbk_pad * T, 128] f32
    lcols: jnp.ndarray  # [nbk_pad * T, 128] i16 (packed patch<<7|lane)
    ids: jnp.ndarray  # [nbk_pad] i32 block ids, -1 padding
    windows: int  # W for this bucket
    nblocks_pad: int  # multiple of MB

    @property
    def tiles(self) -> int:
        return 8 * self.windows


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("buckets", "pids", "perm", "out_order"),
    meta_fields=("nrows", "ncols", "nrows_pad", "block_order_meta"),
)
@dataclasses.dataclass(frozen=True)
class KernelEll6:
    """Bucketed-ragged window layout (see module docstring)."""

    buckets: tuple  # tuple[Bucket, ...]
    pids: jnp.ndarray  # [nb * GMAX] i32 x-patch ids per block
    perm: jnp.ndarray  # [nb, 128] i32 group-order -> row-order lane map
    out_order: jnp.ndarray  # [nb] i32: bucket-concat position of block b
    nrows: int
    ncols: int
    nrows_pad: int
    block_order_meta: tuple  # block processing order (bucket-major), python ints

    @property
    def nblocks(self) -> int:
        return self.nrows_pad // LANES

    @property
    def x_rows(self) -> int:
        return _round_up(self.ncols, LANES) // LANES

    @property
    def block_order(self) -> np.ndarray:
        return np.asarray(self.block_order_meta, dtype=np.int64)

    @property
    def table_bytes(self) -> int:
        return sum(
            b.vals.size * b.vals.dtype.itemsize
            + b.lcols.size * b.lcols.dtype.itemsize
            for b in self.buckets
        )


def _quantize_buckets(wblk: np.ndarray, max_buckets: int) -> np.ndarray:
    """Pick <= max_buckets window values minimizing total padded tiles.

    Exact DP over the sorted distinct values: cost(i..j assigned value v_j)
    = sum_k count_k * (v_j - v_k).
    """
    vals, counts = np.unique(wblk, return_counts=True)
    m = vals.size
    if m <= max_buckets:
        return vals
    # prefix sums for range cost
    csum = np.concatenate([[0], np.cumsum(counts)])
    wsum = np.concatenate([[0], np.cumsum(counts * vals)])

    def cost(i, j):  # assign vals[i..j] the value vals[j]
        return vals[j] * (csum[j + 1] - csum[i]) - (wsum[j + 1] - wsum[i])

    NB = max_buckets
    INF = float("inf")
    dp = np.full((NB + 1, m), INF)
    back = np.zeros((NB + 1, m), dtype=np.int64)
    for j in range(m):
        dp[1, j] = cost(0, j)
    for b in range(2, NB + 1):
        for j in range(m):
            for i in range(j):
                c = dp[b - 1, i] + cost(i + 1, j)
                if c < dp[b, j]:
                    dp[b, j] = c
                    back[b, j] = i
    # backtrack
    cuts = []
    j = m - 1
    b = NB
    while b > 0:
        cuts.append(j)
        j = back[b, j]
        b -= 1
        if j < 0 or (b > 0 and j == cuts[-1]):
            break
    keep = sorted(set(vals[c] for c in cuts) | {vals[-1]})
    return np.asarray(keep)


def prepare_kernel_ell6(
    ell: EllMatrix,
    max_buckets: int = 6,
    dtype=jnp.float32,
) -> KernelEll6:
    """Host-side repack into the bucketed window layout.

    Shares v4's grouping scheme (stencil-centroid 16-row groups, shared
    8-slot windows per (group, patch)) but computes per-block window counts
    and packs per-bucket ragged tile arrays.
    """
    if ell.block_rows % LANES != 0:
        raise Ell4Unsupported("v6 needs 128-row-aligned blocks")
    n_pad = ell.nrows_pad
    nb = n_pad // LANES
    gc = np.asarray(global_cols(ell)).astype(np.int64)
    vv = np.asarray(ell.vals, dtype=np.float64)
    rows_glob = np.arange(n_pad)[:, None]
    patches = gc >> 7

    # ---- spatial grouping (same as v4) --------------------------------------
    real = vv != 0.0
    wsum_r = real.sum(axis=1)
    cent = np.where(
        wsum_r > 0, (gc * real).sum(axis=1) / np.maximum(wsum_r, 1),
        rows_glob[:, 0],
    )
    member_of = np.argsort(cent.reshape(nb, LANES), axis=1, kind="stable")
    perm = np.empty((nb, LANES), dtype=np.int64)
    np.put_along_axis(
        perm, member_of, np.broadcast_to(np.arange(LANES), (nb, LANES)), axis=1
    )
    orig = (member_of + (np.arange(nb) * LANES)[:, None]).ravel()
    w0 = gc.shape[1]
    P = _round_up(ell.ncols, LANES) // LANES

    e_row = np.repeat(np.arange(n_pad, dtype=np.int64), w0)
    e_pat = patches[orig].ravel()
    e_val = vv[orig].ravel()
    e_col = gc[orig].ravel()

    key = e_row * P + e_pat
    o = np.argsort(key, kind="stable")
    e_row, e_pat, e_val, e_col, key = (
        e_row[o], e_pat[o], e_val[o], e_col[o], key[o])

    run_start = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
    run_len = np.diff(np.r_[run_start, key.size])
    pos = np.arange(key.size) - np.repeat(run_start, run_len)
    rp_row = e_row[run_start]
    rp_pat = e_pat[run_start]

    gp_key = (rp_row // GROUP) * P + rp_pat
    og = np.argsort(gp_key, kind="stable")
    gp_sorted = gp_key[og]
    gp_start = np.flatnonzero(np.r_[True, gp_sorted[1:] != gp_sorted[:-1]])
    gp_u = gp_sorted[gp_start]
    gp_max = np.maximum.reduceat(run_len[og], gp_start)
    nw = -(-gp_max // WIN)
    gp_grp = gp_u // P
    gp_pat = gp_u % P
    gp_blk = gp_grp // (LANES // GROUP)

    g_start = np.flatnonzero(np.r_[True, gp_grp[1:] != gp_grp[:-1]])
    g_len = np.diff(np.r_[g_start, nw.size])
    csum = np.cumsum(nw) - nw
    base = csum - np.repeat(csum[g_start], g_len)
    w_per_group = np.zeros(nb * (LANES // GROUP), dtype=np.int64)
    w_per_group[gp_grp[g_start]] = np.add.reduceat(nw, g_start)

    # ---- per-block windows, bucket quantization ------------------------------
    wblk = np.maximum(w_per_group.reshape(nb, LANES // GROUP).max(axis=1), 1)
    bucket_vals = _quantize_buckets(wblk, max_buckets)
    # W assigned to each block = smallest bucket value >= wblk
    bq = bucket_vals[np.searchsorted(bucket_vals, wblk)]

    # ---- per-block patch table (same as v4) ----------------------------------
    bp_key = gp_blk * P + gp_pat
    bp_u = np.unique(bp_key)
    b_of = bp_u // P
    blk_start = np.flatnonzero(np.r_[True, b_of[1:] != b_of[:-1]])
    per_blk = np.diff(np.r_[blk_start, bp_u.size])
    if per_blk.size and per_blk.max() > GMAX:
        raise Ell4Unsupported(
            f"a block has {per_blk.max()} off-block patches > {GMAX}"
        )
    pids = np.zeros((nb, GMAX), dtype=np.int64)
    loc = np.arange(bp_u.size) - np.repeat(blk_start, per_blk)
    pids[b_of, loc] = bp_u % P
    cnt_b = np.zeros(nb, dtype=np.int64)
    cnt_b[b_of[blk_start]] = per_blk
    colr = np.arange(GMAX)
    pids = np.where(colr[None, :] < np.maximum(cnt_b, 1)[:, None],
                    pids, pids[:, :1])
    first_of_blk = np.zeros(nb, dtype=np.int64)
    first_of_blk[b_of[blk_start]] = blk_start
    hi_gp = np.searchsorted(bp_u, bp_key) - first_of_blk[gp_blk]

    # ---- bucket membership + per-block tile offsets ---------------------------
    buckets = []
    block_order = []
    out_order = np.zeros(nb, dtype=np.int64)
    # local tile row of entry inside its block, with the block's own W
    run_gp = np.searchsorted(gp_u, gp_key)
    ent_run = np.repeat(np.arange(rp_row.size), run_len)
    Wrow = bq[(e_row // LANES)]
    wloc = base[run_gp][ent_run] + pos // WIN
    lane = (e_row % GROUP) * WIN + pos % WIN
    trow_in_blk = ((e_row // GROUP) % (LANES // GROUP)) * Wrow + wloc

    pos_total = 0
    for Wk in bucket_vals.tolist():
        blist = np.flatnonzero(bq == Wk)
        if blist.size == 0:
            continue
        T = 8 * Wk
        nbk = blist.size
        nbk_pad = _round_up(nbk, MB)
        vals_k = np.zeros((nbk_pad * T, LANES), dtype=np.float64)
        lcols_k = np.zeros((nbk_pad * T, LANES), dtype=np.int64)
        filled = np.zeros((nbk_pad * T, LANES), dtype=bool)
        # position of each block within this bucket
        bpos = np.full(nb, -1, dtype=np.int64)
        bpos[blist] = np.arange(nbk)
        sel = bpos[e_row // LANES] >= 0
        trow = bpos[e_row[sel] // LANES] * T + trow_in_blk[sel]
        vals_k[trow, lane[sel]] = e_val[sel]
        lcols_k[trow, lane[sel]] = (
            (hi_gp[run_gp][ent_run][sel] << 7) | (e_col[sel] & (LANES - 1))
        )
        filled[trow, lane[sel]] = True
        # rowpat backfill: padding lanes must read the tile row's patch
        gsel = bpos[gp_blk] >= 0
        segpos_all = np.arange(int(nw.sum())) - np.repeat(csum, nw)
        t0 = (bpos[gp_blk] * T
              + (gp_grp % (LANES // GROUP)) * bq[gp_blk] + base)
        rows_idx = np.repeat(np.where(gsel, t0, 0), np.where(gsel, nw, 0))
        pat_rep = np.repeat(np.where(gsel, hi_gp, 0), np.where(gsel, nw, 0))
        seg_sel = np.repeat(gsel, nw)
        rowpat = np.zeros(nbk_pad * T, dtype=np.int64)
        rowpat[rows_idx + segpos_all[seg_sel]] = pat_rep
        lcols_k = np.where(filled, lcols_k, rowpat[:, None] << 7)

        ids = np.full(nbk_pad, -1, dtype=np.int64)
        ids[:nbk] = blist
        out_order[blist] = pos_total + np.arange(nbk)
        pos_total += nbk_pad
        block_order.extend(blist.tolist())
        buckets.append(Bucket(
            vals=jnp.asarray(vals_k, dtype),
            lcols=jnp.asarray(lcols_k.astype(np.int16)),
            ids=jnp.asarray(ids.astype(np.int32)),
            windows=int(Wk),
            nblocks_pad=int(nbk_pad),
        ))

    return KernelEll6(
        buckets=tuple(buckets),
        pids=jnp.asarray(pids.reshape(-1).astype(np.int32)),
        perm=jnp.asarray(perm.astype(np.int32)),
        out_order=jnp.asarray(out_order.astype(np.int32)),
        nrows=ell.nrows,
        ncols=ell.ncols,
        nrows_pad=n_pad,
        block_order_meta=tuple(int(b) for b in block_order),
    )


def _gather_rows(scratch, lcols, vals, t):
    """Off-block entry products for t tile rows: vals * x[cols], [t,128]."""
    hi = lax.shift_right_logical(lcols, _i32(7))
    lo = lax.bitwise_and(lcols, _i32(LANES - 1))
    s8a = scratch[0:8, :]
    s8b = scratch[8:GMAX, :]
    parts = []
    for tt in range(t // 8):
        sl = slice(8 * tt, 8 * tt + 8)
        h8 = lax.bitwise_and(hi[sl], _i32(7))
        ta = _sublane_gather(s8a, h8)
        tb = _sublane_gather(s8b, h8)
        tab = jnp.where(hi[sl] < _i32(8), ta, tb)
        parts.append(_lane_gather(tab, lo[sl]))
    return vals * jnp.concatenate(parts, axis=0)


def _reduce_rows(prod, selr2, gmask, ones_t, precision):
    """[t,128] entry products -> [1,128] group-ordered row sums (MXU)."""
    q = jnp.dot(prod, selr2, preferred_element_type=prod.dtype,
                precision=precision)
    return jnp.dot(ones_t, q * gmask, preferred_element_type=prod.dtype,
                   precision=precision)


def _gmask(t: int, w: int, dtype) -> np.ndarray:
    out = np.zeros((t, LANES))
    for tt in range(t):
        g = tt // w
        out[tt, g * GROUP:(g + 1) * GROUP] = 1.0
    return out.astype(dtype)


# ---------------------------------------------------------------------------
# SpMV
# ---------------------------------------------------------------------------


def _spmv6_kernel(ids_ref, pid_ref, vals_ref, lcols_ref, selr2_ref,
                  gmask_ref, ones_ref, x_ref, out_ref, scratch, *, t,
                  precision):
    i = pl.program_id(0)
    for j in range(MB):
        bi = ids_ref[i * MB + j]
        bsafe = jnp.maximum(bi, _i32(0))

        @pl.when(bi >= _i32(0))
        def _():
            for k in range(GMAX):
                scratch[k, :] = x_ref[pid_ref[bsafe * GMAX + k], :]
            prod = _gather_rows(
                scratch[...],
                lcols_ref[j * t:(j + 1) * t, :].astype(jnp.int32),
                vals_ref[j * t:(j + 1) * t, :],
                t,
            )
            out_ref[pl.ds(j, 1), :] = _reduce_rows(
                prod, selr2_ref[...], gmask_ref[...], ones_ref[...], precision
            )


def spmv_tpu6(kell: KernelEll6, x: jnp.ndarray,
              precision=lax.Precision.HIGHEST) -> jnp.ndarray:
    """y = A @ x; returns [nrows_pad] in row order."""
    dtype = kell.buckets[0].vals.dtype
    xr = kell.x_rows
    xp = jnp.zeros(xr * LANES, dtype).at[: x.shape[0]].set(x.astype(dtype))
    x2 = xp.reshape(xr, LANES)
    selr2 = jnp.asarray(_selr2(np.dtype(dtype)))
    z2 = lambda i, ids, pp: (np.int32(0),) * 2
    outs = []
    for bk in kell.buckets:
        t = bk.tiles
        gmask = jnp.asarray(_gmask(t, bk.windows, np.dtype(dtype)))
        ones_t = jnp.ones((1, t), dtype)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bk.nblocks_pad // MB,),
            in_specs=[
                pl.BlockSpec((MB * t, LANES),
                             lambda i, ids, pp: (i, np.int32(0))),
                pl.BlockSpec((MB * t, LANES),
                             lambda i, ids, pp: (i, np.int32(0))),
                pl.BlockSpec((LANES, LANES), z2, memory_space=pltpu.VMEM),
                pl.BlockSpec((t, LANES), z2, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, t), z2, memory_space=pltpu.VMEM),
                pl.BlockSpec(x2.shape, z2, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((MB, LANES),
                                   lambda i, ids, pp: (i, np.int32(0))),
            scratch_shapes=[pltpu.VMEM((GMAX, LANES), dtype)],
        )
        out_k = pl.pallas_call(
            functools.partial(_spmv6_kernel, t=t, precision=precision),
            out_shape=jax.ShapeDtypeStruct((bk.nblocks_pad, LANES), dtype),
            grid_spec=grid_spec,
        )(bk.ids, kell.pids, bk.vals, bk.lcols, selr2, gmask, ones_t, x2)
        outs.append(out_k)
    cat = jnp.concatenate(outs, axis=0)
    y_grp = jnp.take(cat, kell.out_order, axis=0)  # [nb,128] group-ordered
    y = _lane_gather(y_grp, kell.perm)  # restore row order within blocks
    return y.reshape(-1)


# ---------------------------------------------------------------------------
# one-shot SOR sweep (v5 semantics: x += K (b - A x - lag))
# ---------------------------------------------------------------------------


def _sweep6_kernel(ids_ref, pid_ref, xlag_ref, vals_ref, lcols_ref, perm_ref,
                   kinvT_ref, selr2_ref, gmask_ref, ones_ref, b_ref,
                   lagc_ref, x_in_ref, x_out_ref, scratch, *, t, first,
                   precision):
    i = pl.program_id(0)
    xlag = xlag_ref[0]
    if first:
        @pl.when(i == _i32(0))
        def _():
            x_out_ref[...] = x_in_ref[...]

    for j in range(MB):
        bi = ids_ref[i * MB + j]
        bsafe = jnp.maximum(bi, _i32(0))

        @pl.when(bi >= _i32(0))
        def _():
            for k in range(GMAX):
                scratch[k, :] = x_out_ref[pid_ref[bsafe * GMAX + k], :]
            prod = _gather_rows(
                scratch[...],
                lcols_ref[j * t:(j + 1) * t, :].astype(jnp.int32),
                vals_ref[j * t:(j + 1) * t, :],
                t,
            )
            y_grp = _reduce_rows(
                prod, selr2_ref[...], gmask_ref[...], ones_ref[...], precision
            )
            y = _lane_gather(y_grp, perm_ref[pl.ds(bsafe, 1), :])
            tvec = (b_ref[pl.ds(bsafe, 1), :] - y
                    - lagc_ref[pl.ds(bsafe, 1), :] * xlag)
            dx = jnp.dot(tvec, kinvT_ref[j, :, :],
                         preferred_element_type=tvec.dtype,
                         precision=lax.Precision.HIGHEST)
            x_out_ref[pl.ds(bsafe, 1), :] = x_out_ref[pl.ds(bsafe, 1), :] + dx


def sor_sweep_tpu6(
    kell: KernelEll6,
    kinvT_bk: tuple,  # per-bucket [nbk_pad,128,128] one-shot matrices
    x2: jnp.ndarray,  # [nblocks, 128]
    x_lag: jnp.ndarray,
    b2: jnp.ndarray,
    lagc2: jnp.ndarray,
    precision=lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """One exact GS sweep in bucket-major block order; updated [nb,128] x."""
    dtype = kell.buckets[0].vals.dtype
    selr2 = jnp.asarray(_selr2(np.dtype(dtype)))
    z2 = lambda i, ids, pp: (np.int32(0),) * 2
    rowspec_full = pl.BlockSpec(x2.shape, z2, memory_space=pltpu.VMEM)
    xl = jnp.asarray([x_lag], dtype)
    for bi_k, bk in enumerate(kell.buckets):
        t = bk.tiles
        gmask = jnp.asarray(_gmask(t, bk.windows, np.dtype(dtype)))
        ones_t = jnp.ones((1, t), dtype)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bk.nblocks_pad // MB,),
            in_specs=[
                pl.BlockSpec((1,), lambda i, ids, pp: (np.int32(0),),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((MB * t, LANES),
                             lambda i, ids, pp: (i, np.int32(0))),
                pl.BlockSpec((MB * t, LANES),
                             lambda i, ids, pp: (i, np.int32(0))),
                pl.BlockSpec(kell.perm.shape, z2, memory_space=pltpu.VMEM),
                pl.BlockSpec((MB, LANES, LANES),
                             lambda i, ids, pp: (i, np.int32(0), np.int32(0))),
                pl.BlockSpec((LANES, LANES), z2, memory_space=pltpu.VMEM),
                pl.BlockSpec((t, LANES), z2, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, t), z2, memory_space=pltpu.VMEM),
                rowspec_full,
                rowspec_full,
                rowspec_full,
            ],
            out_specs=pl.BlockSpec(x2.shape, z2, memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((GMAX, LANES), dtype)],
        )
        x2 = pl.pallas_call(
            functools.partial(_sweep6_kernel, t=t, first=True,
                              precision=precision),
            out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
            grid_spec=grid_spec,
            input_output_aliases={12: 0},
        )(
            bk.ids, kell.pids, xl, bk.vals, bk.lcols, kell.perm,
            kinvT_bk[bi_k], selr2, gmask, ones_t, b2, lagc2, x2,
        )
    return x2


def pack_oneshot_K6(kell: KernelEll6, kinvT: np.ndarray, dtype=jnp.float32):
    """Regroup [nb,128,128] one-shot matrices into per-bucket padded arrays."""
    out = []
    for bk in kell.buckets:
        ids = np.asarray(bk.ids)
        kk = np.zeros((bk.nblocks_pad, LANES, LANES), dtype=np.float64)
        sel = ids >= 0
        kk[np.nonzero(sel)[0]] = np.asarray(kinvT)[ids[sel]]
        out.append(jnp.asarray(kk, dtype))
    return tuple(out)
