"""v4 Pallas TPU kernels: window-aligned gather + MXU in-block Gauss-Seidel.

Motivation (measured on the target device, see RESULTS.md): the v2 kernels'
SpMV is already near this machine's effective streaming roofline, but the
SOR sweep spends ~4x its streaming floor on per-class small-vector work
(G one-hot gather passes per class + [1,8] lane-slice updates) and on fixed
per-program overhead (~1us/program).  v4 removes all three:

  * **single-pass gather**: at preparation, each row's off-block entries are
    grouped by the 128-lane patch of x they read and padded into 8-slot
    windows that are SHARED across a 16-row group; every [1,128] tile row
    then reads from exactly ONE patch, so the kernel gathers with one
    sublane `take_along_axis` (per-tile-row patch select, measured ~free)
    plus one lane gather — instead of G one-hot passes (G ~ 10-14);
  * **dense in-block GS on the MXU**: the in-block coupling of each 128-row
    block is stored as a dense transposed [128,128] matrix; a class update
    is one [1,128]x[128,128] matvec and a masked full-lane blend — no
    8-lane dynamic slices.  Semantics are identical to the v2 sweep / XLA
    `_gs_sweep` (exact (block, class, slot) Gauss-Seidel, reference
    grid.cpp:104-146): classes see earlier classes through x_cur, blocks see
    earlier blocks through the aliased x buffer;
  * **multi-block programs**: `mb` 128-row blocks per Pallas program
    amortize the fixed per-program cost; the in-kernel block loop keeps
    cross-block GS exact (sequential grid + in-place VMEM writes).

Requires block_rows == 128 (one x sublane-row per block) and at most 16
distinct off-block patches per block (`Ell4Unsupported` otherwise — callers
fall back to the v2 kernels).
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

LANES = 128
GROUP = 16  # rows per window group
WIN = 8  # slots per window (LANES // GROUP)
GMAX = 16  # max distinct off-block patches per block


class Ell4Unsupported(ValueError):
    """Operator shape not expressible in the v4 layout (fallback to v2)."""


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("vals_flat", "lcols_flat", "pids", "perm", "abbT"),
    meta_fields=("nrows", "ncols", "windows", "nrows_pad", "mb"),
)
@dataclasses.dataclass(frozen=True)
class KernelEll4:
    """Window-aligned ELL (+ optional dense in-block matrix) for v4 kernels.

    Rows of each 128-row block are clustered into 8 spatially coherent
    16-row groups (by stencil-centroid order, so a group's windows union few
    patches).  ``vals_flat``/``lcols_flat`` are [nb * T, 128] with
    T = 8 * windows tile rows per block; lane l of tile row (block, g, w)
    holds slot l % 8 of window w for the group's member l // 8.
    ``lcols_flat`` packs (local_patch << 7) | lane_in_patch.
    ``pids[16*b + j]`` is the x2 sublane row of block b's j-th local patch.
    ``perm[b, l]`` maps row-local lane l to its (group*16 + member) lane so
    one lane gather restores row order after the group-ordered row sums.
    ``abbT[b]`` is the block's in-block coupling, transposed, diagonal
    zeroed (present iff ``split``).
    """

    vals_flat: jnp.ndarray
    lcols_flat: jnp.ndarray
    pids: jnp.ndarray
    perm: jnp.ndarray  # [nb, 128] int32
    abbT: jnp.ndarray  # [nb, 128, 128] (dummy [1,1,1] if not split)
    nrows: int
    ncols: int
    windows: int  # W: windows per 16-row group
    nrows_pad: int
    mb: int  # blocks per program

    @property
    def nblocks(self) -> int:
        return self.nrows_pad // LANES

    @property
    def tiles_per_block(self) -> int:
        return 8 * self.windows

    @property
    def x_rows(self) -> int:
        return _round_up(self.ncols, LANES) // LANES

    @property
    def split(self) -> bool:
        return self.abbT.ndim == 3 and self.abbT.shape[1] == LANES


def _pick_mb(nb: int, want: int = 8) -> int:
    """Blocks per program.  Mosaic block specs need the sublane dim divisible
    by 8 or equal to the whole array, so odd nb collapses to one program."""
    for mb in (want, 4, 2):
        if nb % mb == 0:
            return mb
    return nb


def prepare_kernel_ell4(
    ell: EllMatrix,
    split_inblock: bool = False,
    mb: int = 8,
    dtype=jnp.float32,
) -> KernelEll4:
    """Host-side repack into the v4 window-aligned layout."""
    if ell.block_rows % LANES != 0:
        raise Ell4Unsupported("v4 needs 128-row-aligned blocks")
    n_pad = ell.nrows_pad
    nb = n_pad // LANES
    gc = np.asarray(global_cols(ell)).astype(np.int64)  # [n_pad, w0]
    w0 = ell.width
    vv = np.asarray(ell.vals, dtype=np.float64)
    rows_glob = np.arange(n_pad)[:, None]
    diag_mask = gc == rows_glob  # true diagonal entries
    patches = gc >> 7
    own = patches == (rows_glob >> 7)

    if split_inblock:
        if ell.nrows != ell.ncols:
            raise Ell4Unsupported("split_inblock needs a square operator")
        off_mask = ~own
        abbT = np.zeros((nb, LANES, LANES), dtype=np.float64)
        in_mask = own & ~diag_mask
        bi, wi = np.nonzero(in_mask)
        abbT[bi >> 7, gc[bi, wi] & 127, bi & 127] += vv[bi, wi]
    else:
        off_mask = np.ones_like(own)
        # padding entries (val 0) may point anywhere; keep them, they add 0
        abbT = np.zeros((1, 1, 1), dtype=np.float64)

    # ---- spatial grouping: cluster block rows by stencil centroid -----------
    # Real entries' mean global column is a 1-D proxy for the row's position
    # in KD-tile-ordered index space; 16-row runs of the centroid order are
    # spatially tight, so their windows union few patches.
    real = vv != 0.0
    wsum = real.sum(axis=1)
    cent = np.where(
        wsum > 0, (gc * real).sum(axis=1) / np.maximum(wsum, 1), rows_glob[:, 0]
    )
    # member_of[b, q] = row-local lane at group position q (centroid order)
    member_of = np.argsort(cent.reshape(nb, LANES), axis=1, kind="stable")
    perm = np.empty((nb, LANES), dtype=np.int64)
    np.put_along_axis(
        perm, member_of, np.broadcast_to(np.arange(LANES), (nb, LANES)), axis=1
    )

    # Everything below works in "group space": row ``rnew`` is the row at
    # group position rnew%128 of block rnew//128.
    orig = (member_of + (np.arange(nb) * LANES)[:, None]).ravel()
    w0 = gc.shape[1]
    P = _round_up(ell.ncols, LANES) // LANES  # number of x patches
    sel = off_mask[orig]
    e_row = np.repeat(np.arange(n_pad, dtype=np.int64), w0).reshape(n_pad, w0)[sel]
    e_pat = patches[orig][sel]
    e_val = vv[orig][sel]
    e_col = gc[orig][sel]

    # sort entries by (row, patch); stable keeps original slot order
    key = e_row * P + e_pat
    o = np.argsort(key, kind="stable")
    e_row, e_pat, e_val, e_col, key = (
        e_row[o], e_pat[o], e_val[o], e_col[o], key[o])

    # per-(row, patch) runs
    run_start = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
    run_len = np.diff(np.r_[run_start, key.size])
    pos = np.arange(key.size) - np.repeat(run_start, run_len)  # slot-in-run
    rp_row = e_row[run_start]
    rp_pat = e_pat[run_start]

    # per-(group, patch): window count = ceil(max member count / WIN).
    # Runs are (row, patch)-sorted, so a (group, patch) key recurs once per
    # member — re-sort runs by gp key before segmenting.
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

    # per-group exclusive base offsets and per-block W
    g_start = np.flatnonzero(np.r_[True, gp_grp[1:] != gp_grp[:-1]])
    g_len = np.diff(np.r_[g_start, nw.size])
    csum = np.cumsum(nw) - nw
    base = csum - np.repeat(csum[g_start], g_len)
    w_per_group = np.zeros(nb * (LANES // GROUP), dtype=np.int64)
    w_per_group[gp_grp[g_start]] = np.add.reduceat(nw, g_start)
    W = int(max(1, w_per_group.max()))
    T = 8 * W

    # per-block patch table (sorted unique) and local patch ids
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
    col = np.arange(GMAX)
    pids = np.where(col[None, :] < np.maximum(cnt_b, 1)[:, None],
                    pids, pids[:, :1])
    # local patch id of each (group, patch)
    first_of_blk = np.zeros(nb, dtype=np.int64)
    first_of_blk[b_of[blk_start]] = blk_start
    hi_gp = np.searchsorted(bp_u, bp_key) - first_of_blk[gp_blk]

    # ---- fill ----------------------------------------------------------------
    # Invariant required by the kernels' two-stage gather (sublane patch
    # select THEN lane gather): every [1,128] tile row reads exactly ONE
    # patch, so `hi` must be constant across ALL lanes of a tile row —
    # including padding slots (a real entry's lane gather may land on a
    # padding lane's sublane index).  `rowpat` records each tile row's
    # local patch id; padding lanes are back-filled with it below.
    run_gp = np.searchsorted(gp_u, gp_key)
    ent_run = np.repeat(np.arange(rp_row.size), run_len)
    wloc = base[run_gp][ent_run] + pos // WIN
    lane = (e_row % GROUP) * WIN + pos % WIN
    trow = (e_row // LANES) * T + ((e_row // GROUP) % (LANES // GROUP)) * W + wloc

    vals4 = np.zeros((nb * T, LANES), dtype=np.float64)
    lcols4 = np.zeros((nb * T, LANES), dtype=np.int64)
    filled = np.zeros((nb * T, LANES), dtype=bool)
    vals4[trow, lane] = e_val
    lcols4[trow, lane] = (hi_gp[run_gp][ent_run] << 7) | (e_col & (LANES - 1))
    filled[trow, lane] = True

    rowpat = np.zeros(nb * T, dtype=np.int64)
    segpos = np.arange(int(nw.sum())) - np.repeat(csum, nw)  # window idx in gp
    t0 = gp_blk * T + (gp_grp % (LANES // GROUP)) * W + base
    rows_idx = np.repeat(t0, nw) + segpos
    rowpat[rows_idx] = np.repeat(hi_gp, nw)
    lcols4 = np.where(filled, lcols4, rowpat[:, None] << 7)

    mb_eff = _pick_mb(nb, mb)
    # mb == nb streams every block's tables into VMEM at once; keep a lid on it
    if mb_eff == nb and nb * T * LANES * 8 > 16 << 20:
        raise Ell4Unsupported(
            f"odd block count {nb} with T={T} exceeds the single-program "
            "VMEM budget"
        )
    return KernelEll4(
        vals_flat=jnp.asarray(vals4, dtype),
        lcols_flat=jnp.asarray(lcols4.astype(np.int32)),
        pids=jnp.asarray(pids.reshape(-1).astype(np.int32)),
        perm=jnp.asarray(perm.astype(np.int32)),
        abbT=jnp.asarray(abbT, dtype),
        nrows=ell.nrows,
        ncols=ell.ncols,
        windows=W,
        nrows_pad=n_pad,
        mb=mb_eff,
    )


def _i32(v) -> jnp.ndarray:
    return jnp.asarray(v, jnp.int32)


def _sublane_gather(tab: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """out[i, j] = tab[idx[i, j], j] (idx < 8, tab [8, 128]); explicit gather
    form of take_along_axis(axis=0) that stays int32 under jax x64."""
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(),
        collapsed_slice_dims=(0,),
        start_index_map=(0,),
        operand_batching_dims=(1,),
        start_indices_batching_dims=(1,),
    )
    return lax.gather(
        tab, idx[..., None], dnums, (1, 1),
        mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


def _lane_gather(tab: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(),
        collapsed_slice_dims=(1,),
        start_index_map=(1,),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    return lax.gather(
        tab, idx[..., None], dnums, (1, 1),
        mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


def _selr2(dtype) -> np.ndarray:
    """[128, 128] lane map: out lane l accumulates slot-lanes of row l % 16."""
    out = np.zeros((LANES, LANES))
    l_in = np.arange(LANES)
    for l_out in range(LANES):
        out[l_in[(l_in // WIN) == (l_out % GROUP)], l_out] = 1.0
    return out.astype(dtype)


def _gmask(t: int, w: int, dtype) -> np.ndarray:
    """[T, 128] group filter: tile row t contributes to lanes of group t//W."""
    out = np.zeros((t, LANES))
    for tt in range(t):
        g = tt // w
        out[tt, g * GROUP : (g + 1) * GROUP] = 1.0
    return out.astype(dtype)


def _gather_block(scratch, lcols, vals, selr2, gmask, ones_t):
    """Off-block row sums of one block, in [1, 128] lane (= row) form."""
    t = lcols.shape[0]
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
    prod = vals * jnp.concatenate(parts, axis=0)  # [T, 128]
    q = jnp.dot(prod, selr2, preferred_element_type=prod.dtype,
                precision=lax.Precision.HIGHEST)  # [T, 128]
    return jnp.dot(ones_t, q * gmask, preferred_element_type=prod.dtype,
                   precision=lax.Precision.HIGHEST)  # [1, 128]


# ---------------------------------------------------------------------------
# SpMV
# ---------------------------------------------------------------------------


def _spmv4_kernel(pid_ref, vals_ref, lcols_ref, perm_ref, selr2_ref,
                  gmask_ref, ones_ref, x_ref, out_ref, scratch, *, t, mb):
    i = pl.program_id(0)
    for j in range(mb):
        bi = i * mb + j
        for k in range(GMAX):
            scratch[k, :] = x_ref[pid_ref[bi * GMAX + k], :]
        y_grp = _gather_block(
            scratch[...],
            lcols_ref[j * t : (j + 1) * t, :],
            vals_ref[j * t : (j + 1) * t, :],
            selr2_ref[...], gmask_ref[...], ones_ref[...],
        )
        out_ref[pl.ds(j, 1), :] = _lane_gather(
            y_grp, perm_ref[pl.ds(j, 1), :]
        )


def spmv_tpu4(kell: KernelEll4, x: jnp.ndarray) -> jnp.ndarray:
    """y = A @ x (v4 layout, whole operator in windows); returns [nrows_pad]."""
    assert not kell.split, "split operators carry in-block entries in abbT"
    dtype = kell.vals_flat.dtype
    xr = kell.x_rows
    xp = jnp.zeros(xr * LANES, dtype).at[: x.shape[0]].set(x.astype(dtype))
    x2 = xp.reshape(xr, LANES)
    t, mb, nb = kell.tiles_per_block, kell.mb, kell.nblocks
    selr2 = jnp.asarray(_selr2(np.dtype(dtype)))
    gmask = jnp.asarray(_gmask(t, kell.windows, np.dtype(dtype)))
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
        scratch_shapes=[pltpu.VMEM((GMAX, LANES), dtype)],
    )
    out = pl.pallas_call(
        functools.partial(_spmv4_kernel, t=t, mb=mb),
        out_shape=jax.ShapeDtypeStruct((nb, LANES), dtype),
        grid_spec=grid_spec,
    )(kell.pids, kell.vals_flat, kell.lcols_flat, kell.perm, selr2, gmask,
      ones_t, x2)
    return out.reshape(-1)


# ---------------------------------------------------------------------------
# SOR sweep — exact (block, class, slot) GS, dense in-block on the MXU
# ---------------------------------------------------------------------------


def _sweep4_kernel(pid_ref, xlag_ref, vals_ref, lcols_ref, perm_ref,
                   abbT_ref, selr2_ref, gmask_ref, ones_ref, dinv_ref, b_ref,
                   m_ref, w_ref, lagc_ref, x_in_ref, x_out_ref, scratch,
                   *, t, mb, nclass):
    i = pl.program_id(0)
    xlag = xlag_ref[0]

    @pl.when(i == _i32(0))
    def _():
        x_out_ref[...] = x_in_ref[...]

    lane = lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    for j in range(mb):
        bi = i * mb + j
        for k in range(GMAX):
            scratch[k, :] = x_out_ref[pid_ref[bi * GMAX + k], :]
        y_grp = _gather_block(
            scratch[...],
            lcols_ref[j * t : (j + 1) * t, :],
            vals_ref[j * t : (j + 1) * t, :],
            selr2_ref[...], gmask_ref[...], ones_ref[...],
        )
        y_off = _lane_gather(y_grp, perm_ref[pl.ds(j, 1), :])
        x_cur = x_out_ref[pl.ds(bi, 1), :]
        dinv = dinv_ref[pl.ds(j, 1), :]
        bb = b_ref[pl.ds(j, 1), :]
        m = m_ref[pl.ds(j, 1), :]
        w = w_ref[pl.ds(j, 1), :]
        lagc = lagc_ref[pl.ds(j, 1), :]
        abbT = abbT_ref[j, :, :]
        for c in range(nclass):
            y_in = jnp.dot(x_cur, abbT, preferred_element_type=x_cur.dtype,
                           precision=lax.Precision.HIGHEST)
            y = y_off + y_in + lagc * xlag
            xi = (1.0 - w) * x_cur + w * dinv * (bb - y)
            upd = jnp.logical_and(lane // _i32(8) == _i32(c), m > 0)
            x_cur = jnp.where(upd, xi, x_cur)
        x_out_ref[pl.ds(bi, 1), :] = x_cur


def sor_sweep_tpu4(
    kell: KernelEll4,
    x2: jnp.ndarray,  # [x_rows, 128] (x_rows == nblocks for square ops)
    x_lag: jnp.ndarray,
    dinv2: jnp.ndarray,  # [nblocks, 128]
    b2: jnp.ndarray,
    mask2: jnp.ndarray,
    omega2: jnp.ndarray,
    lagc2: jnp.ndarray,
) -> jnp.ndarray:
    """One exact (block, class)-GS sweep; returns updated [nblocks, 128] x."""
    assert kell.split, "sweep needs a split (abbT-carrying) operator"
    dtype = kell.vals_flat.dtype
    t, mb, nb = kell.tiles_per_block, kell.mb, kell.nblocks
    selr2 = jnp.asarray(_selr2(np.dtype(dtype)))
    gmask = jnp.asarray(_gmask(t, kell.windows, np.dtype(dtype)))
    ones_t = jnp.ones((1, t), dtype)
    z2 = lambda i, ws: (np.int32(0),) * 2
    rowspec = pl.BlockSpec((mb, LANES), lambda i, ws: (i, np.int32(0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb // mb,),
        in_specs=[
            pl.BlockSpec((1,), lambda i, ws: (np.int32(0),),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((mb * t, LANES), lambda i, ws: (i, np.int32(0))),
            pl.BlockSpec((mb * t, LANES), lambda i, ws: (i, np.int32(0))),
            rowspec,
            pl.BlockSpec((mb, LANES, LANES),
                         lambda i, ws: (i, np.int32(0), np.int32(0))),
            pl.BlockSpec((LANES, LANES), z2, memory_space=pltpu.VMEM),
            pl.BlockSpec((t, LANES), z2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t), z2, memory_space=pltpu.VMEM),
            rowspec,
            rowspec,
            rowspec,
            rowspec,
            rowspec,
            pl.BlockSpec(x2.shape, z2, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(x2.shape, z2, memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((GMAX, LANES), dtype)],
    )
    out = pl.pallas_call(
        functools.partial(_sweep4_kernel, t=t, mb=mb, nclass=LANES // 8),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
        grid_spec=grid_spec,
        input_output_aliases={14: 0},
    )(
        kell.pids,
        jnp.asarray([x_lag], dtype),
        kell.vals_flat,
        kell.lcols_flat,
        kell.perm,
        kell.abbT,
        selr2,
        gmask,
        ones_t,
        dinv2,
        b2,
        mask2,
        omega2,
        lagc2,
        x2,
    )
    return out


# ---------------------------------------------------------------------------
# v5 sweep — one-shot in-block SOR step: x += K (b - A x - lag), K dense
# ---------------------------------------------------------------------------
#
# One (block, class, slot) GS sweep is linear in the block state: with
# M = D/omega + L (L = strictly-lower class-block part of the in-block
# coupling), the sweep is exactly  x_new = x + M^{-1} (b - A x_old)  where
# A x_old reads pre-sweep in-block values and fresh earlier-block values
# (reference semantics, grid.cpp:104-146).  K = M^{-1} is precomputed dense
# per 128-row block in f64 at setup, with non-smoothed rows (Dirichlet /
# Neumann, grid.cpp:118) zeroed so they never move and never contribute a
# correction.  The kernel then needs ONE full-row gather (the same
# non-split window tables the v4 SpMV uses) and ONE [1,128]x[128,128] MXU
# matvec per block — no 16-step class chain, no dinv/mask/omega vectors.


def build_oneshot_K(
    ell: EllMatrix,
    omega_row: np.ndarray,
    smooth_mask: np.ndarray,
    class_size: int = 8,
) -> np.ndarray:
    """[nb, 128, 128] transposed one-shot matrices K^T (f64 host math)."""
    n_pad = ell.nrows_pad
    nb = n_pad // LANES
    gc = np.asarray(global_cols(ell)).astype(np.int64)
    vv = np.asarray(ell.vals, dtype=np.float64)
    diag = np.asarray(ell.diag, dtype=np.float64)
    w = np.ones(n_pad)
    w[: omega_row.shape[0]] = np.asarray(omega_row, dtype=np.float64)
    m = np.zeros(n_pad, dtype=bool)
    m[: smooth_mask.shape[0]] = np.asarray(smooth_mask) > 0

    rows = np.arange(n_pad)[:, None]
    own = (gc >> 7) == (rows >> 7)
    in_mask = own & (gc != rows)
    abb = np.zeros((nb, LANES, LANES))
    bi, wi = np.nonzero(in_mask)
    abb[bi >> 7, bi & 127, gc[bi, wi] & 127] += vv[bi, wi]

    lane = np.arange(LANES)
    lower = (lane[:, None] // class_size) > (lane[None, :] // class_size)
    m2 = m.reshape(nb, LANES)
    diag2 = diag.reshape(nb, LANES)
    w2 = w.reshape(nb, LANES)
    # invert in chunks: the [nb,128,128] f64 temporaries would otherwise
    # transiently cost ~2 GB at 1M rows on the 2-core setup host
    K = np.empty((nb, LANES, LANES), dtype=np.float64)
    step = 512
    for c0 in range(0, nb, step):
        c1 = min(c0 + step, nb)
        M = abb[c0:c1] * lower[None] * m2[c0:c1, :, None] * m2[c0:c1, None, :]
        M[:, lane, lane] = np.where(
            m2[c0:c1], diag2[c0:c1] / np.maximum(w2[c0:c1], 1e-30), 1.0
        )
        K[c0:c1] = np.linalg.inv(M).transpose(0, 2, 1)
    K *= m2[:, None, :]  # masked rows never move (note: K is transposed)
    return K  # transposed for [1,128] @ [128,128]


def _sweep5_kernel(pid_ref, xlag_ref, vals_ref, lcols_ref, perm_ref,
                   kinvT_ref, selr2_ref, gmask_ref, ones_ref, b_ref,
                   lagc_ref, x_in_ref, x_out_ref, scratch, *, t, mb):
    i = pl.program_id(0)
    xlag = xlag_ref[0]

    @pl.when(i == _i32(0))
    def _():
        x_out_ref[...] = x_in_ref[...]

    for j in range(mb):
        bi = i * mb + j
        for k in range(GMAX):
            scratch[k, :] = x_out_ref[pid_ref[bi * GMAX + k], :]
        y_grp = _gather_block(
            scratch[...],
            lcols_ref[j * t : (j + 1) * t, :],
            vals_ref[j * t : (j + 1) * t, :],
            selr2_ref[...], gmask_ref[...], ones_ref[...],
        )
        y = _lane_gather(y_grp, perm_ref[pl.ds(j, 1), :])
        tvec = b_ref[pl.ds(j, 1), :] - y - lagc_ref[pl.ds(j, 1), :] * xlag
        dx = jnp.dot(tvec, kinvT_ref[j, :, :],
                     preferred_element_type=tvec.dtype,
                     precision=lax.Precision.HIGHEST)
        x_out_ref[pl.ds(bi, 1), :] = x_out_ref[pl.ds(bi, 1), :] + dx


def sor_sweep_tpu5(
    kell: KernelEll4,   # NON-split (full-row windows, shared with spmv_tpu4)
    kinvT: jnp.ndarray,  # [nb, 128, 128] from build_oneshot_K
    x2: jnp.ndarray,     # [nblocks, 128]
    x_lag: jnp.ndarray,
    b2: jnp.ndarray,
    lagc2: jnp.ndarray,
) -> jnp.ndarray:
    """One exact (block, class)-GS sweep via the one-shot dense step."""
    assert not kell.split, "v5 uses full-row windows; in-block lives in K"
    dtype = kell.vals_flat.dtype
    t, mb, nb = kell.tiles_per_block, kell.mb, kell.nblocks
    selr2 = jnp.asarray(_selr2(np.dtype(dtype)))
    gmask = jnp.asarray(_gmask(t, kell.windows, np.dtype(dtype)))
    ones_t = jnp.ones((1, t), dtype)
    z2 = lambda i, ws: (np.int32(0),) * 2
    rowspec = pl.BlockSpec((mb, LANES), lambda i, ws: (i, np.int32(0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb // mb,),
        in_specs=[
            pl.BlockSpec((1,), lambda i, ws: (np.int32(0),),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((mb * t, LANES), lambda i, ws: (i, np.int32(0))),
            pl.BlockSpec((mb * t, LANES), lambda i, ws: (i, np.int32(0))),
            rowspec,
            pl.BlockSpec((mb, LANES, LANES),
                         lambda i, ws: (i, np.int32(0), np.int32(0))),
            pl.BlockSpec((LANES, LANES), z2, memory_space=pltpu.VMEM),
            pl.BlockSpec((t, LANES), z2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t), z2, memory_space=pltpu.VMEM),
            rowspec,
            rowspec,
            pl.BlockSpec(x2.shape, z2, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(x2.shape, z2, memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((GMAX, LANES), dtype)],
    )
    out = pl.pallas_call(
        functools.partial(_sweep5_kernel, t=t, mb=mb),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
        grid_spec=grid_spec,
        input_output_aliases={11: 0},
    )(
        kell.pids,
        jnp.asarray([x_lag], dtype),
        kell.vals_flat,
        kell.lcols_flat,
        kell.perm,
        jnp.asarray(kinvT, dtype),
        selr2,
        gmask,
        ones_t,
        b2,
        lagc2,
        x2,
    )
    return out
