"""v6 Pallas TPU kernels: segment-ragged windows, VPU reduction, i16 cols.

Supersedes the v4/v5 kernels (ops/kernels4.py) on three measured fronts
(262k-1M rows, k=70, chained timing on the v5e — scripts/kiso*.py,
RESULTS.md):

1. **Ragged tile counts.** v4 pays the GLOBAL max windows-per-group W for
   every 16-row group (measured mean ~18 vs max 29 at 1M; up to 3.3x pure
   padding streamed from HBM for the reference's bandwidth-bound hot loop,
   grid.cpp:104-146).  v6 cuts the block sequence into <= ``max_segments``
   CONTIGUOUS, MB-aligned segments; each segment pays its own max W (exact
   DP minimizes total padded tiles).  Rows are KD-tile ordered, so window
   counts are spatially smooth and contiguous segments capture most of the
   raggedness — while keeping block processing order == storage order
   (the GS oracle is untouched), outputs streaming to static positions,
   and zero prefetched indices in the kernels.
2. **VPU reduction.** v4 reduced prod[T,128] -> row sums with two
   HIGHEST-precision MXU dots (3 bf16 passes each ~ 40% of kernel time).
   v6 reduces on the VPU: reshape (8,W,128) sum over the window axis,
   three cyclic lane rolls (8-lane segment sums), two constant-index
   gathers for placement — exact f32, measured 0.86 -> 0.76 ms at 262k.
3. **int16 column indices.** (local_patch << 7 | lane) < 2048 packs into
   i16: 6 B/slot streamed instead of 8, no measured decode cost.

The SOR sweep keeps v5's one-shot semantics (x += K(b - A x - lag), K the
per-block inverse of D/omega + strictly-lower class coupling, reference
grid.cpp:104-146): the (block, class, slot) Gauss-Seidel is EXACT and in
the same storage-block order as the XLA oracle (ops/smoothers._gs_sweep).

Capacity: the sweep holds x whole in VMEM — n_pad <= ~2M rows per call on
a 16 MB-VMEM core.  Larger single-chip problems fall back to the v2
kernels; multi-chip uses the row-partitioned path (parallel/).
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
    _sublane_gather,
    GMAX,
    GROUP,
    LANES,
    WIN,
)

MB = 8  # blocks per program; segment boundaries are MB-aligned


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("vals", "lcols"),
    meta_fields=("windows", "nblocks", "block_base"),
)
@dataclasses.dataclass(frozen=True)
class Segment:
    vals: jnp.ndarray  # [nblocks * T, 128] f32
    lcols: jnp.ndarray  # [nblocks * T, 128] i16 (packed patch<<7|lane)
    windows: int  # W for this segment
    nblocks: int  # multiple of MB (except possibly the last segment)
    block_base: int  # first block id (multiple of MB)

    @property
    def tiles(self) -> int:
        return 8 * self.windows


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("segments", "pids", "perm"),
    meta_fields=("nrows", "ncols", "nrows_pad", "gmax"),
)
@dataclasses.dataclass(frozen=True)
class KernelEll6:
    """Segment-ragged window layout (see module docstring)."""

    segments: tuple  # tuple[Segment, ...] covering blocks 0..nb contiguously
    pids: jnp.ndarray  # [nb * gmax] i32 x-patch ids per block
    perm: jnp.ndarray  # [nb, 128] i32 group-order -> row-order lane map
    nrows: int
    ncols: int
    nrows_pad: int
    # per-block x-patch capacity (multiple of 8; data-driven at prepare
    # time so wide blocks — long-range boundary/condensation couplings at
    # 100k+ rows — stay on the v6 path instead of falling back to v2)
    gmax: int = GMAX

    @property
    def nblocks(self) -> int:
        return self.nrows_pad // LANES

    @property
    def x_rows(self) -> int:
        return _round_up(self.ncols, LANES) // LANES

    @property
    def table_bytes(self) -> int:
        return sum(
            s.vals.size * s.vals.dtype.itemsize
            + s.lcols.size * s.lcols.dtype.itemsize
            for s in self.segments
        )


def _segment_blocks(wblk_mb: np.ndarray, max_segments: int) -> list[int]:
    """Cut the MB-group sequence into <= max_segments contiguous pieces
    minimizing sum(len * maxW); returns cut positions (group indices).

    Exact DP over (groups, segments): O(G^2 * K) with G = nb/MB groups.
    """
    g = wblk_mb.size
    if g == 0:
        return []
    K = min(max_segments, g)
    # suffix max tables for range max
    INF = float("inf")
    # cost[i][j] = (j - i) * max(w[i:j]) computed on the fly with running max
    dp = np.full((K + 1, g + 1), INF)
    back = np.zeros((K + 1, g + 1), dtype=np.int64)
    dp[0, 0] = 0.0
    for k in range(1, K + 1):
        for j in range(1, g + 1):
            run = 0.0
            best, arg = INF, 0
            for i in range(j - 1, -1, -1):
                if wblk_mb[i] > run:
                    run = wblk_mb[i]
                c = dp[k - 1, i] + (j - i) * run
                if c < best:
                    best, arg = c, i
            dp[k, j] = best
            back[k, j] = arg
    # pick best k
    kbest = int(np.argmin(dp[1:, g])) + 1
    cuts = [g]
    j, k = g, kbest
    while k > 0:
        j = int(back[k, j])
        k -= 1
        cuts.append(j)
    return sorted(set(cuts))


def prepare_kernel_ell6(
    ell: EllMatrix,
    max_segments: int = 1,
    dtype=jnp.float32,
    max_patches: int = 256,
) -> KernelEll6:
    """Host-side repack into the segment-ragged window layout.

    Shares v4's grouping scheme (stencil-centroid 16-row groups, shared
    8-slot windows per (group, patch)); assigns each contiguous block
    segment its own window count.

    ``max_segments`` now defaults to 1: on-chip measurement (round 3,
    scripts/kcache.py) showed the multi-``pallas_call`` segmentation costs
    ~40% of SpMV throughput at 1M rows (3.51 ms vs 1.92 ms single-call)
    while saving only ~5% of table bytes on KD-ordered operators — the
    uniform-W single call streams at the device's pure-stream ceiling
    (578 GB/s measured).  Pass a larger value only for layouts whose
    window-count spread exceeds the ~1.4x multi-call penalty.
    """
    if ell.block_rows % LANES != 0:
        raise Ell4Unsupported("v6 needs 128-row-aligned blocks")
    # the i16 column packing (patch_slot << 7 | lane) tops out at slot 255
    assert max_patches <= 256, "i16 slot packing caps gmax at 256"
    n_pad = ell.nrows_pad
    nb = n_pad // LANES
    gc = np.asarray(global_cols(ell)).astype(np.int64)
    vv = np.asarray(ell.vals, dtype=np.float64)
    rows_glob = np.arange(n_pad)[:, None]
    patches = gc >> 7

    # ---- spatial grouping (same as v4) ---------------------------------------
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

    # ---- contiguous segmentation over MB-block groups -------------------------
    wblk = np.maximum(w_per_group.reshape(nb, LANES // GROUP).max(axis=1), 1)
    nmb = _round_up(nb, MB) // MB
    wmb = np.ones(nmb * MB, dtype=np.int64)
    wmb[:nb] = wblk
    wmb = wmb.reshape(nmb, MB).max(axis=1)
    cuts = _segment_blocks(wmb, max_segments)

    # ---- per-block patch table (same as v4) ----------------------------------
    bp_key = gp_blk * P + gp_pat
    bp_u = np.unique(bp_key)
    b_of = bp_u // P
    blk_start = np.flatnonzero(np.r_[True, b_of[1:] != b_of[:-1]])
    per_blk = np.diff(np.r_[blk_start, bp_u.size])
    gmax = GMAX
    if per_blk.size and per_blk.max() > GMAX:
        # widen the scratch in whole 8-row banks; each extra bank costs one
        # sublane-gather + select per 8-row tile in the kernels, so cap it
        gmax = int(_round_up(int(per_blk.max()), 8))
        if gmax > max_patches:
            raise Ell4Unsupported(
                f"a block has {per_blk.max()} off-block patches "
                f"> max_patches={max_patches}"
            )
    pids = np.zeros((nb, gmax), dtype=np.int64)
    loc = np.arange(bp_u.size) - np.repeat(blk_start, per_blk)
    pids[b_of, loc] = bp_u % P
    cnt_b = np.zeros(nb, dtype=np.int64)
    cnt_b[b_of[blk_start]] = per_blk
    colr = np.arange(gmax)
    pids = np.where(colr[None, :] < np.maximum(cnt_b, 1)[:, None],
                    pids, pids[:, :1])
    first_of_blk = np.zeros(nb, dtype=np.int64)
    first_of_blk[b_of[blk_start]] = blk_start
    hi_gp = np.searchsorted(bp_u, bp_key) - first_of_blk[gp_blk]

    # ---- per-segment fill ------------------------------------------------------
    # W assigned to each block = its segment's W
    wseg = np.empty(nmb, dtype=np.int64)
    seg_ranges = []
    for s0, s1 in zip(cuts[:-1], cuts[1:]):
        wseg[s0:s1] = wmb[s0:s1].max()
        seg_ranges.append((s0 * MB, min(s1 * MB, nb)))
    bq = np.repeat(wseg, MB)[:nb]

    run_gp = np.searchsorted(gp_u, gp_key)
    ent_run = np.repeat(np.arange(rp_row.size), run_len)
    Wrow = bq[(e_row // LANES)]
    wloc = base[run_gp][ent_run] + pos // WIN
    lane = (e_row % GROUP) * WIN + pos % WIN
    trow_in_blk = ((e_row // GROUP) % (LANES // GROUP)) * Wrow + wloc

    segments = []
    segpos_all = np.arange(int(nw.sum())) - np.repeat(csum, nw)
    blk_of_entry = e_row // LANES
    for b0, b1 in seg_ranges:
        Wk = int(bq[b0])
        T = 8 * Wk
        nbk = _round_up(b1 - b0, MB)  # only the LAST segment may be short
        vals_k = np.zeros((nbk * T, LANES), dtype=np.float64)
        lcols_k = np.zeros((nbk * T, LANES), dtype=np.int64)
        filled = np.zeros((nbk * T, LANES), dtype=bool)
        sel = (blk_of_entry >= b0) & (blk_of_entry < b1)
        trow = (blk_of_entry[sel] - b0) * T + trow_in_blk[sel]
        vals_k[trow, lane[sel]] = e_val[sel]
        lcols_k[trow, lane[sel]] = (
            (hi_gp[run_gp][ent_run][sel] << 7) | (e_col[sel] & (LANES - 1))
        )
        filled[trow, lane[sel]] = True
        # padding lanes must read the tile row's own patch (two-stage gather
        # invariant: one patch per tile row)
        gsel = (gp_blk >= b0) & (gp_blk < b1)
        t0 = ((gp_blk - b0) * T
              + (gp_grp % (LANES // GROUP)) * Wk + base)
        rows_idx = np.repeat(np.where(gsel, t0, 0), np.where(gsel, nw, 0))
        pat_rep = np.repeat(np.where(gsel, hi_gp, 0), np.where(gsel, nw, 0))
        seg_sel = np.repeat(gsel, nw)
        rowpat = np.zeros(nbk * T, dtype=np.int64)
        rowpat[rows_idx + segpos_all[seg_sel]] = pat_rep
        lcols_k = np.where(filled, lcols_k, rowpat[:, None] << 7)
        segments.append(Segment(
            vals=jnp.asarray(vals_k, dtype),
            lcols=jnp.asarray(lcols_k.astype(np.int16)),
            windows=Wk,
            nblocks=int(nbk),
            block_base=int(b0),
        ))

    return KernelEll6(
        segments=tuple(segments),
        pids=jnp.asarray(pids.reshape(-1).astype(np.int32)),
        perm=jnp.asarray(perm.astype(np.int32)),
        nrows=ell.nrows,
        ncols=ell.ncols,
        nrows_pad=n_pad,
        gmax=int(gmax),
    )


# ---------------------------------------------------------------------------
# kernel building blocks
# ---------------------------------------------------------------------------


def _gather_rows(scratch, lcols, vals, t):
    """Entry products for t tile rows: vals * x[cols], [t,128] (two-stage
    gather: sublane patch select, then lane gather).  Two-bank special
    case of :func:`_gather_rows_banks`."""
    return _gather_rows_banks(scratch, lcols, vals, t, 2)


def _vpu_reduce(prod, w, lanesel, groupsel):
    """[T,128] entry products -> [1,128] group-ordered row sums, VPU-only.

    1. acc[g,:] = sum_w prod[g*W+w,:] (reshape + sum over the window axis);
    2. three cyclic lane rolls make lane 8j of acc[g] the member-j sum;
    3. constant-index lane gather (l -> 8*(l%16)) then sublane gather
       (l -> l//16) place member sums at lane g*16+j.  Exact f32.
    """
    acc = jnp.sum(prod.reshape(8, w, LANES), axis=1)  # [8,128]
    r = acc + pltpu.roll(acc, _i32(LANES - 1), 1)
    r = r + pltpu.roll(r, _i32(LANES - 2), 1)
    r = r + pltpu.roll(r, _i32(LANES - 4), 1)
    tmp = _lane_gather(r, lanesel)  # [8,128]
    return _sublane_gather(tmp, groupsel)[0:1, :]  # [1,128]


def _lanesel() -> np.ndarray:
    return np.broadcast_to(
        8 * (np.arange(LANES) % GROUP), (8, LANES)).astype(np.int32)


def _groupsel() -> np.ndarray:
    return np.broadcast_to(
        np.arange(LANES) // GROUP, (8, LANES)).astype(np.int32)


# ---------------------------------------------------------------------------
# SpMV
# ---------------------------------------------------------------------------


def _spmv6_kernel(pid_ref, vals_ref, lcols_ref, perm_ref, lanesel_ref,
                  groupsel_ref, x_ref, out_ref, scratch, *, t, w, base,
                  guard, nb, g):
    # pid_ref is a per-program SMEM BLOCK (MB, g) of this program's own
    # blocks' patch rows — whole-array scalar prefetch overflows the 1 MB
    # SMEM at 1M rows x wide gmax (the 3D flagship compile failure).
    # Padding blocks past nb read their zero-filled pids row (patch 0,
    # always valid); their output rows are sliced off by the caller.
    i = pl.program_id(0)
    for j in range(MB):
        for k in range(g):
            scratch[k, :] = x_ref[pid_ref[0, j, k], :]
        prod = _gather_rows_banks(
            scratch[...],
            lcols_ref[j * t:(j + 1) * t, :].astype(jnp.int32),
            vals_ref[j * t:(j + 1) * t, :],
            t, g // 8,
        )
        y_grp = _vpu_reduce(prod, w, lanesel_ref[...], groupsel_ref[...])
        out_ref[pl.ds(j, 1), :] = _lane_gather(
            y_grp, perm_ref[pl.ds(j, 1), :])


def spmv_tpu6(kell: KernelEll6, x: jnp.ndarray) -> jnp.ndarray:
    """y = A @ x; returns [nrows_pad] in row order."""
    dtype = kell.segments[0].vals.dtype
    xr = kell.x_rows
    # x may carry row-padding beyond the column space (e.g. 256-row blocks
    # pad rows past round_up(ncols,128)); columns never reference it
    xc = x[: xr * LANES]
    xp = jnp.zeros(xr * LANES, dtype).at[: xc.shape[0]].set(xc.astype(dtype))
    x2 = xp.reshape(xr, LANES)
    lanesel = jnp.asarray(_lanesel())
    groupsel = jnp.asarray(_groupsel())
    z2 = lambda i, *_: (np.int32(0),) * 2
    nb_cov = max(sg.block_base + sg.nblocks for sg in kell.segments)
    perm_pad = kell.perm
    pids2 = kell.pids.reshape(kell.nblocks, kell.gmax)
    if nb_cov > kell.nblocks:
        perm_pad = jnp.concatenate([
            kell.perm,
            jnp.zeros((nb_cov - kell.nblocks, LANES), kell.perm.dtype)], 0)
        pids2 = jnp.concatenate([
            pids2, jnp.zeros((nb_cov - kell.nblocks, kell.gmax),
                             pids2.dtype)], 0)
    pids3 = pids2.reshape(nb_cov // MB, MB, kell.gmax)
    outs = []
    for sg in kell.segments:
        t = sg.tiles
        seg_row = functools.partial(
            lambda b0, i, *_: (b0 + i, np.int32(0)), sg.block_base // MB)
        seg_row3 = functools.partial(
            lambda b0, i, *_: (b0 + i, np.int32(0), np.int32(0)),
            sg.block_base // MB)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(sg.nblocks // MB,),
            in_specs=[
                pl.BlockSpec((1, MB, kell.gmax), seg_row3,
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((MB * t, LANES), lambda i, *_: (i, np.int32(0))),
                pl.BlockSpec((MB * t, LANES), lambda i, *_: (i, np.int32(0))),
                pl.BlockSpec((MB, LANES), seg_row),
                pl.BlockSpec((8, LANES), z2, memory_space=pltpu.VMEM),
                pl.BlockSpec((8, LANES), z2, memory_space=pltpu.VMEM),
                pl.BlockSpec(x2.shape, z2, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((MB, LANES), lambda i, *_: (i, np.int32(0))),
            scratch_shapes=[pltpu.VMEM((kell.gmax, LANES), dtype)],
        )
        outs.append(pl.pallas_call(
            functools.partial(_spmv6_kernel, t=t, w=sg.windows,
                              base=sg.block_base,
                              guard=sg.block_base + sg.nblocks > kell.nblocks,
                              nb=kell.nblocks, g=kell.gmax),
            out_shape=jax.ShapeDtypeStruct((sg.nblocks, LANES), dtype),
            grid_spec=grid_spec,
        )(pids3, sg.vals, sg.lcols, perm_pad, lanesel, groupsel, x2))
    y = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    return y.reshape(-1)[: kell.nrows_pad]


# ---------------------------------------------------------------------------
# one-shot SOR sweep (v5 semantics: x += K (b - A x - lag))
# ---------------------------------------------------------------------------


def _sweep6_kernel(pid_ref, xlag_ref, vals_ref, lcols_ref, perm_ref,
                   kinvT_ref, lanesel_ref, groupsel_ref, b_ref, lagc_ref,
                   x_in_ref, x_out_ref, scratch, *, t, w, base, first, nb,
                   guard, fast, g):
    i = pl.program_id(0)
    xlag = xlag_ref[0]
    if first:
        @pl.when(i == _i32(0))
        def _():
            x_out_ref[...] = x_in_ref[...]

    for j in range(MB):
        bi = base + i * MB + j

        def body(bs):
            # pid_ref: per-program (MB, g) SMEM block, row j = block bi's
            # patch list (guard skips padding blocks, so j is always real)
            for k in range(g):
                scratch[k, :] = x_out_ref[pid_ref[0, j, k], :]
            prod = _gather_rows_banks(
                scratch[...],
                lcols_ref[j * t:(j + 1) * t, :].astype(jnp.int32),
                vals_ref[j * t:(j + 1) * t, :],
                t, g // 8,
            )
            y_grp = _vpu_reduce(prod, w, lanesel_ref[...], groupsel_ref[...])
            y = _lane_gather(y_grp, perm_ref[pl.ds(j, 1), :])
            tvec = (b_ref[pl.ds(j, 1), :] - y
                    - lagc_ref[pl.ds(j, 1), :] * xlag)
            dx = jnp.dot(tvec.astype(kinvT_ref.dtype) if fast else tvec,
                         kinvT_ref[j, :, :],
                         preferred_element_type=jnp.float32,
                         precision=(lax.Precision.DEFAULT if fast
                                    else lax.Precision.HIGHEST))
            x_out_ref[pl.ds(bs, 1), :] = x_out_ref[pl.ds(bs, 1), :] + dx

        if guard:
            bv = _i32(bi)
            pl.when(bv < _i32(nb))(
                lambda: body(jnp.minimum(bv, _i32(nb - 1))))
        else:
            body(_i32(bi))


def sor_sweep_tpu6(
    kell: KernelEll6,
    kinvT_sg: tuple,  # per-segment [nblocks,128,128] one-shot matrices
    x2: jnp.ndarray,  # [nblocks, 128]
    x_lag: jnp.ndarray,
    b2: jnp.ndarray,
    lagc2: jnp.ndarray,
) -> jnp.ndarray:
    """One exact (block, class)-GS sweep in storage block order.

    If the K matrices are bf16 (pack_oneshot_K6 dtype), the one-shot step
    runs a single-pass MXU dot ("fast" mode): the per-sweep update K(b-Ax)
    is perturbed ~1e-3 relative — the smoother contraction changes
    imperceptibly and the FIXED POINT is untouched (dx = 0 iff r = 0 for
    any nonsingular K), but bit-parity with the f32 oracle is waived.
    """
    dtype = kell.segments[0].vals.dtype
    lanesel = jnp.asarray(_lanesel())
    groupsel = jnp.asarray(_groupsel())
    z2 = lambda i, *_: (np.int32(0),) * 2
    rowspec_full = pl.BlockSpec(x2.shape, z2, memory_space=pltpu.VMEM)
    xl = jnp.asarray([x_lag], dtype)
    nb = kell.nblocks
    nb_cov = max(sg.block_base + sg.nblocks for sg in kell.segments)

    def pad_rows(v):
        if nb_cov == nb:
            return v
        return jnp.concatenate(
            [v, jnp.zeros((nb_cov - nb,) + v.shape[1:], v.dtype)], 0)

    perm_pad = pad_rows(kell.perm)
    b_pad = pad_rows(b2)
    lagc_pad = pad_rows(lagc2)
    pids3 = pad_rows(kell.pids.reshape(nb, kell.gmax)).reshape(
        nb_cov // MB, MB, kell.gmax)
    for si, sg in enumerate(kell.segments):
        t = sg.tiles
        seg_row = functools.partial(
            lambda b0, i, *_: (b0 + i, np.int32(0)), sg.block_base // MB)
        seg_row3 = functools.partial(
            lambda b0, i, *_: (b0 + i, np.int32(0), np.int32(0)),
            sg.block_base // MB)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(sg.nblocks // MB,),
            in_specs=[
                # per-program SMEM block of this program's pids rows (a
                # whole-array prefetch overflows SMEM at 1M x wide gmax)
                pl.BlockSpec((1, MB, kell.gmax), seg_row3,
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1,), lambda i, *_: (np.int32(0),),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((MB * t, LANES), lambda i, *_: (i, np.int32(0))),
                pl.BlockSpec((MB * t, LANES), lambda i, *_: (i, np.int32(0))),
                pl.BlockSpec((MB, LANES), seg_row),
                pl.BlockSpec((MB, LANES, LANES),
                             lambda i, *_: (i, np.int32(0), np.int32(0))),
                pl.BlockSpec((8, LANES), z2, memory_space=pltpu.VMEM),
                pl.BlockSpec((8, LANES), z2, memory_space=pltpu.VMEM),
                pl.BlockSpec((MB, LANES), seg_row),
                pl.BlockSpec((MB, LANES), seg_row),
                rowspec_full,
            ],
            out_specs=pl.BlockSpec(x2.shape, z2, memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((kell.gmax, LANES), dtype)],
        )
        x2 = pl.pallas_call(
            functools.partial(
                _sweep6_kernel, t=t, w=sg.windows, base=sg.block_base,
                first=True, nb=nb,
                guard=sg.block_base + sg.nblocks > nb,
                fast=kinvT_sg[si].dtype == jnp.bfloat16,
                g=kell.gmax,
            ),
            out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
            grid_spec=grid_spec,
            input_output_aliases={10: 0},
        )(
            pids3, xl, sg.vals, sg.lcols, perm_pad,
            kinvT_sg[si], lanesel, groupsel, b_pad, lagc_pad, x2,
        )
    return x2


def pad_segment_windows(kell: KernelEll6, windows: int) -> KernelEll6:
    """Pad a SINGLE-segment layout to a larger per-group window count.

    Used by the domain partitioner (parallel/partition.py): shard_map needs
    identical table shapes and kernel constants on every device, so each
    shard's single-segment layout is padded to the max W across shards.
    Padding tile rows carry zero values and point at scratch slot 0 (always
    loaded), preserving the one-patch-per-tile-row gather invariant.
    """
    assert len(kell.segments) == 1, "pad_segment_windows: single-segment only"
    sg = kell.segments[0]
    if windows == sg.windows:
        return kell
    assert windows > sg.windows
    nbk, W0, W1 = sg.nblocks, sg.windows, windows

    def pad(v, fill):
        a = np.asarray(v).reshape(nbk, 8, W0, LANES)
        out = np.full((nbk, 8, W1, LANES), fill, dtype=a.dtype)
        out[:, :, :W0] = a
        return jnp.asarray(out.reshape(nbk * 8 * W1, LANES))

    sg2 = Segment(
        vals=pad(sg.vals, 0.0),
        lcols=pad(sg.lcols, 0),
        windows=W1,
        nblocks=nbk,
        block_base=sg.block_base,
    )
    return dataclasses.replace(kell, segments=(sg2,))


def pad_gmax(kell: KernelEll6, gmax: int) -> KernelEll6:
    """Pad the per-block patch list to a larger ``gmax`` (multiple of 8).

    Pad slots repeat the block's first patch — the same always-valid-load
    convention prepare_kernel_ell6 uses — so kernels built from shards with
    differing patch spreads can share one stacked pids layout."""
    if gmax == kell.gmax:
        return kell
    assert gmax > kell.gmax and gmax % 8 == 0
    p = np.asarray(kell.pids).reshape(kell.nblocks, kell.gmax)
    out = np.concatenate(
        [p, np.broadcast_to(p[:, :1], (p.shape[0], gmax - kell.gmax))], 1)
    return dataclasses.replace(
        kell, pids=jnp.asarray(out.reshape(-1)), gmax=int(gmax))


# ---------------------------------------------------------------------------
# v7 sweep: per-program union scratch (hoisted x loads)
# ---------------------------------------------------------------------------
#
# The v6 sweep reloads GMAX x-patches per BLOCK; the load->gather->dot->
# store chain serializes and dominates (measured 5.9 ms vs 2.4 ms with
# loads hoisted at 1M/k70, scripts/ksweepprobe.py).  v7 loads the UNION of
# an MB-program's patches ONCE, keeps each block's own patch at slot j, and
# writes the updated row back into the scratch slot after each block —
# bit-identical (block, class)-GS semantics, ~2.4x faster.


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("lcols8", "pids8"),
    meta_fields=("g8max",),
)
@dataclasses.dataclass(frozen=True)
class UnionSweep:
    """Union-scratch relabeling of a KernelEll6 for the v7 sweep."""

    lcols8: tuple  # per-segment [nblocks*T, 128] i16: (union_slot<<7 | lane)
    pids8: jnp.ndarray  # [n_groups * g8max] i32 x-patch ids (own 8 first)
    g8max: int  # union slots per program (multiple of 8, <= 32)


def union_sweep_tables(kell: KernelEll6, max_slots: int = 32) -> UnionSweep:
    """Host-side repack: per-MB-group union patch lists + slot-relabeled
    column tables.  Slot j < MB is block j's own patch (so the kernel can
    update it in place); off-group patches follow.

    Raises Ell4Unsupported when a group's union exceeds ``max_slots``
    (callers fall back to the v6 sweep).
    """
    nb = kell.nblocks
    nb_cov = max(s.block_base + s.nblocks for s in kell.segments)
    nmb = nb_cov // MB
    pids = np.asarray(kell.pids).reshape(nb, kell.gmax)

    others: list[np.ndarray] = []
    for g in range(nmb):
        lo, hi = g * MB, g * MB + MB
        blocks = range(lo, min(hi, nb))
        if len(list(blocks)) == 0:
            others.append(np.zeros(0, np.int64))
            continue
        u = np.unique(pids[lo:min(hi, nb)])
        others.append(u[(u < lo) | (u >= hi)])
    max_others = max((o.size for o in others), default=0)
    g8max = MB + _round_up(max(max_others, 1), 8)
    if g8max > max_slots:
        raise Ell4Unsupported(
            f"union sweep needs {g8max} scratch slots > {max_slots}"
        )

    pids8 = np.zeros((nmb, g8max), dtype=np.int64)
    # slot -> patch; own blocks first (clipped so loads stay in range)
    for g in range(nmb):
        pids8[g, :MB] = np.minimum(np.arange(g * MB, g * MB + MB), nb - 1)
        o = others[g]
        if o.size:
            pids8[g, MB:MB + o.size] = o
        # pad slots repeat a real patch (always-loaded row 0 of the list)
        pids8[g, MB + o.size:] = pids8[g, 0]

    # dense (group, patch) -> union slot lookup, then one fancy-index pass
    P = kell.x_rows
    slotmap = np.zeros((nmb, P), dtype=np.int16)
    for g in range(nmb):
        own = np.arange(g * MB, min(g * MB + MB, P))
        slotmap[g, own] = np.arange(own.size)
        o = others[g]
        if o.size:
            slotmap[g, o] = MB + np.arange(o.size)

    lcols8 = []
    for sg in kell.segments:
        t = sg.tiles
        lc = np.asarray(sg.lcols).astype(np.int32) & 0xFFFF
        hi_old = lc >> 7
        lane = lc & (LANES - 1)
        nbk = sg.nblocks
        # block id per tile row -> group id; old slot -> patch -> union slot
        blk = sg.block_base + np.arange(nbk * t) // t
        blk_real = np.minimum(blk, nb - 1)
        pat = pids[blk_real[:, None], np.minimum(hi_old, kell.gmax - 1)]
        slot = slotmap[(blk_real // MB)[:, None], pat]
        lcols8.append(jnp.asarray(
            ((slot.astype(np.int32) << 7) | lane).astype(np.int16)))

    return UnionSweep(
        lcols8=tuple(lcols8),
        pids8=jnp.asarray(pids8.reshape(-1).astype(np.int32)),
        g8max=int(g8max),
    )


def _gather_rows_banks(scratch, lcols, vals, t, nbanks):
    """_gather_rows generalized to nbanks 8-row scratch banks."""
    hi = lax.shift_right_logical(lcols, _i32(7))
    lo = lax.bitwise_and(lcols, _i32(LANES - 1))
    banks = [scratch[8 * b:8 * b + 8, :] for b in range(nbanks)]
    parts = []
    for tt in range(t // 8):
        sl = slice(8 * tt, 8 * tt + 8)
        h8 = lax.bitwise_and(hi[sl], _i32(7))
        tab = _sublane_gather(banks[0], h8)
        for b in range(1, nbanks):
            tb = _sublane_gather(banks[b], h8)
            tab = jnp.where(hi[sl] < _i32(8 * b), tab, tb)
        parts.append(_lane_gather(tab, lo[sl]))
    return vals * jnp.concatenate(parts, axis=0)


def _sweep7_kernel(pid8_ref, xlag_ref, vals_ref, lcols_ref, perm_ref,
                   kinvT_ref, lanesel_ref, groupsel_ref, b_ref, lagc_ref,
                   x_in_ref, x_out_ref, scratch, *, t, w, base, first, nb,
                   guard, fast, g8, stale):
    i = pl.program_id(0)
    xlag = xlag_ref[0]
    if first:
        @pl.when(i == _i32(0))
        def _():
            x_out_ref[...] = x_in_ref[...]

    # pid8_ref: this program's (1, 1, g8) SMEM block of union slot -> x row
    for k in range(g8):
        scratch[k, :] = x_out_ref[pid8_ref[0, 0, k], :]

    for j in range(MB):
        bi = base + i * MB + j

        def body(bs):
            prod = _gather_rows_banks(
                scratch[...],
                lcols_ref[j * t:(j + 1) * t, :].astype(jnp.int32),
                vals_ref[j * t:(j + 1) * t, :],
                t, g8 // 8,
            )
            y_grp = _vpu_reduce(prod, w, lanesel_ref[...], groupsel_ref[...])
            y = _lane_gather(y_grp, perm_ref[pl.ds(j, 1), :])
            tvec = (b_ref[pl.ds(j, 1), :] - y
                    - lagc_ref[pl.ds(j, 1), :] * xlag)
            dx = jnp.dot(tvec.astype(kinvT_ref.dtype) if fast else tvec,
                         kinvT_ref[j, :, :],
                         preferred_element_type=jnp.float32,
                         precision=(lax.Precision.DEFAULT if fast
                                    else lax.Precision.HIGHEST))
            # scratch slot j IS block bs's x row (union layout invariant)
            newrow = scratch[j:j + 1, :] + dx
            x_out_ref[pl.ds(bs, 1), :] = newrow
            if not stale:
                # exact block-sequential GS: later blocks in this program
                # see the fresh row (serializes the per-block chain)
                scratch[j:j + 1, :] = newrow

        if guard:
            bv = _i32(bi)
            pl.when(bv < _i32(nb))(
                lambda: body(jnp.minimum(bv, _i32(nb - 1))))
        else:
            body(_i32(bi))


def sor_sweep_tpu7(
    kell: KernelEll6,
    union: UnionSweep,
    kinvT_sg: tuple,
    x2: jnp.ndarray,
    x_lag: jnp.ndarray,
    b2: jnp.ndarray,
    lagc2: jnp.ndarray,
    stale_program: bool = False,
) -> jnp.ndarray:
    """One (block, class)-GS sweep, union-scratch edition.

    Default: identical semantics (and arithmetic) to sor_sweep_tpu6; the x
    loads are hoisted to one per program and kept coherent by writing each
    block's updated row back to its scratch slot.

    ``stale_program=True``: blocks within one MB-program read the
    program-start snapshot (no scratch writeback) — an (MB-block)-Jacobi /
    in-block-GS hybrid.  The FIXED POINT is unchanged (dx = K r = 0 iff
    r = 0); only the contraction rate moves (measured ~1e-3 rho delta on
    production operators, scripts/rho_delta.py --stale).  This breaks the
    per-block serial chain, which dominates the exact sweep's wall time
    (2.4 ms vs 5.9 ms at 1M/k70, scripts/ksweepprobe.py).
    """
    dtype = kell.segments[0].vals.dtype
    lanesel = jnp.asarray(_lanesel())
    groupsel = jnp.asarray(_groupsel())
    z2 = lambda i, *_: (np.int32(0),) * 2
    rowspec_full = pl.BlockSpec(x2.shape, z2, memory_space=pltpu.VMEM)
    xl = jnp.asarray([x_lag], dtype)
    nb = kell.nblocks
    nb_cov = max(sg.block_base + sg.nblocks for sg in kell.segments)
    g8 = union.g8max
    pids8_3 = union.pids8.reshape(-1, 1, g8)

    def pad_rows(v):
        if nb_cov == nb:
            return v
        return jnp.concatenate(
            [v, jnp.zeros((nb_cov - nb, LANES), v.dtype)], 0)

    perm_pad = pad_rows(kell.perm)
    b_pad = pad_rows(b2)
    lagc_pad = pad_rows(lagc2)
    for si, sg in enumerate(kell.segments):
        t = sg.tiles
        seg_row = functools.partial(
            lambda b0, i, *_: (b0 + i, np.int32(0)), sg.block_base // MB)
        seg_row3 = functools.partial(
            lambda b0, i, *_: (b0 + i, np.int32(0), np.int32(0)),
            sg.block_base // MB)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(sg.nblocks // MB,),
            in_specs=[
                # this program's (1, 1, g8) union slot->row SMEM block
                pl.BlockSpec((1, 1, g8), seg_row3,
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1,), lambda i, *_: (np.int32(0),),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((MB * t, LANES), lambda i, *_: (i, np.int32(0))),
                pl.BlockSpec((MB * t, LANES), lambda i, *_: (i, np.int32(0))),
                pl.BlockSpec((MB, LANES), seg_row),
                pl.BlockSpec((MB, LANES, LANES),
                             lambda i, *_: (i, np.int32(0), np.int32(0))),
                pl.BlockSpec((8, LANES), z2, memory_space=pltpu.VMEM),
                pl.BlockSpec((8, LANES), z2, memory_space=pltpu.VMEM),
                pl.BlockSpec((MB, LANES), seg_row),
                pl.BlockSpec((MB, LANES), seg_row),
                rowspec_full,
            ],
            out_specs=pl.BlockSpec(x2.shape, z2, memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((g8, LANES), dtype)],
        )
        x2 = pl.pallas_call(
            functools.partial(
                _sweep7_kernel, t=t, w=sg.windows, base=sg.block_base,
                first=True, nb=nb,
                guard=sg.block_base + sg.nblocks > nb,
                fast=kinvT_sg[si].dtype == jnp.bfloat16,
                g8=g8, stale=stale_program,
            ),
            out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
            grid_spec=grid_spec,
            input_output_aliases={10: 0},
        )(
            pids8_3, xl, sg.vals, union.lcols8[si], perm_pad,
            kinvT_sg[si], lanesel, groupsel, b_pad, lagc_pad, x2,
        )
    return x2


def pack_oneshot_K6(kell: KernelEll6, kinvT: np.ndarray, dtype=jnp.float32):
    """Slice [nb,128,128] one-shot matrices into per-segment padded arrays."""
    out = []
    kv = np.asarray(kinvT)
    for sg in kell.segments:
        kk = np.zeros((sg.nblocks, LANES, LANES), dtype=np.float64)
        hi = min(sg.block_base + sg.nblocks, kv.shape[0])
        kk[: hi - sg.block_base] = kv[sg.block_base:hi]
        out.append(jnp.asarray(kk, dtype))
    return tuple(out)
