"""Fused Pallas TPU kernels: windowed-ELL SpMV and the (block, class) SOR sweep.

Why a kernel at all: XLA:TPU lowers unstructured gathers to a scalar path —
measured 0.14 Gnnz/s (~500x off the HBM roofline) for the ELL SpMV that
dominates every solve.  These kernels exploit the windowed-ELL invariant
(ops/ell.py): all columns of a row block live in a narrow window of x, so a
block's gather becomes (W/128) lane-table gathers (`tpu.dynamic_gather` via
lax.gather) + selects on VMEM-resident data — no scalar loops, no scatter.

Data layout (prepared once per operator by `prepare_kernel_ell`), chosen so
no Mosaic lane-reshape is ever needed:

  * rows are grouped (block, class, slot): block = ``block_rows`` rows,
    class = ``class_size`` (S) rows (an in-block independent set, see
    geometry/coloring.py), slot = position in class;
  * ELL values/columns are stored CLASS-INTERLEAVED, slot-fastest:
    flat[((blk*NC + c)*Kp + k)*S + s] = ell[blk*B + c*S + s, k]
    i.e. each class is ``tpc = S*Kp/128`` consecutive [*, 128] tile rows;
  * row sums then become two constant 0/1 matmuls (MXU):
    y[c, s] = sum_k prod[c, k, s]  =  SelL @ (prod @ SelR)
    with SelR[l, j] = [l % S == j] and SelL selecting each class's tiles;
  * x is [*, 128] 2-D so the per-block window slice is a cheap
    sublane-direction dynamic slice; window starts are 128-aligned.

The SOR sweep kernel implements the EXACT same (block, class) Gauss-Seidel
as the XLA path (ops/smoothers._gs_sweep): the Pallas grid is sequential on
a TensorCore, giving cross-block GS for free; in-block classes see earlier
classes' updates through in-place VMEM writes.  Mosaic has no f64, so TPU
kernels run in f32 (the f64 parity path stays on CPU; mixed-precision outer
refinement recovers tight tolerances).
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

from meshlessmultigridpoisson_tpu.ops.ell import EllMatrix

LANES = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("vals_flat", "lcols_flat", "win_start"),
    meta_fields=(
        "nrows", "ncols", "block_rows", "class_size", "win_size", "width",
        "nrows_pad",
    ),
)
@dataclasses.dataclass(frozen=True)
class KernelEll:
    """Windowed ELL re-packed for the TPU kernels (see module docstring)."""

    vals_flat: jnp.ndarray  # [n_pad*Kp/128, 128] f32, class-interleaved
    lcols_flat: jnp.ndarray  # [n_pad*Kp/128, 128] i32
    win_start: jnp.ndarray  # [nblocks] i32 (multiples of 128)
    nrows: int
    ncols: int
    block_rows: int
    class_size: int
    win_size: int  # multiple of 128, includes alignment slack
    width: int  # Kp
    nrows_pad: int

    @property
    def nblocks(self) -> int:
        return self.nrows_pad // self.block_rows

    @property
    def num_classes(self) -> int:
        return self.block_rows // self.class_size

    @property
    def tiles_per_class(self) -> int:
        return self.class_size * self.width // LANES

    @property
    def tiles_per_block(self) -> int:
        return self.block_rows * self.width // LANES

    @property
    def x_pad(self) -> int:
        return _round_up(self.ncols, LANES) + self.win_size


def prepare_kernel_ell(
    ell: EllMatrix, class_size: int = 8, dtype=jnp.float32
) -> KernelEll:
    """Host-side repack of an EllMatrix into the class-interleaved layout."""
    b = ell.block_rows
    s = class_size
    if b % LANES != 0:
        raise ValueError("block_rows must be a multiple of 128 for TPU kernels")
    w0 = ell.width
    # S*Kp must be lane-divisible
    kp = _round_up(w0 * s, LANES) // s
    n_pad = ell.nrows_pad
    nblocks = n_pad // b
    nc = b // s

    vals = np.zeros((n_pad, kp), dtype=np.float64)
    vals[:, :w0] = np.asarray(ell.vals)
    lcols = np.zeros((n_pad, kp), dtype=np.int64)
    lcols[:, :w0] = np.asarray(ell.lcols)
    lcols[:, w0:] = lcols[:, :1]  # pad slots reuse col 0 (value 0 anyway)

    ws = np.asarray(ell.win_start).astype(np.int64)
    ws_al = (ws // LANES) * LANES
    lcols = lcols + np.repeat(ws - ws_al, b)[:, None]
    win_size = _round_up(ell.win_size + LANES, LANES)
    assert lcols.max(initial=0) < win_size

    def interleave(a):
        # [n_pad, kp] -> [nblocks, nc, s, kp] -> [nblocks, nc, kp, s] -> flat
        return (
            a.reshape(nblocks, nc, s, kp)
            .transpose(0, 1, 3, 2)
            .reshape(-1, LANES)
        )

    return KernelEll(
        vals_flat=jnp.asarray(interleave(vals), dtype),
        lcols_flat=jnp.asarray(interleave(lcols).astype(np.int32)),
        win_start=jnp.asarray(ws_al.astype(np.int32)),
        nrows=ell.nrows,
        ncols=ell.ncols,
        block_rows=b,
        class_size=s,
        win_size=win_size,
        width=kp,
        nrows_pad=n_pad,
    )


def _i32(v) -> jnp.ndarray:
    """Kernel-safe int32 constant (x64 mode must not leak int64 into Mosaic)."""
    return jnp.asarray(v, jnp.int32)


def _sel_r(s: int, dtype) -> np.ndarray:
    """[128, S] slot selector: SelR[l, j] = 1 if l % S == j."""
    out = np.zeros((LANES, s))
    out[np.arange(LANES), np.arange(LANES) % s] = 1.0
    return out.astype(dtype)


def _sel_l(nc: int, tpc: int, dtype) -> np.ndarray:
    """[NC, NC*tpc] class selector: SelL[c, t] = 1 if t // tpc == c."""
    out = np.zeros((nc, nc * tpc))
    for c in range(nc):
        out[c, c * tpc : (c + 1) * tpc] = 1.0
    return out.astype(dtype)


def _lane_gather(tab: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """out[i, j] = tab[i, idx[i, j]]; lowers to tpu.dynamic_gather."""
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


def _window_gather(xw: jnp.ndarray, lcols: jnp.ndarray, nchunks: int) -> jnp.ndarray:
    """Gather xw.flat[lcols] where xw is [nchunks, 128] and lcols [T, 128] < W."""
    t = lcols.shape[0]
    hi = lax.shift_right_logical(lcols, _i32(7))
    lo = lax.bitwise_and(lcols, _i32(LANES - 1))
    acc = jnp.zeros(lcols.shape, xw.dtype)
    for s in range(nchunks):
        tab = jnp.broadcast_to(xw[s][None, :], (t, LANES))
        g = _lane_gather(tab, lo)
        acc = jnp.where(hi == _i32(s), g, acc)
    return acc


def _pad_x_2d(kell: KernelEll, x: jnp.ndarray) -> jnp.ndarray:
    xp = jnp.zeros(kell.x_pad, x.dtype).at[: x.shape[0]].set(x)
    return xp.reshape(-1, LANES)


# ---------------------------------------------------------------------------
# SpMV kernel
# ---------------------------------------------------------------------------


def _spmv_kernel(ws_ref, vals_ref, lcols_ref, selr_ref, sell_ref, x_ref,
                 out_ref, *, nchunks):
    i = pl.program_id(0)
    start = lax.div(ws_ref[i], _i32(LANES))
    xw = x_ref[pl.ds(start, nchunks), :]
    g = _window_gather(xw, lcols_ref[...], nchunks)
    prod = vals_ref[...] * g  # [tpb, 128]
    sel_r = selr_ref[...]
    sel_l = sell_ref[...]
    part = jnp.dot(prod, sel_r, preferred_element_type=prod.dtype,
                   precision=lax.Precision.HIGHEST)  # [tpb, S]
    y = jnp.dot(sel_l, part, preferred_element_type=prod.dtype,
                precision=lax.Precision.HIGHEST)  # [NC, S]
    out_ref[...] = y[None]


def spmv_tpu(kell: KernelEll, x: jnp.ndarray) -> jnp.ndarray:
    """y = A @ x on TPU; x is [>= ncols], returns [nrows_pad]."""
    dtype = kell.vals_flat.dtype
    x2 = _pad_x_2d(kell, x.astype(dtype))
    tpb = kell.tiles_per_block
    nc, s = kell.num_classes, kell.class_size
    nchunks = kell.win_size // LANES
    sel_r = _sel_r(s, np.dtype(dtype))
    sel_l = _sel_l(nc, kell.tiles_per_class, np.dtype(dtype))
    # explicit int32 index maps everywhere: under jax x64 the auto-generated
    # maps emit i64 constants, which Mosaic refuses to legalize
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(kell.nblocks,),
        in_specs=[
            pl.BlockSpec((tpb, LANES), lambda i, ws: (i, np.int32(0))),
            pl.BlockSpec((tpb, LANES), lambda i, ws: (i, np.int32(0))),
            pl.BlockSpec((LANES, s), lambda i, ws: (np.int32(0),) * 2,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nc, tpb), lambda i, ws: (np.int32(0),) * 2,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(x2.shape, lambda i, ws: (np.int32(0),) * 2,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nc, s), lambda i, ws: (i, np.int32(0), np.int32(0))),
    )
    out = pl.pallas_call(
        functools.partial(_spmv_kernel, nchunks=nchunks),
        out_shape=jax.ShapeDtypeStruct((kell.nblocks, nc, s), dtype),
        grid_spec=grid_spec,
    )(kell.win_start, kell.vals_flat, kell.lcols_flat,
      jnp.asarray(sel_r), jnp.asarray(sel_l), x2)
    return out.reshape(-1)


# ---------------------------------------------------------------------------
# (block, class) SOR sweep kernel — exact GS, in-place
# ---------------------------------------------------------------------------


def _sweep_kernel(
    ws_ref, xlag_ref, vals_ref, lcols_ref, selr_ref, dinv_ref, b_ref, m_ref,
    w_ref, lagc_ref, x_in_ref, x_out_ref, *, nchunks, bsz, s, tpc,
):
    """One block of the sweep.  x_out is aliased to x_in (in-place); the
    sequential Pallas grid makes cross-block GS exact; in-block classes see
    earlier classes' writes through x_out_ref."""
    i = pl.program_id(0)
    start = lax.div(ws_ref[i], _i32(LANES))
    nc = bsz // s
    xlag = xlag_ref[0]
    rows0 = i * (bsz // LANES)  # first sublane row of this block in x2d

    # The aliased output buffer is not guaranteed to hold the input; copy
    # once before any block computes (sequential grid => safe).
    @pl.when(i == _i32(0))
    def _():
        x_out_ref[...] = x_in_ref[...]

    for c in range(nc):
        xw = x_out_ref[pl.ds(start, nchunks), :]
        lc = lcols_ref[c * tpc : (c + 1) * tpc, :]
        v = vals_ref[c * tpc : (c + 1) * tpc, :]
        g = _window_gather(xw, lc, nchunks)
        part = jnp.dot(v * g, selr_ref[...], preferred_element_type=g.dtype,
                       precision=lax.Precision.HIGHEST)
        y = jnp.sum(part, axis=0)  # [S] full row sums incl diag
        sub = (c * s) // LANES
        lane0 = (c * s) % LANES
        xt = x_out_ref[rows0 + sub, lane0 : lane0 + s]
        d_inv = dinv_ref[0, sub, lane0 : lane0 + s]
        bb = b_ref[0, sub, lane0 : lane0 + s]
        m = m_ref[0, sub, lane0 : lane0 + s]
        w = w_ref[0, sub, lane0 : lane0 + s]
        lagc = lagc_ref[0, sub, lane0 : lane0 + s]
        diag = 1.0 / d_inv  # pad rows have diag 1 by construction
        off = y + lagc * xlag - diag * xt
        xi = (1.0 - w) * xt + w * d_inv * (bb - off)
        x_out_ref[rows0 + sub, lane0 : lane0 + s] = jnp.where(m > 0, xi, xt)


def sor_sweep_tpu(
    kell: KernelEll,
    x2: jnp.ndarray,  # [x_pad/128, 128] padded 2-D x (updated in place)
    x_lag: jnp.ndarray,
    dinv3: jnp.ndarray,  # [nblocks, B/128, 128] 1/diag
    b3: jnp.ndarray,
    mask3: jnp.ndarray,
    omega3: jnp.ndarray,
    lagc3: jnp.ndarray,
) -> jnp.ndarray:
    """One exact (block, class)-GS sweep; returns the updated 2-D x."""
    dtype = kell.vals_flat.dtype
    tpb = kell.tiles_per_block
    bsz = kell.block_rows
    s = kell.class_size
    tpc = kell.tiles_per_class
    nchunks = kell.win_size // LANES
    sel_r = _sel_r(s, np.dtype(dtype))
    rows128 = bsz // LANES
    z2 = lambda i, ws: (np.int32(0),) * 2
    rowspec = pl.BlockSpec((1, rows128, LANES),
                           lambda i, ws: (i, np.int32(0), np.int32(0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(kell.nblocks,),
        in_specs=[
            pl.BlockSpec((1,), lambda i, ws: (np.int32(0),),
                         memory_space=pltpu.SMEM),  # xlag
            pl.BlockSpec((tpb, LANES), lambda i, ws: (i, np.int32(0))),
            pl.BlockSpec((tpb, LANES), lambda i, ws: (i, np.int32(0))),
            pl.BlockSpec((LANES, s), z2, memory_space=pltpu.VMEM),  # sel_r
            rowspec,
            rowspec,
            rowspec,
            rowspec,
            rowspec,
            pl.BlockSpec(x2.shape, z2, memory_space=pltpu.VMEM),  # x (aliased)
        ],
        out_specs=pl.BlockSpec(x2.shape, z2, memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(
            _sweep_kernel, nchunks=nchunks, bsz=bsz, s=s, tpc=tpc
        ),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
        grid_spec=grid_spec,
        input_output_aliases={10: 0},  # x_in (index includes the prefetch arg)
    )(
        kell.win_start,
        jnp.asarray([x_lag], dtype),
        kell.vals_flat,
        kell.lcols_flat,
        jnp.asarray(sel_r),
        dinv3,
        b3,
        mask3,
        omega3,
        lagc3,
        x2,
    )
    return out


# ---------------------------------------------------------------------------
# v2: patch-table kernels (N-independent gather cost)
# ---------------------------------------------------------------------------
#
# With KD-tile ordering (geometry/ordering.kd_tile_ordering), every aligned
# 128-row run of x is a spatially compact patch and a 256-row block's
# stencils touch a bounded set of patches (measured median 12 / max 19,
# independent of N, vs. an RCM window that grows like sqrt(N)).  v2 stores
# TABLE-LOCAL column indices and a per-block patch list; kernels assemble a
# [G, 128] gather table from the patch rows of x and run the same
# chunk-gather loop over G chunks.


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("vals_flat", "lcols_flat", "patch_ids"),
    meta_fields=(
        "nrows", "ncols", "block_rows", "class_size", "num_patches", "width",
        "nrows_pad",
    ),
)
@dataclasses.dataclass(frozen=True)
class KernelEll2:
    """Class-interleaved ELL + per-block patch tables (see above)."""

    vals_flat: jnp.ndarray  # [n_pad*Kp/128, 128]
    lcols_flat: jnp.ndarray  # [n_pad*Kp/128, 128] int32 TABLE-LOCAL
    patch_ids: jnp.ndarray  # [nblocks * G] int32 sublane rows of x2d
    nrows: int
    ncols: int
    block_rows: int
    class_size: int
    num_patches: int  # G
    width: int  # Kp
    nrows_pad: int

    @property
    def nblocks(self) -> int:
        return self.nrows_pad // self.block_rows

    @property
    def num_classes(self) -> int:
        return self.block_rows // self.class_size

    @property
    def tiles_per_class(self) -> int:
        return self.class_size * self.width // LANES

    @property
    def tiles_per_block(self) -> int:
        return self.block_rows * self.width // LANES

    @property
    def x_rows(self) -> int:
        return _round_up(self.ncols, LANES) // LANES


def prepare_kernel_ell2(
    ell: EllMatrix, class_size: int = 8, dtype=jnp.float32
) -> KernelEll2:
    """Host-side repack into the patch-table layout."""
    from meshlessmultigridpoisson_tpu.ops.ell import global_cols

    b = ell.block_rows
    s = class_size
    if b % LANES != 0:
        raise ValueError("block_rows must be a multiple of 128")
    w0 = ell.width
    kp = _round_up(w0 * s, LANES) // s
    n_pad = ell.nrows_pad
    nblocks = n_pad // b
    nc = b // s

    gc = np.zeros((n_pad, kp), dtype=np.int64)
    gc[:, :w0] = np.asarray(global_cols(ell))
    gc[:, w0:] = gc[:, :1]
    vals = np.zeros((n_pad, kp), dtype=np.float64)
    vals[:, :w0] = np.asarray(ell.vals)

    patches = gc >> 7
    g_max = 1
    patch_lists = np.zeros((nblocks, 1), dtype=np.int64)
    per_block = []
    for i in range(nblocks):
        u = np.unique(patches[i * b : (i + 1) * b])
        per_block.append(u)
        g_max = max(g_max, u.size)
    plist = np.zeros((nblocks, g_max), dtype=np.int64)
    lcols = np.empty_like(gc)
    own_per_block = b // LANES  # own patches of a block
    for i, u in enumerate(per_block):
        # own patches first (the sweep kernel refreshes slot 0 per class;
        # with b == 128 the own patch is exactly slot 0)
        own = np.arange(i * own_per_block, (i + 1) * own_per_block)
        own = own[np.isin(own, u)]
        rest = u[~np.isin(u, own)]
        u = np.concatenate([own, rest])
        plist[i, : u.size] = u
        plist[i, u.size :] = u[0]
        # map global col -> local table index
        lut = {p: j for j, p in enumerate(u)}
        pp = patches[i * b : (i + 1) * b]
        loc = np.vectorize(lut.get, otypes=[np.int64])(pp)
        lcols[i * b : (i + 1) * b] = (loc << 7) | (gc[i * b : (i + 1) * b] & 127)

    def interleave(a):
        return (
            a.reshape(nblocks, nc, s, kp).transpose(0, 1, 3, 2).reshape(-1, LANES)
        )

    return KernelEll2(
        vals_flat=jnp.asarray(interleave(vals), dtype),
        lcols_flat=jnp.asarray(interleave(lcols).astype(np.int32)),
        patch_ids=jnp.asarray(plist.reshape(-1).astype(np.int32)),
        nrows=ell.nrows,
        ncols=ell.ncols,
        block_rows=b,
        class_size=s,
        num_patches=g_max,
        width=kp,
        nrows_pad=n_pad,
    )


def _load_patch_table(x_ref, pid_ref, base, g, scratch):
    """Fill scratch [G, 128] with the block's patch rows of the 2-D x."""
    for j in range(g):
        scratch[j, :] = x_ref[pid_ref[base + j], :]


def _spmv2_kernel(pid_ref, vals_ref, lcols_ref, selr_ref, sell_ref, x_ref,
                  out_ref, scratch, *, g):
    i = pl.program_id(0)
    _load_patch_table(x_ref, pid_ref, i * g, g, scratch)
    tab = scratch[...]
    gat = _window_gather(tab, lcols_ref[...], g)
    prod = vals_ref[...] * gat
    part = jnp.dot(prod, selr_ref[...], preferred_element_type=prod.dtype,
                   precision=lax.Precision.HIGHEST)
    y = jnp.dot(sell_ref[...], part, preferred_element_type=prod.dtype,
                precision=lax.Precision.HIGHEST)
    out_ref[...] = y[None]


def spmv_tpu2(kell: KernelEll2, x: jnp.ndarray) -> jnp.ndarray:
    """y = A @ x with patch-table gathers; returns [nrows_pad]."""
    dtype = kell.vals_flat.dtype
    xr = kell.x_rows
    xp = jnp.zeros(xr * LANES, dtype).at[: x.shape[0]].set(x.astype(dtype))
    x2 = xp.reshape(xr, LANES)
    tpb = kell.tiles_per_block
    nc, s = kell.num_classes, kell.class_size
    sel_r = _sel_r(s, np.dtype(dtype))
    sel_l = _sel_l(nc, kell.tiles_per_class, np.dtype(dtype))
    z2 = lambda i, ws: (np.int32(0),) * 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(kell.nblocks,),
        in_specs=[
            pl.BlockSpec((tpb, LANES), lambda i, ws: (i, np.int32(0))),
            pl.BlockSpec((tpb, LANES), lambda i, ws: (i, np.int32(0))),
            pl.BlockSpec((LANES, s), z2, memory_space=pltpu.VMEM),
            pl.BlockSpec((nc, tpb), z2, memory_space=pltpu.VMEM),
            pl.BlockSpec(x2.shape, z2, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nc, s),
                               lambda i, ws: (i, np.int32(0), np.int32(0))),
        scratch_shapes=[pltpu.VMEM((kell.num_patches, LANES), dtype)],
    )
    out = pl.pallas_call(
        functools.partial(_spmv2_kernel, g=kell.num_patches),
        out_shape=jax.ShapeDtypeStruct((kell.nblocks, nc, s), dtype),
        grid_spec=grid_spec,
    )(kell.patch_ids, kell.vals_flat, kell.lcols_flat,
      jnp.asarray(sel_r), jnp.asarray(sel_l), x2)
    return out.reshape(-1)


def _sweep2_kernel(
    pid_ref, xlag_ref, vals_ref, lcols_ref, selr_ref, dinv_ref, b_ref, m_ref,
    w_ref, lagc_ref, x_in_ref, x_out_ref, scratch, *, g, bsz, s, tpc,
):
    i = pl.program_id(0)
    nc = bsz // s
    xlag = xlag_ref[0]
    rows0 = i * (bsz // LANES)

    @pl.when(i == _i32(0))
    def _():
        x_out_ref[...] = x_in_ref[...]

    # foreign patches are frozen for the whole block (cross-block GS reads
    # them fresh here); the block's OWN patch is slot 0 (prepare_kernel_ell2
    # orders it first) and is refreshed before every class below.
    _load_patch_table(x_out_ref, pid_ref, i * g, g, scratch)

    for c in range(nc):
        for j in range(bsz // LANES):  # refresh the block's own patches
            scratch[j, :] = x_out_ref[pid_ref[i * g + j], :]
        tab = scratch[...]
        lc = lcols_ref[c * tpc : (c + 1) * tpc, :]
        v = vals_ref[c * tpc : (c + 1) * tpc, :]
        gat = _window_gather(tab, lc, g)
        part = jnp.dot(v * gat, selr_ref[...], preferred_element_type=gat.dtype,
                       precision=lax.Precision.HIGHEST)
        y = jnp.sum(part, axis=0)
        sub = (c * s) // LANES
        lane0 = (c * s) % LANES
        xt = x_out_ref[rows0 + sub, lane0 : lane0 + s]
        d_inv = dinv_ref[0, sub, lane0 : lane0 + s]
        bb = b_ref[0, sub, lane0 : lane0 + s]
        m = m_ref[0, sub, lane0 : lane0 + s]
        w = w_ref[0, sub, lane0 : lane0 + s]
        lagc = lagc_ref[0, sub, lane0 : lane0 + s]
        diag = 1.0 / d_inv
        off = y + lagc * xlag - diag * xt
        xi = (1.0 - w) * xt + w * d_inv * (bb - off)
        x_out_ref[rows0 + sub, lane0 : lane0 + s] = jnp.where(m > 0, xi, xt)


def sor_sweep_tpu2(
    kell: KernelEll2,
    x2: jnp.ndarray,  # [x_rows, 128]
    x_lag: jnp.ndarray,
    dinv3: jnp.ndarray,
    b3: jnp.ndarray,
    mask3: jnp.ndarray,
    omega3: jnp.ndarray,
    lagc3: jnp.ndarray,
) -> jnp.ndarray:
    dtype = kell.vals_flat.dtype
    tpb = kell.tiles_per_block
    bsz = kell.block_rows
    s = kell.class_size
    tpc = kell.tiles_per_class
    sel_r = _sel_r(s, np.dtype(dtype))
    rows128 = bsz // LANES
    z2 = lambda i, ws: (np.int32(0),) * 2
    rowspec = pl.BlockSpec((1, rows128, LANES),
                           lambda i, ws: (i, np.int32(0), np.int32(0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(kell.nblocks,),
        in_specs=[
            pl.BlockSpec((1,), lambda i, ws: (np.int32(0),),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tpb, LANES), lambda i, ws: (i, np.int32(0))),
            pl.BlockSpec((tpb, LANES), lambda i, ws: (i, np.int32(0))),
            pl.BlockSpec((LANES, s), z2, memory_space=pltpu.VMEM),
            rowspec,
            rowspec,
            rowspec,
            rowspec,
            rowspec,
            pl.BlockSpec(x2.shape, z2, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(x2.shape, z2, memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((kell.num_patches, LANES), dtype)],
    )
    out = pl.pallas_call(
        functools.partial(_sweep2_kernel, g=kell.num_patches, bsz=bsz, s=s,
                          tpc=tpc),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
        grid_spec=grid_spec,
        input_output_aliases={10: 0},
    )(
        kell.patch_ids,
        jnp.asarray([x_lag], dtype),
        kell.vals_flat,
        kell.lcols_flat,
        jnp.asarray(sel_r),
        dinv3,
        b3,
        mask3,
        omega3,
        lagc3,
        x2,
    )
    return out


# ---------------------------------------------------------------------------
# v3 SpMV: XLA-precomputed patch tables (no in-kernel dynamic loads)
# ---------------------------------------------------------------------------
#
# For a pure SpMV (x frozen), the per-block gather tables can be assembled
# OUTSIDE the kernel by one XLA row-gather (slice-gather of 128-wide rows is
# fast, unlike element gathers) and fed as a pipelined blocked input, so the
# kernel body is just the chunk-gather + selector matmuls.  NOT valid for
# the GS sweep (its tables must see earlier blocks' updates).


def _spmv3_kernel(vals_ref, lcols_ref, selr_ref, sell_ref, tab_ref, out_ref):
    g = tab_ref.shape[1]
    gat = _window_gather(tab_ref[0], lcols_ref[...], g)
    prod = vals_ref[...] * gat
    part = jnp.dot(prod, selr_ref[...], preferred_element_type=prod.dtype,
                   precision=lax.Precision.HIGHEST)
    y = jnp.dot(sell_ref[...], part, preferred_element_type=prod.dtype,
                precision=lax.Precision.HIGHEST)
    out_ref[...] = y[None]


def spmv_tpu3(kell: KernelEll2, x: jnp.ndarray) -> jnp.ndarray:
    """y = A @ x with precomputed patch tables; returns [nrows_pad]."""
    dtype = kell.vals_flat.dtype
    xr = kell.x_rows
    xp = jnp.zeros(xr * LANES, dtype).at[: x.shape[0]].set(x.astype(dtype))
    x2 = xp.reshape(xr, LANES)
    g = kell.num_patches
    tables = jnp.take(x2, kell.patch_ids.reshape(kell.nblocks, g), axis=0)
    tpb = kell.tiles_per_block
    nc, s = kell.num_classes, kell.class_size
    sel_r = _sel_r(s, np.dtype(dtype))
    sel_l = _sel_l(nc, kell.tiles_per_class, np.dtype(dtype))
    z2 = lambda i, ws: (np.int32(0),) * 2
    grid_spec = pl.GridSpec(
        grid=(kell.nblocks,),
        in_specs=[
            pl.BlockSpec((tpb, LANES), lambda i: (i, np.int32(0))),
            pl.BlockSpec((tpb, LANES), lambda i: (i, np.int32(0))),
            pl.BlockSpec((LANES, s), lambda i: (np.int32(0),) * 2,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nc, tpb), lambda i: (np.int32(0),) * 2,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, LANES),
                         lambda i: (i, np.int32(0), np.int32(0))),
        ],
        out_specs=pl.BlockSpec((1, nc, s),
                               lambda i: (i, np.int32(0), np.int32(0))),
    )
    out = pl.pallas_call(
        _spmv3_kernel,
        out_shape=jax.ShapeDtypeStruct((kell.nblocks, nc, s), dtype),
        grid_spec=grid_spec,
    )(kell.vals_flat, kell.lcols_flat, jnp.asarray(sel_r), jnp.asarray(sel_l),
      tables)
    return out.reshape(-1)
