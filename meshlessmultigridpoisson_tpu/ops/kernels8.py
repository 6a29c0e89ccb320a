"""v8 Pallas TPU sweep: block-colored Gauss-Seidel (latency wall removed).

Why
---
The v6/v7 sweeps are EXACT (block, class)-GS in storage-block order — the
same per-block serial chain as the reference's lexicographic SOR
(grid.cpp:104-146) lifted to 128-row blocks.  Round-3 measurement
(scripts/ksweepprobe.py, commit e555ded) showed that chain is the wall:
the gather -> reduce -> 1x128 MXU dot -> writeback of each block must
retire before the next block starts (~490 ns x 8192 blocks at 1M rows),
pinning the sweep at 12.4 Gnnz/s = 47% of the measured stream ceiling
while naive "stale program" parallelism (rho 1.8-1.9, divergent —
results/rho_stale_r3.json) is not an acceptable fix.

v8 removes the chain WITHOUT giving up exactness by reordering, not
staleness: 128-row blocks are greedy-colored on the block-coupling graph
(a ~ b iff either reads the other's x rows), and one sweep processes
colors sequentially, blocks within a color in storage order.  Blocks that
share a Pallas program are same-color, hence mutually independent — the
per-program snapshot semantics of the stale kernel become EXACT
Gauss-Seidel under the colored block order, and the hardware can overlap
the gather/dot of consecutive blocks.  This is the same class of deviation
already accepted and measured at row level (PARITY.md section 1,
results/rho_delta_r2.json): same fixed point, contraction rate moves by a
measured, bounded amount (scripts/rho_delta.py --order colored).

Layout
------
Host-side, the single-segment v6 tables are permuted into colored program
order (each program = ``mb`` same-color blocks, tail programs padded by
repeating a block — idempotent under snapshot semantics, so duplicates
collapse to one update).  Column indices are relabeled to per-program
union scratch slots exactly like v7; slot j < mb is program-block j's own
x row.  The kernel writes updated rows straight to the VMEM-resident x
(scattered via a prefetched block-id map) and NEVER writes back to
scratch — there is no intra-program dependence left to honor.
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

from meshlessmultigridpoisson_tpu.ops.kernels4 import (
    Ell4Unsupported,
    _i32,
    _lane_gather,
    LANES,
)
from meshlessmultigridpoisson_tpu.ops.kernels6 import (
    KernelEll6,
    MB,
    _gather_rows_banks,
    _groupsel,
    _lanesel,
    _round_up,
    _vpu_reduce,
)


def color_blocks(pids: np.ndarray, nb: int) -> np.ndarray:
    """Greedy-color the block-coupling graph in storage order.

    ``pids``: [nb, gmax] per-block x-patch lists (padding slots repeat a
    real patch, so np.unique per row is the true patch set).  Blocks a, b
    conflict iff a reads x rows written by b or vice versa; the symmetric
    closure makes every color an independent set, so same-color blocks can
    be updated from a common snapshot with exact-GS semantics.
    """
    adj: list[set] = [set() for _ in range(nb)]
    for b in range(nb):
        for p in np.unique(pids[b]):
            p = int(p)
            if p != b and p < nb:
                adj[b].add(p)
                adj[p].add(b)  # symmetric closure
    colors = np.full(nb, -1, dtype=np.int64)
    for b in range(nb):  # storage (KD-tile) order keeps colors spatial
        used = {int(colors[a]) for a in adj[b] if colors[a] >= 0}
        c = 0
        while c in used:
            c += 1
        colors[b] = c
    return colors


@partial(
    jax.tree_util.register_dataclass,
    data_fields=(
        "vals8", "lcols8", "pids8", "blkid", "perm8", "lagc8", "kinvT8",
    ),
    meta_fields=(
        "g8max", "mb", "nprog", "nb", "windows", "ncolors", "nrows",
        "nrows_pad",
    ),
)
@dataclasses.dataclass(frozen=True)
class ColoredSweep:
    """Colored program-order tables for the v8 sweep.

    Row tables (``perm8``/``lagc8``, and ``permute_b8``'s output) are laid
    out at a FIXED stride of 8 rows per program regardless of ``mb``:
    Mosaic block specs need 8-row sublane alignment, and production 2D
    operators (blocks read ~9-15 patches each) only fit the union-scratch
    bound at mb = 4 or 2.  ``kinvT8``/``vals8``/``lcols8`` stay densely
    packed (their block sublane dims are already aligned).
    """

    vals8: jnp.ndarray   # [nprog * mb * T, 128] f32 (colored order)
    lcols8: jnp.ndarray  # [nprog * mb * T, 128] i16 (slot<<7 | lane)
    pids8: jnp.ndarray   # [nprog * g8max] i32 scratch-slot -> x-row map
    blkid: jnp.ndarray   # [nprog * 8] i32 block id per slot (stride 8)
    perm8: jnp.ndarray   # [nprog * 8, 128] i32 (stride 8)
    lagc8: jnp.ndarray   # [nprog * 8, 128] f32 (stride 8)
    kinvT8: jnp.ndarray  # [nprog * mb, 128, 128] one-shot K^T
    g8max: int  # scratch slots per program (multiple of 8)
    mb: int     # blocks per program (8, 4, or 2)
    nprog: int
    nb: int     # real 128-row blocks
    windows: int
    ncolors: int
    nrows: int
    nrows_pad: int

    @property
    def tiles(self) -> int:
        return 8 * self.windows

    @property
    def expansion(self) -> float:
        """Padded program slots per real block (duplicate-work factor)."""
        return self.nprog * self.mb / max(self.nb, 1)

    def block_order(self) -> np.ndarray:
        """The executed GS block order (host-side; stride-8 pad dropped)."""
        return np.asarray(self.blkid).reshape(
            self.nprog, 8)[:, : self.mb].ravel()


def _color_chunks(colors: np.ndarray, ncolors: int, mb: int) -> np.ndarray:
    chunks = []
    for c in range(ncolors):
        blks = np.flatnonzero(colors == c)
        pad = (-blks.size) % mb
        if pad:
            blks = np.concatenate([blks, np.repeat(blks[-1], pad)])
        chunks.append(blks)
    return np.concatenate(chunks)


def prepare_colored_sweep(
    kell: KernelEll6,
    kinvT: np.ndarray,
    lagc2: np.ndarray,
    k_dtype=jnp.float32,
    max_slots: int = 96,
    max_expand: float = 2.0,
    mb: int | None = None,
    min_blocks: int = 32,
    max_slots_wide: int = 256,
) -> ColoredSweep:
    """Repack a SINGLE-segment v6 layout into colored program order.

    ``kinvT``: [nb, 128, 128] f64 transposed one-shot matrices
    (ops.kernels4.build_oneshot_K).  ``lagc2``: [nb, 128] Lagrange column.
    ``mb``: blocks per program — None (default) tries 8, 4, 2 and keeps
    the first whose program unions fit ``max_slots`` and whose
    duplicate-padding expansion stays under ``max_expand``; 2D production
    operators (9-15 patches per block) typically land on mb=4.

    When nothing fits ``max_slots`` (wide-coupling fine levels: Neumann
    condensation at 100k+ points puts ~80 patches on outlier blocks, so
    program unions exceed 96 — the round-4 133k flagship), a second tier
    allows up to ``max_slots_wide`` scratch slots and picks the mb with
    the least modeled gather work (expansion * g8max * (T/64 + 1/mb)
    scratch-row gathers per useful block).  The hard cap is 256: the i16
    column packing (slot << 7 | lane) tops out at slot 255.  Scratch VMEM
    stays tiny — the cost is the per-tile sublane-gather/select chain,
    which scales with g8max banks and is what the model weighs.  Raises
    Ell4Unsupported only when even the wide tier fails (degenerate dense
    layouts); callers fall back to the exact v7/v6 sweeps.
    """
    assert max_slots_wide <= 256, "i16 slot packing caps scratch at 256"
    if len(kell.segments) != 1:
        raise Ell4Unsupported("colored sweep needs the single-segment layout")
    sg = kell.segments[0]
    nb = kell.nblocks
    if nb < min_blocks:
        # measured on the production ladder (scripts/k8prod.py): at 20
        # blocks the colored sweep is 0.85x v7 (expansion + per-program
        # cost beat the short serial chain); the crossover is ~30 blocks
        raise Ell4Unsupported(
            f"colored sweep loses below {min_blocks} blocks (nb={nb})")
    T = sg.tiles
    pids = np.asarray(kell.pids).reshape(nb, kell.gmax)
    colors = color_blocks(pids, nb)
    ncolors = int(colors.max()) + 1

    last_err = None
    cands = {}  # mb -> (order, nprog, progs, others, g8max)
    for mb_try in ((MB, 4, 2) if mb is None else (mb,)):
        order = _color_chunks(colors, ncolors, mb_try)
        if order.size / nb > max_expand:
            last_err = (f"expansion {order.size / nb:.2f} > {max_expand} "
                        f"at mb={mb_try} ({ncolors} colors over {nb} blocks)")
            continue
        nprog = order.size // mb_try
        progs = order.reshape(nprog, mb_try)
        others = []
        for p in range(nprog):
            own = set(int(b) for b in progs[p])
            u = np.unique(pids[progs[p]])
            others.append(np.array(
                [int(q) for q in u if int(q) not in own], dtype=np.int64))
        max_others = max((o.size for o in others), default=0)
        g8max = _round_up(mb_try + _round_up(max(max_others, 1), 8), 8)
        cands[mb_try] = (order, nprog, progs, others, g8max)
        if g8max > max_slots:
            last_err = (f"{g8max} scratch slots > {max_slots} at mb={mb_try}")
            continue
        mb = mb_try
        break
    else:
        # wide tier: pick the fitting mb with least modeled gather work.
        # Per useful block the kernel pays expansion * g8 * (T/64 + 1/mb)
        # scratch-row gathers (T/8 tiles x g8/8 select banks, plus the g8
        # scratch fill amortized over mb blocks) — g8 dominates, so the
        # tightest-union mb (usually the smallest) wins here, the reverse
        # of tier 1's preference.
        wide = [(o.size / nb * g8 * (T / 64 + 1 / m), m)
                for m, (o, _, _, _, g8) in cands.items()
                if g8 <= max_slots_wide]
        if not wide:
            raise Ell4Unsupported(f"colored sweep: {last_err}")
        mb = min(wide)[1]
        order, nprog, progs, others, g8max = cands[mb]
    del cands

    pids8 = np.zeros((nprog, g8max), dtype=np.int64)
    P = kell.x_rows
    slotmap = np.zeros((nprog, max(P, nb)), dtype=np.int64)
    for p in range(nprog):
        pids8[p, :mb] = progs[p]
        o = others[p]
        if o.size:
            pids8[p, mb:mb + o.size] = o
            slotmap[p, o] = mb + np.arange(o.size)
        pids8[p, mb + o.size:] = pids8[p, 0]
        # own blocks LAST so duplicates resolve to their first slot
        for j in range(mb - 1, -1, -1):
            slotmap[p, progs[p][j]] = j

    # ---- permute tables into colored program order ---------------------------
    rowidx = (order[:, None] * T + np.arange(T)[None, :]).ravel()
    vals8 = np.asarray(sg.vals)[rowidx]

    # relabel columns patch -> program slot, chunked over programs (the
    # intermediate fancy-index arrays are ~8 B/slot; whole-table passes
    # would transiently cost >1 GB at 1M rows on the 2-core setup host)
    lc_src = np.asarray(sg.lcols)
    lcols8 = np.empty((order.size * T, LANES), dtype=np.int16)
    pchunk = max(1, (1 << 20) // (mb * T))
    for p0 in range(0, nprog, pchunk):
        p1 = min(p0 + pchunk, nprog)
        ridx = rowidx[p0 * mb * T:p1 * mb * T]
        lc = lc_src[ridx].astype(np.int32) & 0xFFFF
        hi_old = np.minimum(lc >> 7, kell.gmax - 1)
        lane = lc & (LANES - 1)
        blk_rep = np.repeat(order[p0 * mb:p1 * mb], T)
        prog_rep = np.repeat(np.arange(p0, p1), mb * T)
        pat = pids[blk_rep[:, None], hi_old]
        slot = slotmap[prog_rep[:, None], pat]
        lcols8[p0 * mb * T:p1 * mb * T] = (
            (slot.astype(np.int32) << 7) | lane).astype(np.int16)

    # row tables at stride 8 (Mosaic sublane alignment; see class docstring)
    order_s8 = np.zeros(nprog * 8, dtype=np.int64)
    order_s8.reshape(nprog, 8)[:, :mb] = progs
    perm8 = np.asarray(kell.perm)[order_s8]
    lagc8 = np.asarray(lagc2)[order_s8]
    # chunked permute+cast of K (f64 source is ~1 GB at 1M rows)
    kv = np.asarray(kinvT)
    kinvT8 = np.empty((order.size, LANES, LANES),
                      dtype=np.dtype(k_dtype) if k_dtype != jnp.bfloat16
                      else np.float32)
    step = 512
    for c0 in range(0, order.size, step):
        kinvT8[c0:c0 + step] = kv[order[c0:c0 + step]]

    return ColoredSweep(
        vals8=jnp.asarray(vals8),
        lcols8=jnp.asarray(lcols8),
        pids8=jnp.asarray(pids8.reshape(-1).astype(np.int32)),
        blkid=jnp.asarray(order_s8.astype(np.int32)),
        perm8=jnp.asarray(perm8.astype(np.int32)),
        lagc8=jnp.asarray(lagc8, sg.vals.dtype),
        kinvT8=jnp.asarray(kinvT8, k_dtype),
        g8max=int(g8max),
        mb=int(mb),
        nprog=int(nprog),
        nb=int(nb),
        windows=int(sg.windows),
        ncolors=int(ncolors),
        nrows=kell.nrows,
        nrows_pad=kell.nrows_pad,
    )


def _sweep8_kernel(pid8_ref, blkid_ref, xlag_ref, vals_ref, lcols_ref,
                   perm_ref, kinvT_ref, lanesel_ref, groupsel_ref, b_ref,
                   lagc_ref, x_in_ref, x_out_ref, scratch, *, t, w, first,
                   fast, g8, mb):
    # pid8_ref/blkid_ref are per-program SMEM BLOCKS ((1, g8) / (1, 8)),
    # not whole-array scalar prefetch: at 1M rows x g8max 240 the flat
    # pids8 is 4.2 MB, far past the 1 MB SMEM budget (the 3D flagship's
    # AOT compile failed on exactly that allocation)
    i = pl.program_id(0)
    xlag = xlag_ref[0]
    if first:
        @pl.when(i == _i32(0))
        def _():
            x_out_ref[...] = x_in_ref[...]

    for k in range(g8):
        scratch[k, :] = x_out_ref[pid8_ref[0, 0, k], :]

    # mb independent blocks: no scratch writeback, no serial chain — the
    # colored order guarantees same-program blocks never read each other
    for j in range(mb):
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
        bs = blkid_ref[0, 0, j]  # row tables are stride-8 (see class doc)
        x_out_ref[pl.ds(bs, 1), :] = scratch[j:j + 1, :] + dx


def _spmv8_kernel(pid8_ref, blkid_ref, vals_ref, lcols_ref, perm_ref,
                  lanesel_ref, groupsel_ref, x_ref, out_ref, scratch, *,
                  t, w, g8, mb):
    i = pl.program_id(0)
    for k in range(g8):
        scratch[k, :] = x_ref[pid8_ref[0, 0, k], :]
    for j in range(mb):
        prod = _gather_rows_banks(
            scratch[...],
            lcols_ref[j * t:(j + 1) * t, :].astype(jnp.int32),
            vals_ref[j * t:(j + 1) * t, :],
            t, g8 // 8,
        )
        y_grp = _vpu_reduce(prod, w, lanesel_ref[...], groupsel_ref[...])
        y = _lane_gather(y_grp, perm_ref[pl.ds(j, 1), :])
        bs = blkid_ref[0, 0, j]
        out_ref[pl.ds(bs, 1), :] = y


def spmv_tpu8(c8: ColoredSweep, x: jnp.ndarray) -> jnp.ndarray:
    """y = A @ x over the colored program-order tables ([nrows_pad] out).

    Shares the sweep's tables so a level whose production sweep is
    v8-colored needs NO separate v6 matvec table — at the 1M-point 3D
    flagship that duplication (4.9 GB windowed table kept only for the
    SpMV) OOM'd the 16 GB HBM.  Programs execute in colored order but a
    pure matvec is order-independent; duplicate padding blocks write the
    same value twice.
    """
    dtype = c8.vals8.dtype
    t, mb, g8 = c8.tiles, c8.mb, c8.g8max
    nb = c8.nrows_pad // LANES
    x2 = x[: c8.nrows_pad].reshape(nb, LANES).astype(dtype)
    lanesel = jnp.asarray(_lanesel())
    groupsel = jnp.asarray(_groupsel())
    z2 = lambda i, *_: (np.int32(0),) * 2
    prog_row = lambda i, *_: (i, np.int32(0))
    prog_row3 = lambda i, *_: (i, np.int32(0), np.int32(0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(c8.nprog,),
        in_specs=[
            pl.BlockSpec((1, 1, g8), prog_row3, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 8), prog_row3, memory_space=pltpu.SMEM),
            pl.BlockSpec((mb * t, LANES), prog_row),
            pl.BlockSpec((mb * t, LANES), prog_row),
            pl.BlockSpec((8, LANES), prog_row),
            pl.BlockSpec((8, LANES), z2, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANES), z2, memory_space=pltpu.VMEM),
            pl.BlockSpec(x2.shape, z2, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(x2.shape, z2, memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((g8, LANES), dtype)],
    )
    out = pl.pallas_call(
        functools.partial(_spmv8_kernel, t=t, w=c8.windows, g8=g8, mb=mb),
        out_shape=jax.ShapeDtypeStruct(x2.shape, dtype),
        grid_spec=grid_spec,
    )(
        c8.pids8.reshape(c8.nprog, 1, g8), c8.blkid.reshape(c8.nprog, 1, 8),
        c8.vals8, c8.lcols8, c8.perm8, lanesel, groupsel, x2,
    )
    return out.reshape(-1)


def permute_b8(c8: ColoredSweep, b2: jnp.ndarray) -> jnp.ndarray:
    """Gather the RHS rows into colored program order (cheap: one take of
    [nb,128] per smooth call; all static tables are pre-permuted)."""
    return jnp.take(b2, c8.blkid, axis=0)


def sor_sweep_tpu8(
    c8: ColoredSweep,
    x2: jnp.ndarray,   # [nb, 128] storage order (updated in place)
    x_lag: jnp.ndarray,
    b8: jnp.ndarray,   # [nprog * 8, 128] = permute_b8(c8, b2): stride-8
                       # row-table layout regardless of mb (see class doc)
) -> jnp.ndarray:
    """One exact (block, class)-GS sweep under the colored block order."""
    assert b8.shape[0] == c8.nprog * 8, (
        f"b8 must be the stride-8 permute_b8 layout [nprog*8, 128]; got "
        f"{b8.shape} for nprog={c8.nprog}")
    dtype = c8.vals8.dtype
    t, mb, g8 = c8.tiles, c8.mb, c8.g8max
    lanesel = jnp.asarray(_lanesel())
    groupsel = jnp.asarray(_groupsel())
    z2 = lambda i, *_: (np.int32(0),) * 2
    rowspec_full = pl.BlockSpec(x2.shape, z2, memory_space=pltpu.VMEM)
    xl = jnp.asarray([x_lag], dtype)
    prog_row = lambda i, *_: (i, np.int32(0))
    prog_row3 = lambda i, *_: (i, np.int32(0), np.int32(0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(c8.nprog,),
        in_specs=[
            # per-program SMEM blocks of the slot->row and block-id maps
            # (whole-array scalar prefetch overflows SMEM at 1M rows; the
            # leading program axis satisfies Mosaic's last-two-dims rule)
            pl.BlockSpec((1, 1, g8), prog_row3, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 8), prog_row3, memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda i, *_: (np.int32(0),),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((mb * t, LANES), prog_row),
            pl.BlockSpec((mb * t, LANES), prog_row),
            pl.BlockSpec((8, LANES), prog_row),  # stride-8 row tables
            pl.BlockSpec((mb, LANES, LANES),
                         lambda i, *_: (i, np.int32(0), np.int32(0))),
            pl.BlockSpec((8, LANES), z2, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANES), z2, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANES), prog_row),
            pl.BlockSpec((8, LANES), prog_row),
            rowspec_full,
        ],
        out_specs=pl.BlockSpec(x2.shape, z2, memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((g8, LANES), dtype)],
    )
    return pl.pallas_call(
        functools.partial(
            _sweep8_kernel, t=t, w=c8.windows, first=True,
            fast=c8.kinvT8.dtype == jnp.bfloat16, g8=g8, mb=mb,
        ),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
        grid_spec=grid_spec,
        input_output_aliases={11: 0},
    )(
        c8.pids8.reshape(c8.nprog, 1, g8), c8.blkid.reshape(c8.nprog, 1, 8),
        xl, c8.vals8, c8.lcols8, c8.perm8,
        c8.kinvT8, lanesel, groupsel, b8, c8.lagc8, x2,
    )
