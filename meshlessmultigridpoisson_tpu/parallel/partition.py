"""Host-side domain partitioner: contiguous RCM row blocks per device,
frontier/interior split for EXACT cross-shard Gauss-Seidel.

Produces stacked [P, ...] arrays (leading axis = device) so the sharded
solve path (parallel/sharded.py) can shard_map over them.  The fine level
is row-partitioned; coarse levels stay replicated.

Exact distributed GS (round-2 redesign; replaces the round-1 seam-damped
smoother): under the SYMMETRIC coupling pattern a+aT, any row that is read
across a shard boundary has a cross-shard neighbor itself — i.e. every
cross-shard read touches a FRONTIER row.  Order the global sweep

    [frontier rows of shards s ≡ 0 (mod C)] -> ... -> [≡ C-1 (mod C)]
    -> [all interior rows]

with C = (max shard distance of any coupling) + 1 (2 in production: halos
reach only adjacent shards; tiny test meshes may span more).  Then

  * same-phase shards never couple (distance >= C), so each frontier phase
    is embarrassingly parallel;
  * earlier-phase values arrive fresh via an nf-row frontier-slice
    ppermute before each phase; later-phase/interior values are correctly
    OLD (pre-sweep) — Gauss-Seidel semantics hold exactly;
  * the interior phase reads only own-shard rows — zero communication, and
    it is ~(ns-nf)/ns of the work.

Each shard stores rows as [frontier (nf, 256-aligned, interiors borrowed
to make nf uniform) | interior (ns-nf)], both groups independently
(block, class)-colored so the in-shard tile scan stays exact GS.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from meshlessmultigridpoisson_tpu.geometry.coloring import block_class_permutation
from meshlessmultigridpoisson_tpu.mg.vcycle import Hierarchy
from meshlessmultigridpoisson_tpu.ops.ell import EllMatrix, ell_to_csr, global_cols
from meshlessmultigridpoisson_tpu.stencil.operators import LevelOperator


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@partial(
    jax.tree_util.register_dataclass,
    data_fields=(
        "vals", "lcols_ext", "diag",
        "smooth_mask", "dirichlet_mask", "neumann_mask",
        "dirichlet_values", "neumann_values", "omega_w", "lag_col", "lag_row",
        "bound_rows", "bound_vals", "bound_lcols_ext", "bound_diag",
        "cond_rows", "cond_vals", "cond_lcols_ext",
        "k6_vals", "k6_lcols", "k6_pids", "k6_perm", "k6_kinvT",
    ),
    meta_fields=(
        "n", "n_pad2", "num_shards", "shard_rows", "frontier_rows", "phases",
        "block_rows", "class_size", "width", "has_lagrange", "omega", "iters",
        "k6_windows", "k6_nblocks",
    ),
)
@dataclasses.dataclass(frozen=True)
class ShardedFineLevel:
    """Fine-level operator split into P contiguous row shards.

    Per-shard row layout: [frontier (nf) | interior (ns-nf)].
    ``lcols_ext`` indexes the EXTENDED local vector
      x_ext = [own rows (ns) |
               left-1 frontier (nf) | right-1 frontier (nf) | ... hops]
    (hops = phases-1).  Compact row sets (Neumann boundary, condensation)
    hold LOCAL row ids with an out-of-range sentinel for padding.
    """

    vals: jnp.ndarray  # [P, Ns, w]
    lcols_ext: jnp.ndarray  # [P, Ns, w] int32 into x_ext
    diag: jnp.ndarray  # [P, Ns]
    smooth_mask: jnp.ndarray
    dirichlet_mask: jnp.ndarray
    neumann_mask: jnp.ndarray
    dirichlet_values: jnp.ndarray
    neumann_values: jnp.ndarray
    omega_w: jnp.ndarray  # [P, Ns] per-row omega (no seam damping)
    lag_col: jnp.ndarray
    lag_row: jnp.ndarray
    bound_rows: jnp.ndarray  # [P, mb] int32 local row ids (sentinel = big)
    bound_vals: jnp.ndarray  # [P, mb, wb]
    bound_lcols_ext: jnp.ndarray  # [P, mb, wb]
    bound_diag: jnp.ndarray  # [P, mb]
    cond_rows: jnp.ndarray  # [P, mc]
    cond_vals: jnp.ndarray  # [P, mc, wc]
    cond_lcols_ext: jnp.ndarray  # [P, mc, wc]
    # per-shard v6 Pallas kernel tables (None when not built) — single
    # uniform segment, padded to the max window count across shards so the
    # SPMD program is identical on every device
    k6_vals: jnp.ndarray | None  # [P, nbk*8*W, 128] f32
    k6_lcols: jnp.ndarray | None  # [P, nbk*8*W, 128] i16
    k6_pids: jnp.ndarray | None  # [P, nb*GMAX] i32
    k6_perm: jnp.ndarray | None  # [P, nb, 128] i32
    k6_kinvT: jnp.ndarray | None  # [P, nbk, 128, 128] f32 (interior-masked)
    n: int
    n_pad2: int
    num_shards: int
    shard_rows: int
    frontier_rows: int  # nf, uniform across shards, multiple of block_rows
    phases: int  # C frontier phases (hops = C-1)
    block_rows: int
    class_size: int
    width: int
    has_lagrange: bool
    omega: float
    iters: int
    k6_windows: int  # W (0 when kernel tables absent)
    k6_nblocks: int  # nbk = round_up(Ns/128, MB)

    @property
    def halo(self) -> int:  # ext rows beyond own (both sides)
        return 2 * (self.phases - 1) * self.frontier_rows

    @property
    def ext_rows(self) -> int:
        return self.shard_rows + self.halo

    @property
    def has_kernels(self) -> bool:
        return self.k6_vals is not None


def _compact_to_shards(rows, vals, gcols, diag, p, ns, newpos, ext_of):
    """Split compact row sets by owner shard; rows/cols in the new layout."""
    rows_new = newpos[rows]
    owner = rows_new // ns
    mmax = max(int(np.bincount(owner, minlength=p).max()) if rows.size else 0, 1)
    w = vals.shape[1]
    out_rows = np.full((p, mmax), ns + 10**6, dtype=np.int64)
    out_vals = np.zeros((p, mmax, w))
    out_cols = np.zeros((p, mmax, w), dtype=np.int64)
    out_diag = np.ones((p, mmax))
    for s in range(p):
        sel = np.nonzero(owner == s)[0]
        m = sel.size
        out_rows[s, :m] = rows_new[sel] - s * ns
        out_vals[s, :m] = vals[sel]
        ext = ext_of(s, newpos[gcols[sel]])
        out_cols[s, :m] = np.where(out_vals[s, :m] != 0.0, ext, 0)
        if diag is not None:
            out_diag[s, :m] = diag[sel]
    return out_rows, out_vals, out_cols, out_diag


def _build_shard_kernels(vals, lcols_ext, omega_w, smooth_mask, p, ns, nf,
                         ext_rows):
    """Per-shard v6 kernel tables + interior-masked one-shot K, padded to
    uniform shapes across shards (see ShardedFineLevel docstring).

    The one-shot K treats frontier rows as constants (mask zero): during
    the communication-free interior pass the kernel sweeps every own block
    but only interior rows move — identical semantics to the tile scan it
    replaces (sharded._scan_tiles over [nft, ntiles)).
    Returns None if any shard's layout is unsupported (caller falls back
    to the XLA scan path).
    """
    from meshlessmultigridpoisson_tpu.ops import kernels6 as K6
    from meshlessmultigridpoisson_tpu.ops.ell import ell_from_csr
    from meshlessmultigridpoisson_tpu.ops.kernels4 import (
        Ell4Unsupported,
        build_oneshot_K,
    )

    if ns % 128 != 0:
        return None
    ext_pad = _round_up(max(ext_rows, 1), 128)
    kells, Ks = [], []
    interior = (np.arange(ns) >= nf).astype(np.float64)
    try:
        for s in range(p):
            v = np.asarray(vals[s], np.float64)
            c = np.asarray(lcols_ext[s], np.int64)
            real = v != 0.0
            rr = np.repeat(np.arange(ns), v.shape[1])[real.ravel()]
            cc = c.ravel()[real.ravel()]
            csr = sp.coo_matrix(
                (v[real], (rr, cc)), shape=(ns, ext_pad)
            ).tocsr()
            csr.sum_duplicates()
            ell = ell_from_csr(csr, block_rows=128)
            kells.append(K6.prepare_kernel_ell6(ell, max_segments=1))
            Ks.append(build_oneshot_K(
                ell, np.asarray(omega_w[s]),
                np.asarray(smooth_mask[s]) * interior,
            ))
    except Ell4Unsupported:
        return None
    W = max(k.segments[0].windows for k in kells)
    kells = [K6.pad_segment_windows(k, W) for k in kells]
    nbk = kells[0].segments[0].nblocks
    kinv = [np.asarray(K6.pack_oneshot_K6(k, kk)[0])
            for k, kk in zip(kells, Ks)]
    return dict(
        k6_vals=jnp.asarray(np.stack(
            [np.asarray(k.segments[0].vals) for k in kells])),
        k6_lcols=jnp.asarray(np.stack(
            [np.asarray(k.segments[0].lcols) for k in kells])),
        k6_pids=jnp.asarray(np.stack([np.asarray(k.pids) for k in kells])),
        k6_perm=jnp.asarray(np.stack([np.asarray(k.perm) for k in kells])),
        k6_kinvT=jnp.asarray(np.stack(kinv), jnp.float32),
        k6_windows=W,
        k6_nblocks=nbk,
    )


def partition_fine_level(
    op: LevelOperator, num_shards: int, kernels: bool = False,
) -> tuple[ShardedFineLevel, np.ndarray]:
    """Split ``op`` into P shards with the frontier/interior layout.

    Returns (sharded level, newpos) where newpos[old_padded2_row] = new
    global position (shard-local frontier/interior reorder composed onto
    the contiguous split).  ``kernels=True`` additionally builds per-shard
    v6 Pallas tables for the interior sweep / matvec (TPU execution path).
    """
    p = num_shards
    b = op.A.block_rows
    n_pad = op.n_pad
    n_pad2 = _round_up(n_pad, p * b)
    ns = n_pad2 // p
    w = op.A.width

    vals0 = np.zeros((n_pad2, w))
    vals0[:n_pad] = np.asarray(op.A.vals)
    gcols0 = np.zeros((n_pad2, w), dtype=np.int64)
    gcols0[:n_pad] = np.asarray(global_cols(op.A))
    gcols0[n_pad:] = np.arange(n_pad, n_pad2)[:, None]  # pad rows self-point

    # --- symmetric coupling pattern on padded2 ids ---------------------------
    real = vals0 != 0.0
    rr = np.repeat(np.arange(n_pad2), w)[real.ravel()]
    cc = gcols0.ravel()[real.ravel()]
    pat = sp.coo_matrix(
        (np.ones(rr.size), (rr, cc)), shape=(n_pad2, n_pad2)
    ).tocsr()
    pat = (pat + pat.T).tocsr()

    row_shard = np.arange(n_pad2) // ns
    col_shard = pat.indices // ns
    reach = np.abs(col_shard - np.repeat(row_shard, np.diff(pat.indptr)))
    # frontier rows + phase count
    seg = np.zeros(n_pad2, dtype=np.int64)
    np.maximum.at(seg, np.repeat(np.arange(n_pad2), np.diff(pat.indptr)), reach)
    frontier = seg > 0
    C = int(seg.max()) + 1 if p > 1 else 1
    nf = int(frontier.reshape(p, ns).sum(axis=1).max()) if p > 1 else 0
    nf = min(_round_up(nf, b), ns) if nf else 0

    # --- per-shard reorder: [frontier (borrow interiors up to nf), interior] --
    newpos = np.empty(n_pad2, dtype=np.int64)
    for s in range(p):
        lo = s * ns
        loc = np.arange(lo, lo + ns)
        fr = frontier[loc]
        fidx = loc[fr]
        iidx = loc[~fr]
        borrow = nf - fidx.size
        if borrow > 0:  # pad the frontier group with (harmless) interiors
            fidx = np.concatenate([fidx, iidx[:borrow]])
            iidx = iidx[borrow:]
        order = np.concatenate([fidx, iidx])  # old ids in new local order

        # recolor each group independently (in-shard tile independence)
        def color(group):
            if group.size == 0:
                return group
            sub = pat[group][:, group].tocsr()
            perm, _ = block_class_permutation(sub, b, op.class_size)
            return group[perm]

        order = np.concatenate([color(order[:nf]), color(order[nf:])])
        newpos[order] = np.arange(lo, lo + ns)

    # ext position of a NEW global position, seen from shard s
    hops = C - 1

    def ext_of(s, q):
        qs = q // ns
        qloc = q - qs * ns
        d = qs - s
        base = np.where(
            d == 0, 0,
            ns + (np.abs(d) - 1) * 2 * nf + np.where(d < 0, 0, nf),
        )
        out = np.where(d == 0, qloc, base + qloc)
        # cross-shard cols are always frontier rows (qloc < nf); clamp
        # padding junk into range
        return np.clip(out, 0, ns + 2 * hops * nf - 1)

    # --- permute row-wise arrays ----------------------------------------------
    iperm = np.argsort(newpos)  # new -> old

    def pad_rows(v, fill=0.0):
        out = np.full(n_pad2, fill, dtype=np.float64)
        out[: np.asarray(v).shape[0]] = np.asarray(v)
        return out[iperm]

    vals = vals0[iperm]
    gcols_new = newpos[gcols0[iperm]]
    rs = np.arange(n_pad2) // ns
    lcols_ext = np.empty((n_pad2, w), dtype=np.int64)
    for s in range(p):
        sl = slice(s * ns, (s + 1) * ns)
        lcols_ext[sl] = ext_of(s, gcols_new[sl])
    if p > 1:
        cross = np.abs(gcols_new // ns - rs[:, None]) > 0
        assert ((gcols_new % ns < nf) | ~cross | (vals == 0.0)).all(), \
            "cross-shard read of a non-frontier row"

    def shard(vv):
        return jnp.asarray(np.asarray(vv).reshape(p, ns, *vv.shape[1:]))

    omega_w = pad_rows(op.omega * np.asarray(op.omega_scale), 1.0)

    bc = op.bound
    brows_g = np.asarray(bc.rows)[: bc.nrows]
    bvals = np.asarray(bc.ell.vals)[: bc.nrows]
    bgcols = np.asarray(global_cols(bc.ell))[: bc.nrows]
    bdiag = np.asarray(bc.ell.diag)[: bc.nrows]
    br, bv, bcx, bd = _compact_to_shards(
        brows_g, bvals, bgcols, bdiag, p, ns, newpos, ext_of)

    cc_ = op.cond
    crows_g = np.asarray(cc_.rows)[: cc_.nrows]
    cvals = np.asarray(cc_.ell.vals)[: cc_.nrows]
    cgcols = np.asarray(global_cols(cc_.ell))[: cc_.nrows]
    cr, cv, ccx, _ = _compact_to_shards(
        crows_g, cvals, cgcols, None, p, ns, newpos, ext_of)

    level = ShardedFineLevel(
        vals=shard(vals),
        lcols_ext=shard(lcols_ext.astype(np.int32)),
        diag=shard(pad_rows(op.A.diag, 1.0)),
        smooth_mask=shard(pad_rows(op.smooth_mask)),
        dirichlet_mask=shard(pad_rows(op.dirichlet_mask)),
        neumann_mask=shard(pad_rows(op.neumann_mask)),
        dirichlet_values=shard(pad_rows(op.dirichlet_values)),
        neumann_values=shard(pad_rows(op.neumann_values)),
        omega_w=shard(omega_w),
        lag_col=shard(pad_rows(op.lag_col)),
        lag_row=shard(pad_rows(op.lag_row)),
        bound_rows=jnp.asarray(br.astype(np.int32)),
        bound_vals=jnp.asarray(bv),
        bound_lcols_ext=jnp.asarray(bcx.astype(np.int32)),
        bound_diag=jnp.asarray(bd),
        cond_rows=jnp.asarray(cr.astype(np.int32)),
        cond_vals=jnp.asarray(cv),
        cond_lcols_ext=jnp.asarray(ccx.astype(np.int32)),
        n=op.n,
        n_pad2=n_pad2,
        num_shards=p,
        shard_rows=ns,
        frontier_rows=nf,
        phases=C,
        block_rows=b,
        class_size=op.class_size,
        width=w,
        has_lagrange=op.has_lagrange,
        omega=op.omega,
        iters=op.iters,
    )
    return level, newpos


@dataclasses.dataclass
class ShardedHierarchy:
    """Sharded fine level + replicated coarse machinery."""

    fine: ShardedFineLevel
    coarse: Hierarchy  # levels[:-1] hierarchy (replicated), may be empty
    # fine<->coarsest-below transfers, split by fine shard:
    restrict_vals: jnp.ndarray  # [P, nc_pad, wR] R restricted to shard cols
    restrict_lcols: jnp.ndarray  # [P, nc_pad, wR] LOCAL fine rows [0, Ns)
    prolong_vals: jnp.ndarray  # [P, Ns, wP]
    prolong_cols: jnp.ndarray  # [P, Ns, wP] coarse (replicated) cols
    fine_op_cpu: LevelOperator  # for problem construction / extraction
    newpos: np.ndarray  # old padded2 position -> new global position


def partition_hierarchy(
    hier: Hierarchy, num_shards: int, seam_damp: float | None = None,
) -> ShardedHierarchy:
    """Partition the finest level; replicate the rest.  ``seam_damp`` is
    accepted for backward compatibility and ignored (the exact-GS phase
    sweep needs no damping)."""
    fine_cpu = hier.levels[-1]
    fine, newpos = partition_fine_level(fine_cpu, num_shards)
    p, ns = fine.num_shards, fine.shard_rows
    iperm = np.argsort(newpos)

    if hier.num_levels > 1:
        coarse = Hierarchy(
            levels=hier.levels[:-1],
            restrict=hier.restrict[:-1],
            prolong=hier.prolong[:-1],
        )
        rtop = ell_to_csr(hier.restrict[-1]).tocsc()  # [nc_pad x nf_pad]
        ptop = ell_to_csr(hier.prolong[-1])  # [nf_pad x nc_pad]
        nc_pad = hier.levels[-2].n_pad
        n_pad = fine_cpu.n_pad

        # permute fine axis into the new layout (pad with empty rows/cols)
        def pad_csr_cols(m):  # [*, n_pad] -> [*, n_pad2] new order
            m2 = sp.csr_matrix(
                (m.data, m.indices, m.indptr), shape=m.shape).tocoo()
            cols = newpos[m2.col]
            return sp.coo_matrix(
                (m2.data, (m2.row, cols)), shape=(m.shape[0], fine.n_pad2)
            ).tocsr()

        def pad_csr_rows(m):  # [n_pad, *] -> [n_pad2, *] new order
            m2 = m.tocoo()
            rows = newpos[m2.row]
            return sp.coo_matrix(
                (m2.data, (rows, m2.col)), shape=(fine.n_pad2, m.shape[1])
            ).tocsr()

        rtop2 = pad_csr_cols(rtop.tocsr())
        ptop2 = pad_csr_rows(ptop)

        rv, rc = [], []
        wmax = 1
        shards_csr = []
        for s in range(p):
            lo, hi = s * ns, (s + 1) * ns
            cols_mask = np.zeros(fine.n_pad2, bool)
            cols_mask[lo:hi] = True
            rs_ = rtop2.multiply(cols_mask[None, :]).tocsr()
            rs_.eliminate_zeros()
            shards_csr.append(rs_)
            wmax = max(wmax, int(np.diff(rs_.indptr).max(initial=0)), 1)
        for s, rs_ in enumerate(shards_csr):
            v = np.zeros((nc_pad, wmax))
            c = np.zeros((nc_pad, wmax), dtype=np.int64)
            nnzr = np.diff(rs_.indptr)
            rows = np.repeat(np.arange(rs_.shape[0]), nnzr)
            pos = np.arange(rs_.nnz) - np.repeat(rs_.indptr[:-1], nnzr)
            v[rows, pos] = rs_.data
            c[rows, pos] = rs_.indices - s * ns
            rv.append(v)
            rc.append(c)

        pv, pc = [], []
        wpmax = 1
        prows = []
        for s in range(p):
            lo, hi = s * ns, (s + 1) * ns
            psub = ptop2[lo:hi].tocsr()
            prows.append(psub)
            wpmax = max(wpmax, int(np.diff(psub.indptr).max(initial=0)), 1)
        for s, psub in enumerate(prows):
            v = np.zeros((ns, wpmax))
            c = np.zeros((ns, wpmax), dtype=np.int64)
            nnzr = np.diff(psub.indptr)
            rows = np.repeat(np.arange(psub.shape[0]), nnzr)
            pos = np.arange(psub.nnz) - np.repeat(psub.indptr[:-1], nnzr)
            v[rows, pos] = psub.data
            c[rows, pos] = psub.indices
            pv.append(v)
            pc.append(c)

        restrict_vals = jnp.asarray(np.stack(rv))
        restrict_lcols = jnp.asarray(np.stack(rc).astype(np.int32))
        prolong_vals = jnp.asarray(np.stack(pv))
        prolong_cols = jnp.asarray(np.stack(pc).astype(np.int32))
    else:
        coarse = Hierarchy(levels=(), restrict=(), prolong=())
        restrict_vals = jnp.zeros((p, 1, 1))
        restrict_lcols = jnp.zeros((p, 1, 1), dtype=jnp.int32)
        prolong_vals = jnp.zeros((p, ns, 1))
        prolong_cols = jnp.zeros((p, ns, 1), dtype=jnp.int32)

    return ShardedHierarchy(
        fine=fine,
        coarse=coarse,
        restrict_vals=restrict_vals,
        restrict_lcols=restrict_lcols,
        prolong_vals=prolong_vals,
        prolong_cols=prolong_cols,
        fine_op_cpu=fine_cpu,
        newpos=newpos,
    )
