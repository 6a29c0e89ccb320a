"""Host-side domain partitioner: contiguous RCM row blocks per device,
frontier/interior split for EXACT cross-shard Gauss-Seidel.

Produces stacked [P, ...] arrays (leading axis = device) so the sharded
solve path (parallel/sharded.py) can shard_map over them.  The top
``shard_levels`` levels are row-partitioned (each with its own
frontier/interior layout); the remaining coarse tail stays replicated.

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
        "k8_vals", "k8_lcols", "k8_pids", "k8_blkid", "k8_perm", "k8_lagc",
        "k8_kinvT",
    ),
    meta_fields=(
        "n", "n_pad2", "num_shards", "shard_rows", "frontier_rows", "phases",
        "block_rows", "class_size", "width", "has_lagrange", "omega", "iters",
        "k6_windows", "k6_nblocks", "k6_gmax",
        "k8_mb", "k8_g8max", "k8_nprog",
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
    k6_gmax: int = 16  # per-block patch capacity (uniform across shards)
    # per-shard v8 colored-sweep tables (None when coloring was rejected
    # on any shard; the interior sweep then stays on v6).  Uniform
    # (mb, g8max, nprog) across shards; tail programs are zero-K no-ops.
    k8_vals: jnp.ndarray | None = None   # [P, nprog*mb*T, 128] f32
    k8_lcols: jnp.ndarray | None = None  # [P, nprog*mb*T, 128] i16
    k8_pids: jnp.ndarray | None = None   # [P, nprog*g8max] i32
    k8_blkid: jnp.ndarray | None = None  # [P, nprog*8] i32
    k8_perm: jnp.ndarray | None = None   # [P, nprog*8, 128] i32
    k8_lagc: jnp.ndarray | None = None   # [P, nprog*8, 128] f32
    k8_kinvT: jnp.ndarray | None = None  # [P, nprog*mb, 128, 128] f32
    k8_mb: int = 0
    k8_g8max: int = 0
    k8_nprog: int = 0

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
                         ext_rows, lagc=None):
    """Per-shard v6 kernel tables + interior-masked one-shot K, padded to
    uniform shapes across shards (see ShardedFineLevel docstring).

    The one-shot K treats frontier rows as constants (mask zero): during
    the communication-free interior pass the kernel sweeps every own block
    but only interior rows move — identical semantics to the tile scan it
    replaces (sharded._scan_tiles over [nft, ntiles)).
    Returns None if any shard's layout is unsupported (caller falls back
    to the XLA scan path).

    When every shard's layout also admits the v8 block-colored sweep
    (ops/kernels8.py) the dict additionally carries uniform k8_* tables
    (common mb, padded g8max/nprog; tail programs are zero-K no-ops) so
    the interior sweep runs colored on-device — VERDICT r4 next #5.
    """
    from meshlessmultigridpoisson_tpu.ops import kernels6 as K6
    from meshlessmultigridpoisson_tpu.ops import kernels8 as K8
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
    G = max(k.gmax for k in kells)
    kells = [K6.pad_gmax(k, G) for k in kells]
    nbk = kells[0].segments[0].nblocks
    kinv = [np.asarray(K6.pack_oneshot_K6(k, kk)[0])
            for k, kk in zip(kells, Ks)]
    out = dict(
        k6_vals=jnp.asarray(np.stack(
            [np.asarray(k.segments[0].vals) for k in kells])),
        k6_lcols=jnp.asarray(np.stack(
            [np.asarray(k.segments[0].lcols) for k in kells])),
        k6_pids=jnp.asarray(np.stack([np.asarray(k.pids) for k in kells])),
        k6_perm=jnp.asarray(np.stack([np.asarray(k.perm) for k in kells])),
        k6_kinvT=jnp.asarray(np.stack(kinv), jnp.float32),
        k6_windows=W,
        k6_nblocks=nbk,
        k6_gmax=int(G),
    )
    out.update(_build_shard_colored(kells, Ks, lagc, p, ns) or {})
    return out


def _build_shard_colored(kells, Ks, lagc, p, ns):
    """Uniform per-shard v8 colored tables, or None if any shard rejects.

    Uniformity contract (shard_map needs one program): common ``mb`` (the
    smallest any shard selects — unions shrink with mb, so it fits all),
    ``g8max``/``nprog`` padded to the max.  Padding programs are no-ops:
    all slots point at block 0, K is zero, so they rewrite x[0] with its
    own snapshot value.
    """
    from meshlessmultigridpoisson_tpu.ops import kernels8 as K8
    from meshlessmultigridpoisson_tpu.ops.kernels4 import Ell4Unsupported

    if lagc is None:
        return None
    nb = ns // 128
    try:
        c8s = [K8.prepare_colored_sweep(
            k, kk, np.asarray(lagc[s], np.float32).reshape(nb, 128))
            for s, (k, kk) in enumerate(zip(kells, Ks))]
        mb = min(c.mb for c in c8s)
        if any(c.mb != mb for c in c8s):
            c8s = [K8.prepare_colored_sweep(
                k, kk, np.asarray(lagc[s], np.float32).reshape(nb, 128),
                mb=mb)
                for s, (k, kk) in enumerate(zip(kells, Ks))]
    except Ell4Unsupported:
        return None
    g8 = max(c.g8max for c in c8s)
    npr = max(c.nprog for c in c8s)
    T = c8s[0].tiles

    def pad_c8(c):
        pids = np.asarray(c.pids8).reshape(c.nprog, c.g8max)
        pids_u = np.zeros((npr, g8), np.int32)
        pids_u[: c.nprog, : c.g8max] = pids
        # padding slots/programs read block 0 (always resident)
        blk = np.zeros((npr, 8), np.int32)
        blk[: c.nprog] = np.asarray(c.blkid).reshape(c.nprog, 8)
        vals = np.zeros((npr * mb * T, 128), np.float32)
        vals[: c.nprog * mb * T] = np.asarray(c.vals8)
        lcols = np.zeros((npr * mb * T, 128), np.int16)
        lcols[: c.nprog * mb * T] = np.asarray(c.lcols8)
        perm = np.zeros((npr * 8, 128), np.int32)
        perm[: c.nprog * 8] = np.asarray(c.perm8)
        perm[c.nprog * 8:] = np.arange(128, dtype=np.int32)[None, :]
        lag = np.zeros((npr * 8, 128), np.float32)
        lag[: c.nprog * 8] = np.asarray(c.lagc8)
        kin = np.zeros((npr * mb, 128, 128), np.float32)
        kin[: c.nprog * mb] = np.asarray(c.kinvT8)
        return pids_u, blk, vals, lcols, perm, lag, kin

    parts = [pad_c8(c) for c in c8s]
    stack = lambda i: jnp.asarray(np.stack([pp[i] for pp in parts]))
    return dict(
        k8_pids=stack(0).reshape(p, -1), k8_blkid=stack(1).reshape(p, -1),
        k8_vals=stack(2), k8_lcols=stack(3), k8_perm=stack(4),
        k8_lagc=stack(5), k8_kinvT=stack(6),
        k8_mb=int(mb), k8_g8max=int(g8), k8_nprog=int(npr),
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

    k6 = None
    if kernels and op.class_size == 8:
        vals_s = vals.reshape(p, ns, w)
        lcols_s = lcols_ext.reshape(p, ns, w)
        ow_s = omega_w.reshape(p, ns)
        sm_s = pad_rows(op.smooth_mask).reshape(p, ns)
        lagc_s = pad_rows(op.lag_col).reshape(p, ns)
        k6 = _build_shard_kernels(
            vals_s, lcols_s, ow_s, sm_s, p, ns, nf, ns + 2 * hops * nf,
            lagc=lagc_s,
        )

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
        k6_vals=k6["k6_vals"] if k6 else None,
        k6_lcols=k6["k6_lcols"] if k6 else None,
        k6_pids=k6["k6_pids"] if k6 else None,
        k6_perm=k6["k6_perm"] if k6 else None,
        k6_kinvT=k6["k6_kinvT"] if k6 else None,
        k6_windows=k6["k6_windows"] if k6 else 0,
        k6_nblocks=k6["k6_nblocks"] if k6 else 0,
        k6_gmax=k6["k6_gmax"] if k6 else 16,
        k8_vals=(k6 or {}).get("k8_vals"),
        k8_lcols=(k6 or {}).get("k8_lcols"),
        k8_pids=(k6 or {}).get("k8_pids"),
        k8_blkid=(k6 or {}).get("k8_blkid"),
        k8_perm=(k6 or {}).get("k8_perm"),
        k8_lagc=(k6 or {}).get("k8_lagc"),
        k8_kinvT=(k6 or {}).get("k8_kinvT"),
        k8_mb=(k6 or {}).get("k8_mb", 0),
        k8_g8max=(k6 or {}).get("k8_g8max", 0),
        k8_nprog=(k6 or {}).get("k8_nprog", 0),
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
    """Row-sharded top levels + replicated coarse tail.

    ``sharded`` is fine-first: sharded[0] is the finest level.  Transfers
    sharded[j] -> sharded[j+1] live in inter_restrict_*/inter_prolong_*
    (index j); the LAST sharded level's transfer to the replicated tail is
    restrict_*/prolong_* (coarse side in the ORIGINAL padded layout).
    All restriction tables are split by the fine side's shard (partial
    products psum-reduce to the replicated coarse source); prolongation
    tables hold each fine shard's rows with columns into the full coarse
    vector (all-gathered when the coarse level is sharded).
    """

    sharded: tuple  # tuple[ShardedFineLevel, ...], fine-first
    coarse: Hierarchy  # replicated tail (may be empty)
    # last-sharded <-> replicated-tail transfers, split by fine shard:
    restrict_vals: jnp.ndarray  # [P, nc_pad, wR] R restricted to shard cols
    restrict_lcols: jnp.ndarray  # [P, nc_pad, wR] LOCAL fine rows [0, Ns)
    prolong_vals: jnp.ndarray  # [P, Ns, wP]
    prolong_cols: jnp.ndarray  # [P, Ns, wP] coarse (replicated) cols
    # sharded[j] <-> sharded[j+1] transfers (coarse side in ITS new layout):
    inter_restrict_vals: tuple = ()
    inter_restrict_lcols: tuple = ()
    inter_prolong_vals: tuple = ()
    inter_prolong_cols: tuple = ()
    fine_op_cpu: LevelOperator = None  # for problem construction / extraction
    newpos: np.ndarray = None  # finest old padded2 position -> new position

    @property
    def fine(self) -> ShardedFineLevel:
        return self.sharded[0]


def _split_transfers(r_csr, p_csr, newpos_f, n_pad2_f, ns_f, p,
                     newpos_c, nc_out):
    """Split a restriction/prolongation pair by the FINE side's shards.

    ``r_csr`` [nc_pad x nf_pad], ``p_csr`` [nf_pad x nc_pad] in ORIGINAL
    layouts.  The fine axis is permuted by ``newpos_f`` (old -> new global
    position, padded to n_pad2_f); the coarse axis is permuted by
    ``newpos_c`` (or kept when None) and padded to ``nc_out``.

    Returns (rv [P,nc_out,wR], rc LOCAL fine rows, pv [P,ns,wP],
    pc full-coarse cols).
    """
    def c_of(idx):
        return newpos_c[idx] if newpos_c is not None else idx

    m = r_csr.tocoo()
    rt = sp.coo_matrix(
        (m.data, (c_of(m.row), newpos_f[m.col])), shape=(nc_out, n_pad2_f)
    ).tocsr()
    m = p_csr.tocoo()
    pt = sp.coo_matrix(
        (m.data, (newpos_f[m.row], c_of(m.col))), shape=(n_pad2_f, nc_out)
    ).tocsr()

    r_sh, wr = [], 1
    for s in range(p):
        mask = np.zeros(n_pad2_f, bool)
        mask[s * ns_f:(s + 1) * ns_f] = True
        rs_ = rt.multiply(mask[None, :]).tocsr()
        rs_.eliminate_zeros()
        r_sh.append(rs_)
        wr = max(wr, int(np.diff(rs_.indptr).max(initial=0)))
    rv, rc = [], []
    for s, rs_ in enumerate(r_sh):
        v = np.zeros((nc_out, wr))
        c = np.zeros((nc_out, wr), dtype=np.int64)
        nnzr = np.diff(rs_.indptr)
        rows = np.repeat(np.arange(rs_.shape[0]), nnzr)
        pos = np.arange(rs_.nnz) - np.repeat(rs_.indptr[:-1], nnzr)
        v[rows, pos] = rs_.data
        c[rows, pos] = rs_.indices - s * ns_f
        rv.append(v)
        rc.append(c)

    p_sh = [pt[s * ns_f:(s + 1) * ns_f].tocsr() for s in range(p)]
    wp = max(max(int(np.diff(ps.indptr).max(initial=0)) for ps in p_sh), 1)
    pv, pc = [], []
    for ps in p_sh:
        v = np.zeros((ns_f, wp))
        c = np.zeros((ns_f, wp), dtype=np.int64)
        nnzr = np.diff(ps.indptr)
        rows = np.repeat(np.arange(ps.shape[0]), nnzr)
        pos = np.arange(ps.nnz) - np.repeat(ps.indptr[:-1], nnzr)
        v[rows, pos] = ps.data
        c[rows, pos] = ps.indices
        pv.append(v)
        pc.append(c)

    return (
        jnp.asarray(np.stack(rv)),
        jnp.asarray(np.stack(rc).astype(np.int32)),
        jnp.asarray(np.stack(pv)),
        jnp.asarray(np.stack(pc).astype(np.int32)),
    )


def partition_hierarchy(
    hier: Hierarchy, num_shards: int, seam_damp: float | None = None,
    kernels: bool = False, shard_levels: int = 1,
) -> ShardedHierarchy:
    """Row-shard the top ``shard_levels`` levels; replicate the rest.

    ``seam_damp`` is accepted for backward compatibility and ignored (the
    exact-GS phase sweep needs no damping).  ``kernels=True`` builds the
    per-shard v6 Pallas tables for every sharded level.  Sharding more than
    the finest level removes the replicated-compute waste on large second
    levels (BASELINE 16M-point configs): smoothing work splits P ways while
    transfers move one coarse-sized vector (psum down, all_gather up).
    """
    shard_levels = max(1, min(shard_levels, hier.num_levels))
    fine_cpu = hier.levels[-1]

    sharded, newposes = [], []
    for j in range(shard_levels):  # fine-first
        op = hier.levels[hier.num_levels - 1 - j]
        lvl, npos = partition_fine_level(op, num_shards, kernels=kernels)
        sharded.append(lvl)
        newposes.append(npos)
    p = num_shards

    # transfers between consecutive sharded levels
    irv, irc, ipv, ipc = [], [], [], []
    for j in range(shard_levels - 1):
        ti = hier.num_levels - 2 - j  # restrict[ti]: level ti+1 -> ti
        rv, rc, pv, pc = _split_transfers(
            ell_to_csr(hier.restrict[ti]).tocsr(),
            ell_to_csr(hier.prolong[ti]).tocsr(),
            newposes[j], sharded[j].n_pad2, sharded[j].shard_rows, p,
            newposes[j + 1], sharded[j + 1].n_pad2,
        )
        irv.append(rv)
        irc.append(rc)
        ipv.append(pv)
        ipc.append(pc)

    last = sharded[-1]
    ns_last = last.shard_rows
    tail_levels = hier.num_levels - shard_levels
    if tail_levels > 0:
        coarse = Hierarchy(
            levels=hier.levels[:tail_levels],
            restrict=hier.restrict[:tail_levels - 1],
            prolong=hier.prolong[:tail_levels - 1],
        )
        ti = tail_levels - 1
        restrict_vals, restrict_lcols, prolong_vals, prolong_cols = (
            _split_transfers(
                ell_to_csr(hier.restrict[ti]).tocsr(),
                ell_to_csr(hier.prolong[ti]).tocsr(),
                newposes[-1], last.n_pad2, ns_last, p,
                None, hier.levels[ti].n_pad,
            )
        )
    else:
        coarse = Hierarchy(levels=(), restrict=(), prolong=())
        restrict_vals = jnp.zeros((p, 1, 1))
        restrict_lcols = jnp.zeros((p, 1, 1), dtype=jnp.int32)
        prolong_vals = jnp.zeros((p, ns_last, 1))
        prolong_cols = jnp.zeros((p, ns_last, 1), dtype=jnp.int32)

    return ShardedHierarchy(
        sharded=tuple(sharded),
        coarse=coarse,
        restrict_vals=restrict_vals,
        restrict_lcols=restrict_lcols,
        prolong_vals=prolong_vals,
        prolong_cols=prolong_cols,
        inter_restrict_vals=tuple(irv),
        inter_restrict_lcols=tuple(irc),
        inter_prolong_vals=tuple(ipv),
        inter_prolong_cols=tuple(ipc),
        fine_op_cpu=fine_cpu,
        newpos=newposes[0],
    )


def hierarchy_to_f32(shier: ShardedHierarchy) -> ShardedHierarchy:
    """Cast every f64 leaf to f32 (TPU execution dtype; kernel tables are
    already f32).  Solve states passed to the sharded cycle must match."""

    def cast(a):
        if hasattr(a, "dtype") and a.dtype == jnp.float64:
            return a.astype(jnp.float32)
        return a

    t = jax.tree_util.tree_map
    return ShardedHierarchy(
        sharded=tuple(t(cast, lvl) for lvl in shier.sharded),
        coarse=t(cast, shier.coarse),
        restrict_vals=cast(shier.restrict_vals),
        restrict_lcols=shier.restrict_lcols,
        prolong_vals=cast(shier.prolong_vals),
        prolong_cols=shier.prolong_cols,
        inter_restrict_vals=tuple(map(cast, shier.inter_restrict_vals)),
        inter_restrict_lcols=shier.inter_restrict_lcols,
        inter_prolong_vals=tuple(map(cast, shier.inter_prolong_vals)),
        inter_prolong_cols=shier.inter_prolong_cols,
        fine_op_cpu=shier.fine_op_cpu,
        newpos=shier.newpos,
    )
