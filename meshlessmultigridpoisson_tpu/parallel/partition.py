"""Host-side domain partitioner: contiguous RCM row blocks per device.

Produces stacked [P, ...] arrays (leading axis = device) so the sharded
solve path (parallel/sharded.py) can shard_map over them.  The fine level
is row-partitioned with a uniform halo H; coarse levels stay replicated.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from meshlessmultigridpoisson_tpu.mg.vcycle import Hierarchy
from meshlessmultigridpoisson_tpu.ops.ell import EllMatrix, ell_to_csr, global_cols
from meshlessmultigridpoisson_tpu.stencil.operators import LevelOperator


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@partial(
    jax.tree_util.register_dataclass,
    data_fields=(
        "vals", "lcols_ext", "win_start_ext", "diag",
        "smooth_mask", "dirichlet_mask", "neumann_mask",
        "dirichlet_values", "neumann_values", "omega_w", "lag_col", "lag_row",
        "bound_rows", "bound_vals", "bound_lcols_ext", "bound_diag",
        "cond_rows", "cond_vals", "cond_lcols_ext",
    ),
    meta_fields=(
        "n", "n_pad2", "num_shards", "shard_rows", "halo",
        "block_rows", "class_size", "width", "has_lagrange", "omega", "iters",
    ),
)
@dataclasses.dataclass(frozen=True)
class ShardedFineLevel:
    """Fine-level operator split into P contiguous row shards + halo maps.

    ``lcols_ext`` indexes the EXTENDED local vector
    x_ext = [left halo (H), own rows (Ns), right halo (H)].
    Compact row sets (Neumann boundary rows, condensation rows) hold LOCAL
    row ids with an out-of-range sentinel for padding.
    """

    vals: jnp.ndarray  # [P, Ns, w]
    lcols_ext: jnp.ndarray  # [P, Ns, w] int32 into x_ext
    win_start_ext: jnp.ndarray  # [P, nblocks_s] int32 (info only)
    diag: jnp.ndarray  # [P, Ns]
    smooth_mask: jnp.ndarray
    dirichlet_mask: jnp.ndarray
    neumann_mask: jnp.ndarray
    dirichlet_values: jnp.ndarray
    neumann_values: jnp.ndarray
    omega_w: jnp.ndarray  # [P, Ns] per-row omega (seam rows damped)
    lag_col: jnp.ndarray
    lag_row: jnp.ndarray
    bound_rows: jnp.ndarray  # [P, mb] int32 local row ids (sentinel = Ns+big)
    bound_vals: jnp.ndarray  # [P, mb, wb]
    bound_lcols_ext: jnp.ndarray  # [P, mb, wb]
    bound_diag: jnp.ndarray  # [P, mb]
    cond_rows: jnp.ndarray  # [P, mc]
    cond_vals: jnp.ndarray  # [P, mc, wc]
    cond_lcols_ext: jnp.ndarray  # [P, mc, wc]
    n: int
    n_pad2: int
    num_shards: int
    shard_rows: int
    halo: int
    block_rows: int
    class_size: int
    width: int
    has_lagrange: bool
    omega: float
    iters: int


def _compact_to_shards(
    rows: np.ndarray,  # global (padded2) row ids, real entries only
    vals: np.ndarray,  # [m, w]
    gcols: np.ndarray,  # [m, w] global cols (padding entries value 0)
    diag: np.ndarray | None,  # [m]
    p: int,
    ns: int,
    halo: int,
):
    """Split compact row sets by owner shard; local rows + ext cols."""
    owner = rows // ns
    mmax = max(int(np.bincount(owner, minlength=p).max()) if rows.size else 0, 1)
    w = vals.shape[1]
    out_rows = np.full((p, mmax), ns + 10**6, dtype=np.int64)
    out_vals = np.zeros((p, mmax, w))
    out_cols = np.zeros((p, mmax, w), dtype=np.int64)
    out_diag = np.ones((p, mmax))
    for s in range(p):
        sel = np.nonzero(owner == s)[0]
        m = sel.size
        out_rows[s, :m] = rows[sel] - s * ns
        out_vals[s, :m] = vals[sel]
        ext = gcols[sel] - (s * ns - halo)
        # padding entries may fall outside the ext range; point them at 0
        ext = np.where(out_vals[s, :m] != 0.0, ext, 0)
        out_cols[s, :m] = np.clip(ext, 0, ns + 2 * halo - 1)
        if diag is not None:
            out_diag[s, :m] = diag[sel]
    return out_rows, out_vals, out_cols, out_diag


def partition_fine_level(
    op: LevelOperator, num_shards: int, seam_damp: float = 0.6
) -> ShardedFineLevel:
    p = num_shards
    b = op.A.block_rows
    n_pad = op.n_pad
    n_pad2 = _round_up(n_pad, p * b)
    ns = n_pad2 // p
    w = op.A.width

    def pad_rows(v, fill=0.0):
        out = np.full(n_pad2, fill, dtype=np.float64)
        out[: v.shape[0]] = np.asarray(v)
        return out

    vals = np.zeros((n_pad2, w))
    vals[:n_pad] = np.asarray(op.A.vals)
    gcols = np.zeros((n_pad2, w), dtype=np.int64)
    gcols[:n_pad] = np.asarray(global_cols(op.A))
    gcols[n_pad:] = np.minimum(np.arange(n_pad, n_pad2), n_pad - 1)[:, None]

    ws = np.asarray(op.A.win_start).astype(np.int64)
    nblocks2 = n_pad2 // b
    ws2 = np.zeros(nblocks2, dtype=np.int64)
    ws2[: ws.size] = ws
    ws2[ws.size :] = max(n_pad - op.A.win_size, 0)
    wsize = op.A.win_size

    # uniform halo over all shards, 128-aligned
    blk_shard = np.arange(nblocks2) * b // ns
    start_of = blk_shard * ns
    end_of = start_of + ns
    h = max(
        int(np.maximum(start_of - ws2, 0).max()),
        int(np.maximum(ws2 + wsize - end_of, 0).max()),
    )
    h = _round_up(max(h, 1), 128)

    # seam rows: any stencil col outside the owner shard
    row_shard = np.arange(n_pad2) // ns
    seam = (
        (gcols < (row_shard * ns)[:, None])
        | (gcols >= ((row_shard + 1) * ns)[:, None])
    ).any(axis=1)
    omega_scale = pad_rows(op.omega_scale, 1.0)
    omega_w = op.omega * omega_scale * np.where(seam, seam_damp, 1.0)

    lcols_ext = gcols - (row_shard * ns - h)[:, None]
    assert (lcols_ext >= 0).all() and (lcols_ext < ns + 2 * h).all()

    def shard(vv):
        return jnp.asarray(np.asarray(vv).reshape(p, ns, *vv.shape[1:]))

    # compact sets
    bc = op.bound
    brows_g = np.asarray(bc.rows)[: bc.nrows]
    bvals = np.asarray(bc.ell.vals)[: bc.nrows]
    bgcols = np.asarray(global_cols(bc.ell))[: bc.nrows]
    bdiag = np.asarray(bc.ell.diag)[: bc.nrows]
    br, bv, bcx, bd = _compact_to_shards(brows_g, bvals, bgcols, bdiag, p, ns, h)

    cc = op.cond
    crows_g = np.asarray(cc.rows)[: cc.nrows]
    cvals = np.asarray(cc.ell.vals)[: cc.nrows]
    cgcols = np.asarray(global_cols(cc.ell))[: cc.nrows]
    cr, cv, ccx, _ = _compact_to_shards(crows_g, cvals, cgcols, None, p, ns, h)

    return ShardedFineLevel(
        vals=shard(vals),
        lcols_ext=shard(lcols_ext.astype(np.int32)),
        win_start_ext=jnp.asarray(
            (ws2 - (blk_shard * ns - h)).reshape(p, -1).astype(np.int32)
        ),
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
        halo=h,
        block_rows=b,
        class_size=op.class_size,
        width=w,
        has_lagrange=op.has_lagrange,
        omega=op.omega,
        iters=op.iters,
    )


@dataclasses.dataclass
class ShardedHierarchy:
    """Sharded fine level + replicated coarse machinery."""

    fine: ShardedFineLevel
    coarse: Hierarchy  # levels[:-1] hierarchy (replicated), may be empty
    # fine<->coarsest-below transfers, split by fine shard:
    restrict_vals: jnp.ndarray  # [P, nc_pad, wR] R restricted to shard cols
    restrict_lcols: jnp.ndarray  # [P, nc_pad, wR] LOCAL fine cols [0, Ns)
    prolong_vals: jnp.ndarray  # [P, Ns, wP]
    prolong_cols: jnp.ndarray  # [P, Ns, wP] coarse (replicated) cols
    fine_op_cpu: LevelOperator  # for problem construction / extraction


def partition_hierarchy(
    hier: Hierarchy, num_shards: int, seam_damp: float = 0.6
) -> ShardedHierarchy:
    fine_cpu = hier.levels[-1]
    fine = partition_fine_level(fine_cpu, num_shards, seam_damp)
    p, ns = fine.num_shards, fine.shard_rows

    if hier.num_levels > 1:
        coarse = Hierarchy(
            levels=hier.levels[:-1],
            restrict=hier.restrict[:-1],
            prolong=hier.prolong[:-1],
        )
        rtop = ell_to_csr(hier.restrict[-1])  # [nc_pad x nf_pad]
        ptop = ell_to_csr(hier.prolong[-1])  # [nf_pad x nc_pad]
        nc_pad = hier.levels[-2].n_pad

        # R split by fine (col) shard -> per-shard partial products + psum
        rv, rc = [], []
        wmax = 1
        shards_csr = []
        for s in range(p):
            lo, hi = s * ns, (s + 1) * ns
            cols_mask = np.zeros(rtop.shape[1], bool)
            cols_mask[lo : min(hi, rtop.shape[1])] = True
            rs = rtop.multiply(cols_mask[None, :]).tocsr()
            rs.eliminate_zeros()
            shards_csr.append(rs)
            wmax = max(wmax, int(np.diff(rs.indptr).max(initial=0)), 1)
        for s, rs in enumerate(shards_csr):
            v = np.zeros((nc_pad, wmax))
            c = np.zeros((nc_pad, wmax), dtype=np.int64)
            nnzr = np.diff(rs.indptr)
            rows = np.repeat(np.arange(rs.shape[0]), nnzr)
            pos = np.arange(rs.nnz) - np.repeat(rs.indptr[:-1], nnzr)
            v[rows, pos] = rs.data
            c[rows, pos] = rs.indices - s * ns
            rv.append(v)
            rc.append(c)

        # P rows by fine shard; cols = coarse ids (replicated coarse x)
        pv, pc = [], []
        wpmax = 1
        prows = []
        n_pad = fine_cpu.n_pad
        for s in range(p):
            lo, hi = s * ns, min((s + 1) * ns, n_pad)
            psub = ptop[lo:hi].tocsr()
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
    )
