"""Operator assembly: RBF-FD Laplacian + boundary machinery into windowed ELL.

Host-side redesign of Grid::build_laplacian / build_deriv_normal_bound /
modify_coeff_neumann / push_inhomog_to_rhs (grid.cpp:520-685):

* rows with bc flag != 2 get Laplacian stencil weights (grid.cpp:553-565);
* Neumann rows get n.grad = nx*d/dx + ny*d/dy weights over interior-only
  stencils (grid.cpp:520-548);
* with any Neumann boundary, the singular system gets the rank-1
  Lagrange-multiplier border: column of ones on non-Neumann rows, row of
  ones over non-Neumann columns, 1 in the corner (grid.cpp:566-576) — kept
  OUT of the sparse matrix here and applied as a rank-1 term (two psum-able
  dots) in the solve path;
* implicit mode statically condenses Neumann boundary unknowns out of
  interior rows: A' = A - S D^{-1} B with S the interior->boundary coupling,
  B the boundary rows, D their diagonals (grid.cpp:598-662), with exact
  cancellation of the decoupled boundary columns.  The inhomogeneous-BC
  pushdown C = S D^{-1} (push_inhomog_to_rhs, grid.cpp:664-685) is kept as a
  compact device operator because the fractional-step path re-applies it
  every timestep (FractionalStepSim.cpp:137).

Row space: the assembled matrix is padded to a multiple of ``block_rows``
and symmetrically permuted by the capped in-block coloring
(geometry/coloring.py) so the smoother's (block, class) sweep is EXACT
Gauss-Seidel with static [class_size, width] tiles.  ``row_map`` maps
logical cloud indices to permuted rows; every solver vector lives in
permuted space.

All weight solves run in f64 on the CPU backend; outputs are packed into
EllMatrix + mask vectors ready for the jitted solve path.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from meshlessmultigridpoisson_tpu.config import GridConfig
from meshlessmultigridpoisson_tpu.geometry.coloring import block_class_permutation
from meshlessmultigridpoisson_tpu.geometry.neighbors import knn, knn_queries
from meshlessmultigridpoisson_tpu.geometry.pointclouds import PointCloud
from meshlessmultigridpoisson_tpu.ops.ell import EllMatrix, ell_from_csr
from meshlessmultigridpoisson_tpu.stencil.phs import batched_weights
from meshlessmultigridpoisson_tpu.utils.jaxutils import on_cpu


@partial(
    jax.tree_util.register_dataclass,
    data_fields=("rows", "ell"),
    meta_fields=("nrows",),
)
@dataclasses.dataclass(frozen=True)
class CompactRows:
    """A small set of rows of a big operator, packed densely.

    ``rows`` holds target row indices in the big (permuted) row space;
    padding slots point past the end so scatters with mode='drop' ignore
    them.  ``ell.diag`` holds the big matrix's diagonal at those rows.
    """

    rows: jnp.ndarray  # [m_pad] int32
    ell: EllMatrix  # [m_pad, ncols]
    nrows: int  # true m


@partial(
    jax.tree_util.register_dataclass,
    data_fields=(
        "A",
        "bound",
        "cond",
        "lag_col",
        "lag_row",
        "omega_scale",
        "smooth_mask",
        "dirichlet_mask",
        "neumann_mask",
        "dirichlet_values",
        "neumann_values",
        "row_map",
    ),
    meta_fields=("has_lagrange", "implicit", "omega", "iters", "class_size", "n"),
)
@dataclasses.dataclass(frozen=True)
class LevelOperator:
    """Everything the solve path needs for one grid level.

    Vectors are padded to ``A.nrows_pad`` and live in (block, class)-permuted
    row space; ``row_map[i]`` is the permuted row of logical point i.  The
    Lagrange border is the pair (lag_col, lag_row) plus a unit corner,
    applied rank-1 (cf. SURVEY.md "hard parts" #3).  ``omega_scale`` is a
    per-row multiplier on omega (ones by default; the distributed partitioner
    damps partition-seam rows with it).
    """

    A: EllMatrix
    bound: CompactRows  # Neumann boundary rows (empty if pure Dirichlet)
    cond: CompactRows  # C = S D^-1 (empty unless implicit Neumann)
    lag_col: jnp.ndarray  # [n_pad] 1.0 where the border column has a 1
    lag_row: jnp.ndarray  # [n_pad] 1.0 where the border row has a 1
    omega_scale: jnp.ndarray  # [n_pad]
    smooth_mask: jnp.ndarray  # [n_pad] 1.0 at rows the smoother updates
    dirichlet_mask: jnp.ndarray  # [n_pad]
    neumann_mask: jnp.ndarray  # [n_pad]
    dirichlet_values: jnp.ndarray  # [n_pad] g at Dirichlet rows else 0
    neumann_values: jnp.ndarray  # [n_pad] g at Neumann rows else 0
    row_map: jnp.ndarray  # [n] int32: logical -> permuted row
    has_lagrange: bool
    implicit: bool
    omega: float
    iters: int
    class_size: int
    n: int

    @property
    def n_pad(self) -> int:
        return self.A.nrows_pad

    def to_padded(self, v_logical: jnp.ndarray) -> jnp.ndarray:
        """Scatter a logical [n] vector into permuted padded space."""
        out = jnp.zeros(self.n_pad, v_logical.dtype)
        return out.at[self.row_map].set(v_logical)

    def to_logical(self, v_padded: jnp.ndarray) -> jnp.ndarray:
        """Gather a permuted padded vector back to logical [n] order."""
        return jnp.take(v_padded, self.row_map)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _empty_compact(ncols: int, block_rows: int) -> CompactRows:
    ell = ell_from_csr(sp.csr_matrix((block_rows, ncols)), block_rows=block_rows)
    rows = jnp.full((block_rows,), min(ncols + 1, 2**31 - 1), dtype=jnp.int32)
    return CompactRows(rows=rows, ell=ell, nrows=0)


def _compact_from_rows(
    mat: sp.csr_matrix, row_idx: np.ndarray, block_rows: int
) -> CompactRows:
    """Pack rows ``row_idx`` of ``mat`` into a CompactRows.

    The compact ELL's ``diag`` holds the ORIGINAL matrix diagonal at those
    rows (A[r, r]) — what the boundary row-solve divides by (grid.cpp:92-97).
    """
    if row_idx.size == 0:
        return _empty_compact(mat.shape[1], block_rows)
    sub = mat[row_idx]
    ell = ell_from_csr(sub, block_rows=block_rows, ncols=mat.shape[1])
    m_pad = ell.nrows_pad
    sentinel = min(mat.shape[1] + 1, 2**31 - 1)
    rows = np.full(m_pad, sentinel, dtype=np.int64)
    rows[: row_idx.size] = row_idx
    dvec = np.ones(m_pad, dtype=mat.dtype)
    d_all = mat.diagonal()
    dvec[: row_idx.size] = np.where(d_all[row_idx] != 0.0, d_all[row_idx], 1.0)
    ell = dataclasses.replace(ell, diag=jnp.asarray(dvec))
    return CompactRows(
        rows=jnp.asarray(rows.astype(np.int32)), ell=ell, nrows=int(row_idx.size)
    )


def bc_flags_from_cloud(cloud: PointCloud, bc_types: list[str]) -> np.ndarray:
    """Per-point flags: 0 interior, 1 Dirichlet, 2 Neumann (grid.cpp:33-40)."""
    flags = np.zeros(cloud.n, dtype=np.int32)
    for bidx, t in zip(cloud.boundaries, bc_types):
        if t not in ("dirichlet", "neumann"):
            raise ValueError(f"bc type {t!r}")
        flags[bidx] = 1 if t == "dirichlet" else 2
    return flags


def assemble_operator_csr(
    cloud: PointCloud,
    bc_flags: np.ndarray,
    config: GridConfig,
    op: str = "laplace",
    neumann_rows: bool = True,
) -> sp.csr_matrix:
    """Raw RBF-FD operator CSR in logical point order.

    ``op='laplace'`` with ``neumann_rows=True`` gives the reference
    build_laplacian rows (n.grad rows at Neumann points); with
    ``neumann_rows=False`` it is the plain velocity Laplacian
    (build_uv_laplace_mat, fractionalStepGrid.cpp:87-100).  'dx'/'dy' give
    the derivative operators (build_derivX_mat/build_derivY_mat).
    """
    pts = cloud.points
    n = cloud.n
    has_neumann = bool((bc_flags == 2).any())
    k = config.stencil_size
    neighbors = knn(pts, k, boundary_mask=bc_flags != 0, neumann=has_neumann)

    with on_cpu():
        ptsj = jnp.asarray(pts)
        nbj = jnp.asarray(neighbors)
        w = np.array(
            batched_weights(
                ptsj, nbj, ptsj, op=op,
                poly_deg=config.poly_deg, rbf_exp=config.rbf_exp,
            )
        )
        if has_neumann and neumann_rows and op == "laplace":
            bidx = np.nonzero(bc_flags == 2)[0]
            wx = np.asarray(
                batched_weights(
                    ptsj, nbj[bidx], ptsj[bidx], op="dx",
                    poly_deg=config.poly_deg, rbf_exp=config.rbf_exp,
                )
            )
            wy = np.asarray(
                batched_weights(
                    ptsj, nbj[bidx], ptsj[bidx], op="dy",
                    poly_deg=config.poly_deg, rbf_exp=config.rbf_exp,
                )
            )
            nx = cloud.normals[bidx, 0:1]
            ny = cloud.normals[bidx, 1:2]
            w[bidx] = nx * wx + ny * wy  # n.grad rows (grid.cpp:520-548)
            if pts.shape[1] == 3:  # 3D extension: z-component of n.grad
                wz = np.asarray(
                    batched_weights(
                        ptsj, nbj[bidx], ptsj[bidx], op="dz",
                        poly_deg=config.poly_deg, rbf_exp=config.rbf_exp,
                    )
                )
                w[bidx] += cloud.normals[bidx, 2:3] * wz

    rows = np.repeat(np.arange(n), k)
    A = sp.coo_matrix(
        (w.ravel(), (rows, neighbors.ravel().astype(np.int64))), shape=(n, n)
    ).tocsr()
    A.sum_duplicates()
    return A


def build_level_operator(
    cloud: PointCloud,
    bc_flags: np.ndarray,
    bc_values: np.ndarray,
    config: GridConfig,
    implicit: bool | None = None,
    block_rows: int = 256,
    class_size: int = 8,
    interior_csr: sp.csr_matrix | None = None,
) -> LevelOperator:
    """Assemble the full level operator for an (RCM-ordered) cloud.

    ``bc_values``: dense [N] boundary data g (Dirichlet value or Neumann
    normal-derivative value), zero at interior points.  ``implicit`` default:
    True iff the problem has any Neumann boundary (the reference always sets
    implicitFlag_=true on its Neumann paths, testing_functions.cpp:268,
    FractionalStepSim.cpp:36, and false for Dirichlet, :151).

    ``interior_csr`` overrides the INTERIOR rows of the operator (boundary
    rows keep their standard treatment) — used by the compatible-projection
    pressure operator div o grad = Dx.Dx + Dy.Dy, which makes the
    fractional-step projection loop contractive where the reference's
    assembled-Laplacian PPE has loop gain > 1 (measured ~5 on corner modes).
    """
    n = cloud.n
    has_neumann = bool((bc_flags == 2).any())
    if implicit is None:
        implicit = has_neumann

    A = assemble_operator_csr(cloud, bc_flags, config)
    if interior_csr is not None:
        interior = (bc_flags == 0).astype(np.float64)
        A = (
            interior_csr.multiply(interior[:, None])
            + A.multiply((1.0 - interior)[:, None])
        ).tocsr()
        A.sum_duplicates()
    cond_csr = None
    if has_neumann and implicit:
        A, cond_csr = _condense_neumann(A, bc_flags)

    # --- pad to a block multiple and apply the (block, class) permutation ---
    n_pad = _round_up(n, block_rows)
    A_pad = sp.block_diag(
        [A, sp.identity(n_pad - n, format="csr")], format="csr"
    ) if n_pad > n else A
    perm, conflicts = block_class_permutation(A_pad, block_rows, class_size)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(n_pad)
    row_map = inv[:n]

    A_p = A_pad[perm][:, perm].tocsr()
    A_p.sum_duplicates()
    ell = ell_from_csr(A_p, block_rows=block_rows)
    assert ell.nrows_pad == n_pad

    # --- damp residual coloring conflicts -----------------------------------
    # Rows sharing a (block, class) with a coupled neighbor see a STALE
    # value during the simultaneous 8-row class update — Jacobi, not GS,
    # on those pairs.  With omega=1.4 that over-relaxes a stale read and
    # can float the smoother's contraction (measured: the kd-ordered 151k
    # fine level floors the mixed solve at 4.5e-5 with 8k undamped
    # conflict pairs).  Detect the surviving pairs post-hoc (works for
    # both the native and python colorers) and pull those rows back to
    # omega=1.0 via the per-row omega_scale the smoother already carries.
    omega_scale = np.ones(n_pad)
    if conflicts:
        import warnings

        coo = A_p.tocoo()
        blk_r, blk_c = coo.row // block_rows, coo.col // block_rows
        cls_r = (coo.row % block_rows) // class_size
        cls_c = (coo.col % block_rows) // class_size
        pair = (coo.row != coo.col) & (blk_r == blk_c) & (cls_r == cls_c)
        conflicted = np.unique(np.r_[coo.row[pair], coo.col[pair]])
        omega_scale[conflicted] = min(1.0, 1.0 / float(config.omega))
        warnings.warn(
            f"in-block coloring left {conflicts} conflicting pairs; "
            f"{conflicted.size} rows damped to omega=1.0 (stale-read "
            "updates stay contractive; exact GS elsewhere)"
        )

    def padded(v, dtype=np.float64):
        out = np.zeros(n_pad, dtype=dtype)
        out[row_map] = v
        return jnp.asarray(out)

    bound = _compact_from_rows(A_p, row_map[bc_flags == 2], block_rows)
    if cond_csr is not None:
        cpad = sp.bmat(
            [[cond_csr, None], [None, sp.csr_matrix((n_pad - n, n_pad - n))]],
            format="csr",
        ) if n_pad > n else cond_csr
        cond_p = cpad[perm][:, perm].tocsr()
        crows = np.nonzero(np.diff(cond_p.indptr) > 0)[0]
        cond = _compact_from_rows(cond_p, crows, block_rows)
    else:
        cond = _empty_compact(n_pad, block_rows)

    lag = float(has_neumann)
    return LevelOperator(
        A=ell,
        bound=bound,
        cond=cond,
        lag_col=padded((bc_flags != 2) * lag),
        lag_row=padded((bc_flags != 2) * lag),
        omega_scale=jnp.asarray(omega_scale),
        smooth_mask=padded(bc_flags == 0),
        dirichlet_mask=padded(bc_flags == 1),
        neumann_mask=padded(bc_flags == 2),
        dirichlet_values=padded(np.where(bc_flags == 1, bc_values, 0.0)),
        neumann_values=padded(np.where(bc_flags == 2, bc_values, 0.0)),
        row_map=jnp.asarray(row_map.astype(np.int32)),
        has_lagrange=has_neumann,
        implicit=bool(implicit),
        omega=float(config.omega),
        iters=int(config.iters),
        class_size=int(class_size),
        n=n,
    )


def _condense_neumann(
    A: sp.csr_matrix, bc_flags: np.ndarray, diag_guard: float = 0.25
) -> tuple[sp.csr_matrix, sp.csr_matrix]:
    """Implicit static condensation of Neumann unknowns (grid.cpp:598-662).

    A' = A - S Bs with Bs = D^{-1} B (unit diagonal at boundary rows), so the
    interior-row boundary-column decoupling cancels exactly (the reference's
    explicit -A_ij triplet, grid.cpp:653); residual entries are hard-zeroed.
    Returns (A', C = S D^{-1}) for the runtime RHS pushdown.

    Robustness beyond the reference: condensation can nearly cancel an
    interior diagonal (measured |offdiag|/|diag| blowing up ~40x on rough
    clouds), which destabilizes any relaxation smoother.  Rows whose
    condensed diagonal shrinks below ``diag_guard`` * original revert to
    their un-condensed form (explicit boundary coupling — exactly the
    reference's implicitFlag_=false semantics for those rows) and are
    dropped from the RHS-pushdown operator C.
    """
    n = A.shape[0]
    interior = bc_flags == 0
    nmn = bc_flags == 2

    D = A.diagonal()
    if bool((nmn & (D == 0)).any()):
        raise ValueError(
            f"{int((nmn & (D == 0)).sum())} Neumann boundary rows have a "
            "zero diagonal (n.grad self-weight) — the boundary row-solve "
            "(grid.cpp:92-97) and condensation both divide by it; check "
            "the cloud's normals"
        )
    d_b = np.where(nmn, D, 1.0)

    S = A.multiply(interior[:, None]).multiply(nmn[None, :]).tocsr()
    C = S.multiply(1.0 / d_b[None, :]).tocsr()
    Bs = A.multiply(nmn[:, None]).multiply(1.0 / d_b[:, None]).tocsr()

    A2 = (A - (S @ Bs)).tocsr()
    A2.sum_duplicates()

    # partial-condensation guard: revert rows whose diagonal collapses OR
    # whose row dominance ratio |offdiag|/|diag| degrades badly
    def row_ratio(M):
        d = M.diagonal()
        offsum = np.abs(M).sum(axis=1).A1 - np.abs(d)
        return offsum / np.maximum(np.abs(d), 1e-300)

    r1, r2 = row_ratio(A), row_ratio(A2)
    bad = interior & (
        (np.abs(A2.diagonal()) < diag_guard * np.abs(D))
        | (r2 > np.maximum(3.0 * r1, 10.0))
    )
    if bad.any():
        keep = ~bad
        A2 = A2.multiply(keep[:, None]).tocsr() + A.multiply(bad[:, None]).tocsr()
        A2 = A2.tocsr()
        A2.sum_duplicates()
        C = C.multiply(keep[:, None]).tocsr()
        C.eliminate_zeros()
        interior = interior & keep  # only condensed rows get cols zeroed

    mask_bad = interior[np.repeat(np.arange(n), np.diff(A2.indptr))] & nmn[A2.indices]
    A2.data[mask_bad] = 0.0
    A2.eliminate_zeros()
    return A2, C


def build_interp_operator(
    base_cloud_points: np.ndarray,
    target_points: np.ndarray,
    poly_deg: int,
    rbf_exp: int = 3,
    block_rows: int = 256,
    row_map_target: np.ndarray | None = None,
    row_map_base: np.ndarray | None = None,
    n_pad_target: int | None = None,
    n_pad_base: int | None = None,
) -> EllMatrix:
    """RBF interpolation matrix [n_target(_pad), n_base(_pad)].

    Equivalent of Multigrid::buildInterpMatrix (multigrid.cpp:17-33):
    row i holds base-grid pointInterpWeights evaluated at target point i,
    stencil size 2.5*polyTerms(poly_deg) from the base cloud with no
    boundary exclusions (grid.cpp:687-712).  If row maps are given, rows and
    columns are placed in the levels' permuted padded row spaces.
    """
    # dim-aware stencil size: 3D deg-3 monomials have 20 terms, so the 2D
    # k=25 stencil is barely unisolvent — one near-degenerate neighborhood
    # in the 1M box3d ladder produced a NaN interpolation row that NaN'd
    # every TPU V-cycle (round 5).  3D needs k = 2.5 * 20 = 50 here.
    cfg = GridConfig(poly_deg=poly_deg, rbf_exp=rbf_exp,
                     dim=int(base_cloud_points.shape[1]))
    k = cfg.stencil_size
    nb = knn_queries(base_cloud_points, target_points, k)
    with on_cpu():
        w = np.asarray(
            batched_weights(
                jnp.asarray(base_cloud_points),
                jnp.asarray(nb),
                jnp.asarray(target_points),
                op="interp",
                poly_deg=poly_deg,
                rbf_exp=rbf_exp,
            )
        )
    bad = ~np.isfinite(w).all(axis=1)
    if bad.any():
        # degenerate neighborhood (singular saddle): fall back to
        # nearest-point injection for those rows rather than shipping
        # NaN weights into every V-cycle
        import warnings

        warnings.warn(f"interp weights non-finite for {int(bad.sum())} "
                      f"target points; using nearest-point injection there")
        w[bad] = 0.0
        w[bad, 0] = 1.0
    m = target_points.shape[0]
    nbase = base_cloud_points.shape[0]
    rows = np.repeat(np.arange(m), k)
    cols = nb.ravel().astype(np.int64)
    if row_map_target is not None:
        rows = np.asarray(row_map_target)[rows]
        m = n_pad_target
    if row_map_base is not None:
        cols = np.asarray(row_map_base)[cols]
        nbase = n_pad_base
    mat = sp.coo_matrix((w.ravel(), (rows, cols)), shape=(m, nbase)).tocsr()
    return ell_from_csr(mat, block_rows=block_rows)
