"""TPU execution backend: LevelOperator -> TpuLevel over the Pallas kernels.

The generic V-cycle engine (mg/vcycle.py) is backend-agnostic: it calls the
functions in ops/smoothers.py, which dispatch here when handed a TpuLevel.
A TpuLevel repacks a (f64, CPU-built) LevelOperator into the f32
segment-ragged windowed layout (ops/kernels6.py; ops/kernels.py v2 as the
fallback for non-8-class or >GMAX-patch operators) plus
[nblocks, B/128, 128] row tensors.  Semantics are IDENTICAL to the XLA path — same (block, class)
Gauss-Seidel, Lagrange border, Neumann row-solve, RHS pushdown — modulo f32
arithmetic (Mosaic has no f64; tight tolerances come from mixed-precision
outer iterations).
"""

from __future__ import annotations

import dataclasses
import warnings
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from meshlessmultigridpoisson_tpu.mg.vcycle import Hierarchy
from meshlessmultigridpoisson_tpu.ops.kernels import (
    KernelEll2,
    prepare_kernel_ell2,
    sor_sweep_tpu2,
    spmv_tpu2,
    LANES,
)
from meshlessmultigridpoisson_tpu.ops.kernels4 import (
    Ell4Unsupported,
    build_oneshot_K,
)
from meshlessmultigridpoisson_tpu.ops.kernels6 import (
    pack_oneshot_K6,
    prepare_kernel_ell6,
    sor_sweep_tpu6,
    sor_sweep_tpu7,
    spmv_tpu6,
    union_sweep_tables,
)
from meshlessmultigridpoisson_tpu.ops.kernels8 import (
    permute_b8,
    prepare_colored_sweep,
    sor_sweep_tpu8,
    spmv_tpu8,
)
from meshlessmultigridpoisson_tpu.stencil.operators import LevelOperator


@partial(
    jax.tree_util.register_dataclass,
    data_fields=(
        "kell",
        "kell6",
        "kinvT_sg",
        "union7",
        "colored8",
        "bound_kell",
        "bound_rows",
        "bound_diag",
        "cond_kell",
        "cond_rows",
        "diag",
        "dinv3",
        "mask3",
        "omega3",
        "lagc3",
        "lag_col",
        "lag_row",
        "smooth_mask",
        "dirichlet_mask",
        "neumann_mask",
        "dirichlet_values",
        "neumann_values",
        "row_map",
    ),
    meta_fields=(
        "has_lagrange", "implicit", "omega", "iters", "class_size", "n",
        "bound_n", "cond_n", "nnz", "n_pad_",
    ),
)
@dataclasses.dataclass(frozen=True)
class TpuLevel:
    """All per-level data in kernel-ready f32 layouts."""

    kell: KernelEll2
    kell6: object  # segment-ragged KernelEll6 (v6 spmv + sweep), or None
    kinvT_sg: object  # per-segment one-shot sweep matrices, or None
    union7: object  # UnionSweep tables (v7 exact sweep), or None
    colored8: object  # ColoredSweep tables (v8 block-colored GS), or None
    bound_kell: KernelEll2  # Neumann rows, compact
    bound_rows: jnp.ndarray  # [mb_pad] i32 into padded rows
    bound_diag: jnp.ndarray  # [mb_pad] f32
    cond_kell: KernelEll2
    cond_rows: jnp.ndarray
    diag: jnp.ndarray  # [n_pad] f32
    dinv3: jnp.ndarray  # [nblocks, B/128, 128]
    mask3: jnp.ndarray
    omega3: jnp.ndarray
    lagc3: jnp.ndarray
    lag_col: jnp.ndarray  # [n_pad]
    lag_row: jnp.ndarray
    smooth_mask: jnp.ndarray
    dirichlet_mask: jnp.ndarray
    neumann_mask: jnp.ndarray
    dirichlet_values: jnp.ndarray
    neumann_values: jnp.ndarray
    row_map: jnp.ndarray
    has_lagrange: bool
    implicit: bool
    omega: float
    iters: int
    class_size: int
    n: int
    bound_n: int
    cond_n: int
    nnz: int = 0
    n_pad_: int = 0

    @property
    def n_pad(self) -> int:
        return self.n_pad_

    @property
    def kernel_kind(self) -> str:
        """Which sweep/matvec kernel family this level actually runs.

        Recorded in per-level profiles and SolveRecords so a silent
        fallback to the slow v2 path (the round-4 150k flagship regression)
        is visible in every artifact."""
        if self.colored8 is not None:
            return "v8-colored"
        if self.union7 is not None:
            return "v7-exact"
        if self.kell6 is not None:
            return "v6-oneshot"
        return "v2-fallback"

    # interface parity with LevelOperator for model code
    def to_padded(self, v_logical: jnp.ndarray) -> jnp.ndarray:
        out = jnp.zeros(self.n_pad, v_logical.dtype)
        return out.at[self.row_map].set(v_logical)

    def to_logical(self, v_padded: jnp.ndarray) -> jnp.ndarray:
        return jnp.take(v_padded, self.row_map)


def _rows3(kell, v: np.ndarray, dtype=np.float32) -> jnp.ndarray:
    b = kell.block_rows
    return jnp.asarray(
        np.asarray(v, dtype).reshape(kell.nblocks, b // LANES, LANES)
    )


def _lagc2_np(op: LevelOperator, nb: int) -> np.ndarray:
    """[nb, 128] f32 Lagrange-column rows (zero-padded to the block grid)."""
    out = np.zeros(nb * LANES, np.float32)
    lc = np.asarray(op.lag_col, np.float32)
    out[: lc.shape[0]] = lc
    return out.reshape(nb, LANES)


def tpu_level_from_operator(
    op: LevelOperator, dtype=jnp.float32, use_v6: bool | None = None,
    k_dtype=None, sweep: str = "colored",
) -> TpuLevel:
    """Repack a CPU-built LevelOperator for TPU kernels (host-side).

    ``use_v6``: None (default) auto-enables the v6 segment-ragged kernels +
    one-shot GS matrices whenever the layout supports them (class_size 8);
    False forces the v2 path — the one-shot K tensor costs 512 B/row of
    extra HBM streaming per sweep and a chunked host-side inversion pass at
    setup, which a memory-constrained deployment may want to skip on levels
    where sweep time is negligible.

    ``k_dtype``: storage dtype for the one-shot K tensor only (default =
    ``dtype``).  ``jnp.bfloat16`` halves the K stream (~34% of sweep HBM
    bytes at k=70).  Safe for production: K multiplies the sweep residual,
    so the smoother's FIXED POINT (K @ 0 = 0) is exactly unchanged — only
    the contraction rate moves at the bf16 rounding level, and outer f64
    defect correction (mg/mixed.py) owns the accuracy bar.

    ``sweep``: "colored" (default) prepares the v8 block-colored GS sweep
    (ops/kernels8.py) — exact GS under the colored block order, ~3x the
    storage-order sweep's throughput (the round-3 latency wall); falls back
    to the exact storage-order v7 sweep on layouts the coloring rejects
    (tiny/dense levels).  "exact" forces storage-order v7/v6 — bit-parity
    with the XLA oracle `_gs_sweep` for parity studies.
    """
    kell = prepare_kernel_ell2(op.A, class_size=op.class_size, dtype=dtype)
    n_pad_ = kell.nrows_pad
    nnz = int(np.count_nonzero(np.asarray(op.A.vals)))
    # v6 path needs 8-row classes in natural order (lane//8) and a
    # 128-row-aligned square operator; anything else falls back to v2.
    kell6, kinvT_sg, union7, colored8 = None, None, None, None
    if use_v6 is None:
        use_v6 = op.class_size == 8
    if use_v6 and op.class_size == 8:
        try:
            kell6 = prepare_kernel_ell6(op.A, dtype=dtype)
            kinv_np = build_oneshot_K(
                op.A,
                op.omega * np.asarray(op.omega_scale),
                np.asarray(op.smooth_mask),
            )
        except Ell4Unsupported as e:
            # LOUD: a level on the v2 path runs its sweeps ~25x slower —
            # the round-4 150k flagship silently lost its entire fine
            # level to this branch (VERDICT r4 weak #1)
            warnings.warn(
                f"TPU level n={op.n}: v6 kernel prep failed ({e}); "
                f"falling back to the SLOW v2 kernels", stacklevel=2)
            kell6 = None
    if kell6 is not None:
        if sweep == "colored":
            try:
                colored8 = prepare_colored_sweep(
                    kell6, kinv_np, _lagc2_np(op, kell6.nblocks),
                    k_dtype=k_dtype or dtype)
            except Ell4Unsupported:
                colored8 = None  # expected on tiny levels (< 32 blocks);
                # the exact v7/v6 sweep is the right kernel there
        if colored8 is None:
            # exact storage-order path: v7 union-scratch sweep (hoisted
            # per-program x loads, bit-identical GS arithmetic), per-block
            # v6 sweep when a program's union exceeds the scratch bound
            kinvT_sg = pack_oneshot_K6(kell6, kinv_np, k_dtype or dtype)
            try:
                union7 = union_sweep_tables(kell6)
            except Ell4Unsupported:
                union7 = None
    if colored8 is not None:
        # the colored tables serve BOTH sweep (sor_sweep_tpu8) and matvec
        # (spmv_tpu8); keeping the v2 + v6 tables alongside them tripled
        # the fine level's HBM footprint (4.9 GB each at the 1M-point 3D
        # flagship -> OOM on the 16 GB chip)
        kell = kell6 = None
    bk = prepare_kernel_ell2(op.bound.ell, class_size=op.class_size, dtype=dtype)
    ck = prepare_kernel_ell2(op.cond.ell, class_size=op.class_size, dtype=dtype)
    diag = np.asarray(op.A.diag)
    f = lambda v: jnp.asarray(np.asarray(v), dtype)
    r3 = (lambda v: None) if kell is None else (
        lambda v: _rows3(kell, v))
    return TpuLevel(
        kell=kell,
        kell6=kell6,
        kinvT_sg=kinvT_sg,
        union7=union7,
        colored8=colored8,
        bound_kell=bk,
        bound_rows=jnp.asarray(np.asarray(op.bound.rows)),
        bound_diag=f(op.bound.ell.diag),
        cond_kell=ck,
        cond_rows=jnp.asarray(np.asarray(op.cond.rows)),
        diag=f(diag),
        dinv3=r3(1.0 / diag),
        mask3=r3(np.asarray(op.smooth_mask)),
        omega3=r3(op.omega * np.asarray(op.omega_scale)),
        lagc3=r3(np.asarray(op.lag_col)),
        lag_col=f(op.lag_col),
        lag_row=f(op.lag_row),
        smooth_mask=f(op.smooth_mask),
        dirichlet_mask=f(op.dirichlet_mask),
        neumann_mask=f(op.neumann_mask),
        dirichlet_values=f(op.dirichlet_values),
        neumann_values=f(op.neumann_values),
        row_map=jnp.asarray(np.asarray(op.row_map)),
        has_lagrange=op.has_lagrange,
        implicit=op.implicit,
        omega=op.omega,
        iters=op.iters,
        class_size=op.class_size,
        n=op.n,
        bound_n=op.bound.nrows,
        cond_n=op.cond.nrows,
        nnz=nnz,
        n_pad_=n_pad_,
    )


def tpu_hierarchy(
    hier: Hierarchy, dtype=jnp.float32, use_v6: bool | None = None,
    k_dtype=None, sweep: str = "colored",
) -> Hierarchy:
    """Convert a CPU hierarchy to the TPU backend (transfer ops included)."""
    levels = tuple(
        tpu_level_from_operator(op, dtype, use_v6=use_v6, k_dtype=k_dtype,
                                sweep=sweep)
        for op in hier.levels
    )

    def prep_transfer(ell):
        # v6 segment-ragged layout when it fits — the v2 patch-table
        # kernel's per-block select dots blow the 16 MB scoped-VMEM limit
        # at 1M-row transfers (the 3D flagship restrict compile OOM); v2
        # remains the fallback for layouts v6 rejects
        try:
            return prepare_kernel_ell6(ell, dtype=dtype)
        except Ell4Unsupported:
            return prepare_kernel_ell2(ell, dtype=dtype)

    restrict = tuple(prep_transfer(r) for r in hier.restrict)
    prolong = tuple(prep_transfer(p) for p in hier.prolong)
    return Hierarchy(levels=levels, restrict=restrict, prolong=prolong)


# ---------------------------------------------------------------------------
# smoother-protocol implementations (called from ops/smoothers dispatchers)
# ---------------------------------------------------------------------------


def matvec(op: TpuLevel, x, x_lag):
    if op.kell6 is not None:
        y = spmv_tpu6(op.kell6, x)
    elif op.colored8 is not None:
        y = spmv_tpu8(op.colored8, x)
    else:
        y = spmv_tpu2(op.kell, x)
    if op.has_lagrange:
        y = y + op.lag_col * x_lag
        y_lag = jnp.vdot(op.lag_row, x) + x_lag
    else:
        y_lag = jnp.zeros((), x.dtype)
    return y, y_lag


def bound_eval_neumann(op: TpuLevel, x, b):
    if op.bound_n == 0:
        return x
    y = spmv_tpu2(op.bound_kell, x)[: op.bound_rows.shape[0]]
    safe = jnp.minimum(op.bound_rows, op.n_pad - 1)
    xr = jnp.take(x, safe)
    br = jnp.take(b, safe)
    xb = (br - (y - op.bound_diag * xr)) / op.bound_diag
    return x.at[op.bound_rows].set(xb, mode="drop")


def smooth(op: TpuLevel, x, x_lag, b, b_lag, iters=None):
    iters = op.iters if iters is None else iters
    w = op.omega
    rows2d = op.n_pad // LANES
    x2 = x.reshape(rows2d, LANES)
    x_lag = jnp.asarray(x_lag, x.dtype)  # stable scan-carry dtype
    if op.colored8 is not None:
        b8 = permute_b8(op.colored8, b.reshape(rows2d, LANES))
        sweep = lambda x2, x_lag: sor_sweep_tpu8(op.colored8, x2, x_lag, b8)
    elif op.kell6 is not None:
        r2 = lambda v: v.reshape(rows2d, LANES)
        b2, lagc2 = r2(b), r2(op.lagc3)
        if op.union7 is not None:
            sweep = lambda x2, x_lag: sor_sweep_tpu7(
                op.kell6, op.union7, op.kinvT_sg, x2, x_lag, b2, lagc2
            )
        else:
            sweep = lambda x2, x_lag: sor_sweep_tpu6(
                op.kell6, op.kinvT_sg, x2, x_lag, b2, lagc2
            )
    else:
        b3 = b.reshape(op.dinv3.shape)
        sweep = lambda x2, x_lag: sor_sweep_tpu2(
            op.kell, x2, x_lag, op.dinv3, b3, op.mask3, op.omega3, op.lagc3
        )
    # scan (not a Python loop): the sweep body is traced/lowered ONCE per
    # smooth call instead of `iters` times — measured 318s of lowering on
    # the 38k flagship graph was dominated by repeated Pallas call traces
    def body(carry, _):
        x2, xl = carry
        x2 = sweep(x2, xl)
        x = x2.reshape(-1)
        if op.has_lagrange:
            xl = (1.0 - w) * xl + w * (b_lag - jnp.vdot(op.lag_row, x))
        x = bound_eval_neumann(op, x, b)
        return (x.reshape(rows2d, LANES), xl), None

    (x2, x_lag), _ = jax.lax.scan(body, (x2, x_lag), None, length=iters)
    return x2.reshape(-1), x_lag


def push_inhomog_to_rhs(op: TpuLevel, b):
    if op.cond_n == 0:
        return b
    delta = spmv_tpu2(op.cond_kell, b)[: op.cond_rows.shape[0]]
    safe = jnp.minimum(op.cond_rows, op.n_pad - 1)
    br = jnp.take(b, safe)
    return b.at[op.cond_rows].set(br - delta, mode="drop")
