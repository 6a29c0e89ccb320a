"""Benchmark harness (driver contract: prints ONE JSON line to stdout).

Measures the framework's hot kernel — the fused windowed-ELL smoother sweep
(the inner loop of every solve, reference grid.cpp:104-146) — on a
1M-point, 70-wide RBF-FD-like operator (BASELINE.json config 3 scale) on
the available accelerator, plus the SpMV kernel and the naive XLA-gather
SpMV baseline (what a direct port of the reference's CSR loop lowers to on
TPU).

vs_baseline = smoother throughput / XLA-gather-SpMV throughput on the same
operator (per-nnz), i.e. the speedup of the TPU-native design over the
naive port.  All other diagnostics go to stderr.
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def synthetic_banded_csr(n, k, band, seed=0):
    """RBF-FD-like sparsity: k nnz/row within +-band after RCM ordering."""
    import scipy.sparse as sp

    rng = np.random.default_rng(seed)
    offs = rng.integers(-band, band + 1, size=(n, k - 1))
    cols = np.clip(np.arange(n)[:, None] + offs, 0, n - 1)
    cols = np.concatenate([np.arange(n)[:, None], cols], axis=1)
    vals = rng.standard_normal((n, k))
    vals[:, 0] = k + 1.0
    rows = np.repeat(np.arange(n), k)
    a = sp.coo_matrix((vals.ravel(), (rows, cols.ravel())), shape=(n, n)).tocsr()
    a.sum_duplicates()
    return a


def timeit(f, *args, reps=20):
    """Median-of-three timing; every rep fully materializes its result
    (np.asarray forces a device fetch — block_until_ready alone has been
    observed not to fence execution through the axon tunnel)."""
    y = f(*args)
    jax_block(y)
    np.asarray(jax_leaf(y))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            y = f(*args)
        jax_block(y)
        np.asarray(jax_leaf(y))
        times.append((time.perf_counter() - t0) / reps)
    return sorted(times)[1]


def jax_leaf(y):
    import jax

    return jax.tree_util.tree_leaves(y)[0]


def jax_block(y):
    import jax

    jax.tree_util.tree_map(
        lambda a: a.block_until_ready() if hasattr(a, "block_until_ready") else a,
        y,
    )


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)
    from meshlessmultigridpoisson_tpu.utils.jaxutils import on_cpu

    # near-diagonal band mimics the KD-tile patch locality of real ordered
    # operators (measured G ~ 9-12 patches/block independent of N)
    n, k, band = 1_048_576, 70, 512
    log(f"building synthetic operator n={n} k={k} band={band}")
    with on_cpu():
        from meshlessmultigridpoisson_tpu.ops.ell import ell_from_csr, global_cols
        from meshlessmultigridpoisson_tpu.ops.kernels import (
            prepare_kernel_ell2 as prepare_kernel_ell,
            spmv_tpu2 as spmv_tpu,
            sor_sweep_tpu2 as sor_sweep_tpu,
            LANES,
        )

        a = synthetic_banded_csr(n, k, band)
        ell = ell_from_csr(a, block_rows=128)
        kell = prepare_kernel_ell(ell)
        x0 = np.random.default_rng(1).standard_normal(ell.nrows_pad)
        diag = np.asarray(ell.diag)

    dev = jax.devices()[0]
    log(f"device: {dev}; kp={kell.width} patches/block={kell.num_patches}")
    kd = jax.device_put(kell, dev)
    xd = jax.device_put(jnp.asarray(x0, jnp.float32), dev)
    nnz = n * k  # logical nnz (pad excluded)

    # --- Pallas SpMV (with correctness spot check) ---
    spmv_j = jax.jit(spmv_tpu)
    y = np.asarray(spmv_j(kd, xd))
    with on_cpu():
        from meshlessmultigridpoisson_tpu.ops.ell import spmv as spmv_ref

        yref = np.asarray(spmv_ref(ell, jnp.asarray(x0)))[: 4096]
    err = np.abs(y[:4096] - yref).max() / np.abs(yref).max()
    log(f"spmv spot-check rel err vs f64: {err:.2e}")
    assert err < 1e-4, "TPU SpMV kernel mismatch"
    dt_spmv = timeit(spmv_j, kd, xd)
    log(f"pallas spmv: {dt_spmv*1e3:.3f} ms  {nnz/dt_spmv/1e9:.2f} Gnnz/s")

    # --- Pallas SOR sweep (the hot solver op) ---
    nb = kell.nrows_pad // kell.block_rows
    r3 = lambda v: jax.device_put(
        jnp.asarray(
            np.asarray(v, np.float32).reshape(nb, kell.block_rows // LANES, LANES)
        ),
        dev,
    )
    dinv3 = r3(1.0 / diag)
    b3 = r3(np.random.default_rng(2).standard_normal(kell.nrows_pad))
    mask3 = r3(np.ones(kell.nrows_pad))
    omega3 = r3(np.full(kell.nrows_pad, 1.4))
    lagc3 = r3(np.zeros(kell.nrows_pad))
    xr = kell.x_rows
    x2 = jnp.zeros((xr, LANES), jnp.float32)
    x2 = x2.at[:xr].set(xd[: xr * LANES].reshape(xr, LANES))
    x2 = jax.device_put(x2, dev)

    sweep_j = jax.jit(
        lambda kk, xx, dd, bb, mm, ww, ll: sor_sweep_tpu(
            kk, xx, jnp.zeros((), jnp.float32), dd, bb, mm, ww, ll
        )
    )
    dt_sweep = timeit(sweep_j, kd, x2, dinv3, b3, mask3, omega3, lagc3)
    log(f"pallas sweep: {dt_sweep*1e3:.3f} ms  {nnz/dt_sweep/1e9:.2f} Gnnz/s")

    # --- naive XLA gather SpMV baseline (direct port of the CSR loop) ---
    with on_cpu():
        gc = jnp.asarray(np.asarray(global_cols(ell)))
        vals32 = jnp.asarray(np.asarray(ell.vals), jnp.float32)
    n_base = 131_072  # subsample rows: per-nnz cost is row-count independent
    gcd = jax.device_put(gc[:n_base], dev)
    vd = jax.device_put(vals32[:n_base], dev)

    @jax.jit
    def xla_spmv(v, c, x):
        return jnp.sum(v * jnp.take(x, c, axis=0), axis=1)

    dt_xla = timeit(xla_spmv, vd, gcd, xd, reps=3)
    xla_nnz_s = n_base * ell.width / dt_xla
    log(f"xla-gather spmv: {dt_xla*1e3:.3f} ms ({n_base} rows) "
        f"{xla_nnz_s/1e9:.3f} Gnnz/s")

    sweep_nnz_s = nnz / dt_sweep
    result = {
        "metric": "fused_sor_sweep_throughput_1M_k70",
        "value": round(sweep_nnz_s / 1e9, 3),
        "unit": "Gnnz/s",
        "vs_baseline": round(sweep_nnz_s / xla_nnz_s, 1),
        "extra": {
            "spmv_gnnz_s": round(nnz / dt_spmv / 1e9, 3),
            "xla_gather_spmv_gnnz_s": round(xla_nnz_s / 1e9, 3),
            "device": str(dev),
            "n": n,
            "k": k,
        },
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
