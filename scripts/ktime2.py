"""Chained (tunnel-overhead-free) timing of the production kernels.

Usage: python scripts/ktime2.py [n]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from bench import synthetic_banded_csr  # noqa: E402
from meshlessmultigridpoisson_tpu.ops.ell import ell_from_csr  # noqa: E402
from meshlessmultigridpoisson_tpu.ops import kernels4 as k4  # noqa: E402
from meshlessmultigridpoisson_tpu.ops.kernels import (  # noqa: E402
    prepare_kernel_ell2, sor_sweep_tpu2, spmv_tpu2, LANES,
)


def med_time(f, *args, reps=5):
    np.asarray(jax.tree_util.tree_leaves(f(*args))[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(f(*args))[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def chain(op, k):
    def f(x, *sa):
        y = op(x, *sa)
        for _ in range(k - 1):
            y = op(y * 1.0000001, *sa)
        return y.reshape(-1)[:128]
    return jax.jit(f)


def report(name, op, x0, *sa, k=16, work_bytes=0, nnz=0):
    t1 = med_time(chain(op, 1), x0, *sa)
    tk = med_time(chain(op, k), x0, *sa)
    dt = max(tk - t1, 1e-9) / (k - 1)
    print(f"{name:24s}: {dt*1e3:8.3f} ms  {nnz/dt/1e9:7.2f} Gnnz/s  "
          f"{work_bytes/dt/1e9:7.1f} GB/s(table)   (1-call {t1*1e3:.1f} ms)",
          flush=True)
    return dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
    k, band = 70, 512
    print("device:", jax.devices()[0], f" n={n} k={k}", flush=True)
    a = synthetic_banded_csr(n, k, band)
    ell = ell_from_csr(a, block_rows=128)
    nnz = n * k

    # ---- v4 spmv ----
    kell = k4.prepare_kernel_ell4(ell)
    tb4 = kell.nblocks * kell.tiles_per_block * LANES * 8
    print(f"v4: W={kell.windows} T={kell.tiles_per_block} mb={kell.mb} "
          f"nb={kell.nblocks} pad={kell.tiles_per_block*128/8/k:.2f}x", flush=True)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(ell.nrows_pad),
                    jnp.float32)
    report("v4 spmv", lambda xx, kk: k4.spmv_tpu4(kk, xx)[: ell.nrows_pad],
           x, kell, work_bytes=tb4, nnz=nnz)

    # ---- v5 sweep ----
    diag = np.asarray(ell.diag)
    omega = np.full(ell.nrows_pad, 1.4)
    smask = np.ones(ell.nrows_pad)
    kinvT = jnp.asarray(k4.build_oneshot_K(ell, omega, smask), jnp.float32)
    nb = kell.nblocks
    b2 = jnp.asarray(
        np.random.default_rng(2).standard_normal((nb, LANES)), jnp.float32)
    lagc2 = jnp.zeros((nb, LANES), jnp.float32)
    x2 = x.reshape(nb, LANES)
    tb5 = tb4 + nb * LANES * LANES * 4  # + kinvT
    report("v5 sweep",
           lambda xx, kk, kv, bb: k4.sor_sweep_tpu5(
               kk, kv, xx, jnp.zeros((), jnp.float32), bb, lagc2),
           x2, kell, kinvT, b2, work_bytes=tb5, nnz=nnz)

    # ---- v6 bucketed ----
    from meshlessmultigridpoisson_tpu.ops import kernels6 as k6
    from meshlessmultigridpoisson_tpu.ops.ell import spmv as spmv_oracle
    kell6 = k6.prepare_kernel_ell6(ell)
    tb6 = kell6.table_bytes
    print(f"v6: segments={[(s.windows, s.nblocks) for s in kell6.segments]} "
          f"bytes={tb6/1e6:.0f}MB vs v4 {tb4/1e6:.0f}MB "
          f"pad={tb6/(nnz*6):.2f}x(6B)", flush=True)
    y6 = np.asarray(jax.jit(
        lambda xx, kk: k6.spmv_tpu6(kk, xx))(x, kell6))[:4096]
    import jax.numpy as _jnp
    yref = np.asarray(spmv_oracle(ell.astype(_jnp.float64),
                                  x.astype(_jnp.float64)))[:4096]
    err = np.abs(y6 - yref).max() / max(np.abs(yref).max(), 1e-30)
    print(f"v6 spmv rel err vs f64 oracle: {err:.2e}", flush=True)
    assert err < 2e-5, "v6 spmv mismatch"
    report("v6 spmv", lambda xx, kk: k6.spmv_tpu6(kk, xx),
           x, kell6, work_bytes=tb6, nnz=nnz)

    kinvT6 = k6.pack_oneshot_K6(kell6, np.asarray(kinvT))
    tb6s = tb6 + sum(kk.size * 4 for kk in kinvT6)
    report("v6 sweep",
           lambda xx, kk, kv, bb: k6.sor_sweep_tpu6(
               kk, kv, xx, jnp.zeros((), jnp.float32), bb, lagc2),
           x2, kell6, kinvT6, b2, work_bytes=tb6s, nnz=nnz)
    kinvT6b = k6.pack_oneshot_K6(kell6, np.asarray(kinvT), dtype=jnp.bfloat16)
    tb6b = tb6 + sum(kk.size * 2 for kk in kinvT6b)
    report("v6 sweep fast",
           lambda xx, kk, kv, bb: k6.sor_sweep_tpu6(
               kk, kv, xx, jnp.zeros((), jnp.float32), bb, lagc2),
           x2, kell6, kinvT6b, b2, work_bytes=tb6b, nnz=nnz)

    # ---- v2 for comparison ----
    kell2 = prepare_kernel_ell2(ell)
    tb2 = kell2.vals_flat.size * 4 + kell2.lcols_flat.size * 4
    report("v2 spmv", lambda xx, kk: spmv_tpu2(kk, xx)[: ell.nrows_pad],
           x, kell2, work_bytes=tb2, nnz=nnz)


if __name__ == "__main__":
    main()
