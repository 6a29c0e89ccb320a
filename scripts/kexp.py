"""Kernel perf experiments: v2 vs v3 SpMV, block size, class size."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_enable_x64", True)
from meshlessmultigridpoisson_tpu.utils.jaxutils import on_cpu


def timeit(f, *args, reps=20):
    y = f(*args)
    jax.block_until_ready(y)
    np.asarray(jax.tree_util.tree_leaves(y)[0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            y = f(*args)
        jax.block_until_ready(y)
        np.asarray(jax.tree_util.tree_leaves(y)[0])
        ts.append((time.perf_counter() - t0) / reps)
    return sorted(ts)[1]


def synthetic_banded_csr(n, k, band, seed=0):
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


def main():
    n, k, band = 1_048_576, 70, 512
    nnz = n * k
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    with on_cpu():
        from meshlessmultigridpoisson_tpu.ops.ell import ell_from_csr
        from meshlessmultigridpoisson_tpu.ops import kernels as K
        a = synthetic_banded_csr(n, k, band)
        x0 = np.random.default_rng(1).standard_normal(n)

    for br in (128, 256):
        with on_cpu():
            ell = ell_from_csr(a, block_rows=br)
            kell2 = K.prepare_kernel_ell2(ell)
        kd = jax.device_put(kell2, dev)
        xd = jax.device_put(jnp.asarray(x0, jnp.float32), dev)
        print(f"br={br} G={kell2.num_patches} kp={kell2.width}", flush=True)
        for name, fn in (("v2", K.spmv_tpu2), ("v3", K.spmv_tpu3)):
            try:
                j = jax.jit(fn)
                y = np.asarray(j(kd, xd))
                dt = timeit(j, kd, xd)
                print(f"  spmv {name}: {dt*1e3:.2f} ms  {nnz/dt/1e9:.2f} Gnnz/s",
                      flush=True)
            except Exception as e:
                print(f"  spmv {name}: FAIL {type(e).__name__}: {e}", flush=True)
        sys.stdout.flush()


if __name__ == "__main__":
    main()
