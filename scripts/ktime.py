"""On-device kernel timing: fori_loop-iterated pallas calls inside one jit,
so tunnel RPC/fetch noise amortizes away.  Usage:

    python scripts/ktime.py [n] [iters]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)
from meshlessmultigridpoisson_tpu.utils.jaxutils import on_cpu


def devloop_time(step, x0, iters, *, label, nnz, consts=()):
    """Median time/iter of x -> step(x, *consts), chained on device.

    ``consts`` are passed as jit ARGUMENTS (not closed over) so large
    operator tables ship to the device as buffers, not as HLO literals —
    closure constants get inlined into the compile payload and can
    overflow the remote-compile request limit.
    """

    @jax.jit
    def run(x, *cs):
        return jax.lax.fori_loop(0, iters, lambda i, xx: step(xx, *cs), x)

    y = run(x0, *consts)
    jax.block_until_ready(y)
    float(np.asarray(jax.tree_util.tree_leaves(y)[0]).ravel()[0])  # fence
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        y = run(x0, *consts)
        jax.block_until_ready(y)
        float(np.asarray(jax.tree_util.tree_leaves(y)[0]).ravel()[0])
        ts.append((time.perf_counter() - t0) / iters)
    dt = sorted(ts)[1]
    print(f"{label}: {dt*1e3:.3f} ms/iter  {nnz/dt/1e9:.2f} Gnnz/s", flush=True)
    return dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    k = 70
    with on_cpu():
        from scripts.realsparsity import real_pattern_csr
        from meshlessmultigridpoisson_tpu.ops.ell import ell_from_csr
        from meshlessmultigridpoisson_tpu.ops import kernels as K

        import os
        import scipy.sparse as sp

        cache = f"/tmp/realpat_{n}.npz"
        if os.path.exists(cache):
            d = np.load(cache)
            a = sp.csr_matrix((d["data"], d["indices"], d["indptr"]),
                              shape=tuple(d["shape"]))
            print("loaded cached pattern", flush=True)
        else:
            print("building real pattern...", flush=True)
            a = real_pattern_csr(n)
            np.savez(cache, data=a.data, indices=a.indices, indptr=a.indptr,
                     shape=np.asarray(a.shape))
        n = a.shape[0]
        nnz = n * k
        x0 = np.random.default_rng(1).standard_normal(n).astype(np.float32)

    dev = jax.devices()[0]
    for br in (128, 256):
        with on_cpu():
            ell = ell_from_csr(a, block_rows=br)
            kell = K.prepare_kernel_ell2(ell)
        kd = jax.device_put(kell, dev)
        print(f"br={br} G={kell.num_patches} kp={kell.width}", flush=True)

        xd = jax.device_put(jnp.asarray(x0), dev)
        np_ = kell.nrows_pad

        def spmv_step(x, kd, n=n):
            y = K.spmv_tpu2(kd, x)
            return y[:n]

        devloop_time(spmv_step, xd, iters, label=f"  spmv v2 (br={br})",
                     nnz=nnz, consts=(kd,))

        # sweep
        xr = kell.x_rows
        x2 = jnp.zeros((xr, 128), jnp.float32)
        nb = np_ // br
        r3 = lambda v: jnp.asarray(
            np.asarray(v, np.float32).reshape(nb, br // 128, 128))
        with on_cpu():
            dinv3 = r3(1.0 / np.asarray(ell.diag))
            b3 = r3(np.random.default_rng(2).standard_normal(np_))
            m3 = r3(np.ones(np_))
            w3 = r3(np.full(np_, 1.4))
            l3 = r3(np.zeros(np_))
        dinv3, b3, m3, w3, l3 = jax.device_put((dinv3, b3, m3, w3, l3), dev)
        x2 = jax.device_put(x2, dev)

        def sweep_step(xx, kd, *a):
            return K.sor_sweep_tpu2(kd, xx, jnp.zeros((), jnp.float32), *a)

        devloop_time(sweep_step, x2, iters, label=f"  sweep v2 (br={br})",
                     nnz=nnz, consts=(kd, dinv3, b3, m3, w3, l3))

        if br != 128:
            continue
        # ---- v4 (window-aligned single-pass gather + MXU in-block GS) ----
        from meshlessmultigridpoisson_tpu.ops import kernels4 as K4

        with on_cpu():
            k4 = K4.prepare_kernel_ell4(ell)
            k4s = K4.prepare_kernel_ell4(ell, split_inblock=True)
        print(f"  v4: spmv W={k4.windows} sweep W={k4s.windows} mb={k4.mb}",
              flush=True)
        k4d, k4sd = jax.device_put((k4, k4s), dev)

        def spmv4_step(x, kd, n=n):
            return K4.spmv_tpu4(kd, x)[:n]

        devloop_time(spmv4_step, xd, iters, label="  spmv v4", nnz=nnz,
                     consts=(k4d,))

        nb128 = np_ // 128
        r2 = lambda v: jnp.asarray(
            np.asarray(v, np.float32).reshape(nb128, 128))
        with on_cpu():
            dinv2 = r2(1.0 / np.asarray(ell.diag))
            b2v = r2(np.random.default_rng(2).standard_normal(np_))
            m2 = r2(np.ones(np_))
            w2 = r2(np.full(np_, 1.4))
            l2 = r2(np.zeros(np_))
        a2 = jax.device_put((dinv2, b2v, m2, w2, l2), dev)
        x2b = jax.device_put(jnp.zeros((nb128, 128), jnp.float32), dev)

        def sweep4_step(xx, kd, *a):
            return K4.sor_sweep_tpu4(kd, xx, jnp.zeros((), jnp.float32), *a)

        devloop_time(sweep4_step, x2b, iters, label="  sweep v4", nnz=nnz,
                     consts=(k4sd,) + a2)

        with on_cpu():
            kinvT = K4.build_oneshot_K(
                ell, np.full(np_, 1.4), np.ones(np_))
        kinvT_d = jax.device_put(jnp.asarray(kinvT, jnp.float32), dev)

        def sweep5_step(xx, kd, kT, bb, ll):
            return K4.sor_sweep_tpu5(kd, kT, xx, jnp.zeros((), jnp.float32),
                                     bb, ll)

        devloop_time(sweep5_step, x2b, iters, label="  sweep v5", nnz=nnz,
                     consts=(k4d, kinvT_d, a2[1], a2[4]))


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
