"""v8 colored-sweep TPU measurement (VERDICT r3 next #2).

Builds the bench.py 1M/k70 synthetic operator, prepares the colored
program-order tables, verifies one sweep on device against the numpy
colored-order oracle, then chain-delta-times:

  v7 exact (storage order)  — round-3 production number (~12.4 Gnnz/s)
  v8 colored, f32 K
  v8 colored, bf16 K        — the fast-K production candidate

Run: PYTHONPATH=/root/repo python scripts/k8probe.py [n_rows]
"""

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)
    from meshlessmultigridpoisson_tpu.utils.jaxutils import on_cpu

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
    k, band = 70, 512
    bench.log(f"building synthetic operator n={n} k={k} band={band}")
    with on_cpu():
        from meshlessmultigridpoisson_tpu.ops.ell import ell_from_csr, global_cols
        from meshlessmultigridpoisson_tpu.ops import kernels6 as k6
        from meshlessmultigridpoisson_tpu.ops import kernels8 as k8
        from meshlessmultigridpoisson_tpu.ops.kernels4 import build_oneshot_K

        a = bench.synthetic_banded_csr(n, k, band)
        ell = ell_from_csr(a, block_rows=128)
        kell = k6.prepare_kernel_ell6(ell)
        kinvT = build_oneshot_K(ell, np.full(ell.nrows_pad, 1.4),
                                np.ones(ell.nrows_pad))
        kinv_sg = k6.pack_oneshot_K6(kell, kinvT)
        union = k6.union_sweep_tables(kell)
        nb = kell.nblocks
        lagc2_np = np.zeros((nb, 128), np.float32)
        import time
        t0 = time.perf_counter()
        c8 = k8.prepare_colored_sweep(kell, kinvT, lagc2_np)
        c8_bf = k8.prepare_colored_sweep(kell, kinvT, lagc2_np,
                                         k_dtype=jnp.bfloat16)
        t_prep = time.perf_counter() - t0
        bench.log(f"colored prepare: {t_prep:.1f}s  ncolors={c8.ncolors} "
                  f"nprog={c8.nprog} g8max={c8.g8max} "
                  f"expansion={c8.expansion:.3f} (v7 g8max={union.g8max})")
        x0 = np.random.default_rng(1).standard_normal(ell.nrows_pad)
        b0 = np.random.default_rng(2).standard_normal((nb, 128))

    dev = jax.devices()[0]
    nnz = n * k
    tb = kell.table_bytes
    kb = sum(kk.size * kk.dtype.itemsize for kk in kinv_sg)
    kd = jax.device_put(kell, dev)
    und = jax.device_put(union, dev)
    kvd = jax.device_put(kinv_sg, dev)
    c8d = jax.device_put(c8, dev)
    c8bfd = jax.device_put(c8_bf, dev)
    x2 = jax.device_put(jnp.asarray(x0[: nb * 128].reshape(nb, 128),
                                    jnp.float32), dev)
    b2 = jax.device_put(jnp.asarray(b0, jnp.float32), dev)
    lagc2 = jax.device_put(jnp.asarray(lagc2_np), dev)
    zl = jnp.zeros((), jnp.float32)

    # --- on-device correctness: one v8 sweep vs the colored-order oracle ---
    from tests.test_kernels8 import _colored_oracle  # noqa: E402

    out8 = np.asarray(jax.jit(
        lambda xx, cc, bb: k8.sor_sweep_tpu8(cc, xx, zl, k8.permute_b8(cc, bb))
    )(x2, c8d, b2))
    ref = _colored_oracle(ell, kinvT, c8.block_order(), np.asarray(x2),
                          0.0, np.asarray(b2), lagc2_np)
    err = np.abs(out8.reshape(-1) - ref).max() / np.abs(ref).max()
    bench.log(f"v8 on-device sweep vs colored oracle: rel err {err:.2e}")
    assert err < 1e-4, "colored sweep mismatch on device"

    # --- timings ---
    dt7 = bench.chain_delta(
        lambda xx, kk, un, kv, bb: k6.sor_sweep_tpu7(
            kk, un, kv, xx, zl, bb, lagc2),
        x2, kd, und, kvd, b2)
    bench.log(f"v7 exact:      {dt7*1e3:.3f} ms  {nnz/dt7/1e9:.2f} Gnnz/s  "
              f"{(tb+kb)/dt7/1e9:.0f} GB/s")

    dt8 = bench.chain_delta(
        lambda xx, cc, bb: k8.sor_sweep_tpu8(cc, xx, zl, k8.permute_b8(cc, bb)),
        x2, c8d, b2)
    bench.log(f"v8 colored:    {dt8*1e3:.3f} ms  {nnz/dt8/1e9:.2f} Gnnz/s  "
              f"{(tb+kb)/dt8/1e9:.0f} GB/s")

    kb_bf = kb // 2
    dt8bf = bench.chain_delta(
        lambda xx, cc, bb: k8.sor_sweep_tpu8(cc, xx, zl, k8.permute_b8(cc, bb)),
        x2, c8bfd, b2)
    bench.log(f"v8 bf16-K:     {dt8bf*1e3:.3f} ms  {nnz/dt8bf/1e9:.2f} Gnnz/s  "
              f"{(tb+kb_bf)/dt8bf/1e9:.0f} GB/s")

    print(json.dumps({
        "n": n, "k": k, "nnz": nnz,
        "ncolors": c8.ncolors, "nprog": c8.nprog, "g8max": c8.g8max,
        "expansion": round(c8.expansion, 4),
        "v7_ms": round(dt7 * 1e3, 3), "v7_gnnz_s": round(nnz / dt7 / 1e9, 2),
        "v8_ms": round(dt8 * 1e3, 3), "v8_gnnz_s": round(nnz / dt8 / 1e9, 2),
        "v8bf_ms": round(dt8bf * 1e3, 3),
        "v8bf_gnnz_s": round(nnz / dt8bf / 1e9, 2),
        "oracle_rel_err": float(err),
    }), flush=True)


if __name__ == "__main__":
    main()
