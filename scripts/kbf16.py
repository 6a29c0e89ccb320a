"""bf16-K fast-sweep + SpMV-falloff experiments (VERDICT r2 weak #1).

Measures, on the real chip, with chained-delta timing (bench.py):
  1. sweep with f32 K vs bf16 K at 1M/k70 (the ~34%-of-bytes lever);
  2. spmv at 262k vs 1M rows (the 81% -> 66% of-stream falloff), plus a
     max_segments sensitivity probe at 1M.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/kbf16.py
"""

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402  (reuse timing harness + synthetic operator)


def build(n, k=70, band=512, max_segments=6):
    import jax.numpy as jnp
    from meshlessmultigridpoisson_tpu.utils.jaxutils import on_cpu

    with on_cpu():
        from meshlessmultigridpoisson_tpu.ops.ell import ell_from_csr
        from meshlessmultigridpoisson_tpu.ops import kernels6 as k6
        from meshlessmultigridpoisson_tpu.ops.kernels4 import build_oneshot_K

        import time
        t0 = time.time()
        a = bench.synthetic_banded_csr(n, k, band)
        ell = ell_from_csr(a, block_rows=128)
        bench.log(f"  csr+ell: {time.time()-t0:.0f}s")
        t0 = time.time()
        kell = k6.prepare_kernel_ell6(ell, max_segments=max_segments)
        bench.log(f"  prepare6: {time.time()-t0:.0f}s")
        t0 = time.time()
        K = build_oneshot_K(ell, np.full(ell.nrows_pad, 1.4),
                            np.ones(ell.nrows_pad))
        bench.log(f"  oneshotK: {time.time()-t0:.0f}s")
        k32 = k6.pack_oneshot_K6(kell, K)
        kbf = k6.pack_oneshot_K6(kell, K, dtype=jnp.bfloat16)
        x0 = np.random.default_rng(1).standard_normal(ell.nrows_pad)
    return ell, kell, k32, kbf, x0


def main():
    import jax
    import jax.numpy as jnp
    from meshlessmultigridpoisson_tpu.ops import kernels6 as k6

    jax.config.update("jax_enable_x64", True)
    dev = jax.devices()[0]
    out = {"device": str(dev)}

    stream_gb = bench.stream_ceiling()
    out["stream_gb_s"] = round(stream_gb, 1)
    bench.log(f"stream ceiling {stream_gb:.0f} GB/s")

    # --- spmv falloff: 262k vs 1M --------------------------------------
    for n in (262_144, 1_048_576):
        ell, kell, k32, kbf, x0 = build(n)
        tb = kell.table_bytes
        kd = jax.device_put(kell, dev)
        xd = jax.device_put(jnp.asarray(x0, jnp.float32), dev)
        dt = bench.chain_delta(
            lambda xx, kk: k6.spmv_tpu6(kk, xx)[: ell.nrows_pad], xd, kd)
        gb = tb / dt / 1e9
        bench.log(f"spmv n={n}: {dt*1e3:.3f} ms {n*70/dt/1e9:.2f} Gnnz/s "
                  f"{gb:.0f} GB/s ({100*gb/stream_gb:.0f}%) "
                  f"segs={[(s.windows, s.nblocks) for s in kell.segments]}")
        out[f"spmv_{n}"] = dict(ms=dt * 1e3, gnnz=n * 70 / dt / 1e9,
                                gb_s=gb, pct=100 * gb / stream_gb)

        # --- sweep f32-K vs bf16-K ------------------------------------
        nb = kell.nblocks
        b2 = jax.device_put(jnp.asarray(
            np.random.default_rng(2).standard_normal((nb, 128)), jnp.float32),
            dev)
        lagc2 = jax.device_put(jnp.zeros((nb, 128), jnp.float32), dev)
        x2 = xd[: nb * 128].reshape(nb, 128)
        for name, kv in (("f32", k32), ("bf16", kbf)):
            kvd = jax.device_put(kv, dev)
            kb = sum(kk.size * kk.dtype.itemsize for kk in kvd)
            dt = bench.chain_delta(
                lambda xx, kk, kvv, bb: k6.sor_sweep_tpu6(
                    kk, kvv, xx, jnp.zeros((), jnp.float32), bb, lagc2),
                x2, kd, kvd, b2)
            gb = (tb + kb) / dt / 1e9
            bench.log(f"sweep n={n} K={name}: {dt*1e3:.3f} ms "
                      f"{n*70/dt/1e9:.2f} Gnnz/s {gb:.0f} GB/s "
                      f"({100*gb/stream_gb:.0f}%)")
            out[f"sweep_{n}_{name}"] = dict(
                ms=dt * 1e3, gnnz=n * 70 / dt / 1e9, gb_s=gb,
                pct=100 * gb / stream_gb)
            # numerics: one sweep, compare fixed-point-preserving update
            if name == "bf16":
                y32 = np.asarray(k6.sor_sweep_tpu6(
                    kd, jax.device_put(k32, dev), x2,
                    jnp.zeros((), jnp.float32), b2, lagc2))
                ybf = np.asarray(k6.sor_sweep_tpu6(
                    kd, kvd, x2, jnp.zeros((), jnp.float32), b2, lagc2))
                rel = np.abs(ybf - y32).max() / np.abs(y32).max()
                bench.log(f"  bf16-vs-f32 sweep output rel diff: {rel:.2e}")
                out[f"sweep_{n}_bf16_reldiff"] = float(rel)
        del kd, xd, x2, b2, lagc2

    # --- segment-count sensitivity at 1M --------------------------------
    for ms in (1,):
        ell, kell, k32, kbf, x0 = build(1_048_576, max_segments=ms)
        tb = kell.table_bytes
        kd = jax.device_put(kell, dev)
        xd = jax.device_put(jnp.asarray(x0, jnp.float32), dev)
        dt = bench.chain_delta(
            lambda xx, kk: k6.spmv_tpu6(kk, xx)[: ell.nrows_pad], xd, kd)
        gb = tb / dt / 1e9
        bench.log(f"spmv 1M max_segments={ms}: {dt*1e3:.3f} ms "
                  f"{1048576*70/dt/1e9:.2f} Gnnz/s {gb:.0f} GB/s "
                  f"({100*gb/stream_gb:.0f}%) table={tb/1e6:.0f}MB "
                  f"segs={[(s.windows, s.nblocks) for s in kell.segments]}")
        out[f"spmv_1M_seg{ms}"] = dict(ms_=dt * 1e3, gb_s=gb,
                                       table_mb=tb / 1e6)
        del kd, xd

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
