"""Build-once cache for the 1M synthetic kernel operator + fast measure.

The 1M host-side build (csr+ell 94s, prepare6 305s, oneshotK 36s) makes
kernel iteration painfully slow on the 2-core host; this caches the packed
v6 tables to /tmp/kops_<n>/ as raw .npy and measures from a cold process in
seconds.

  python scripts/kcache.py build [n]
  python scripts/kcache.py measure [n]     # spmv + sweep f32/bf16 + stream
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402

N_DEFAULT = 1_048_576


def cache_dir(n, max_segments=6):
    return f"/tmp/kops_{n}_s{max_segments}"


def build(n, seg_list=(1, 2, 6)):
    import jax.numpy as jnp
    from meshlessmultigridpoisson_tpu.utils.jaxutils import on_cpu

    with on_cpu():
        from meshlessmultigridpoisson_tpu.ops.ell import ell_from_csr
        from meshlessmultigridpoisson_tpu.ops import kernels6 as k6
        from meshlessmultigridpoisson_tpu.ops.kernels4 import build_oneshot_K

        t0 = time.time()
        a = bench.synthetic_banded_csr(n, 70, 512)
        ell = ell_from_csr(a, block_rows=128)
        bench.log(f"csr+ell {time.time()-t0:.0f}s")
        t0 = time.time()
        K = build_oneshot_K(ell, np.full(ell.nrows_pad, 1.4),
                            np.ones(ell.nrows_pad))
        bench.log(f"oneshotK {time.time()-t0:.0f}s")
        x0 = np.random.default_rng(1).standard_normal(ell.nrows_pad)
        from meshlessmultigridpoisson_tpu.ops.ell import spmv as spmv_ref
        yref = np.asarray(spmv_ref(ell, jnp.asarray(x0)))[:4096]

        for ms in seg_list:
            t0 = time.time()
            kell = k6.prepare_kernel_ell6(ell, max_segments=ms)
            k32 = k6.pack_oneshot_K6(kell, K)
            bench.log(f"prepare6 ms={ms}: {time.time()-t0:.0f}s "
                      f"segs={[(s.windows, s.nblocks) for s in kell.segments]}")
            d = cache_dir(n, ms)
            os.makedirs(d, exist_ok=True)
            meta = dict(
                n=n, nrows=kell.nrows, ncols=kell.ncols,
                nrows_pad=kell.nrows_pad,
                segments=[dict(windows=s.windows, nblocks=s.nblocks,
                               block_base=s.block_base)
                          for s in kell.segments],
            )
            json.dump(meta, open(f"{d}/meta.json", "w"))
            np.save(f"{d}/pids.npy", np.asarray(kell.pids))
            np.save(f"{d}/perm.npy", np.asarray(kell.perm))
            for i, s in enumerate(kell.segments):
                np.save(f"{d}/seg{i}_vals.npy", np.asarray(s.vals))
                np.save(f"{d}/seg{i}_lcols.npy", np.asarray(s.lcols))
                np.save(f"{d}/seg{i}_K.npy", np.asarray(k32[i]))
            np.save(f"{d}/x0.npy", x0)
            np.save(f"{d}/yref4096.npy", yref)
            print(f"cached to {d}")


def load(n, max_segments=6):
    import jax.numpy as jnp
    from meshlessmultigridpoisson_tpu.ops import kernels6 as k6

    d = cache_dir(n, max_segments)
    meta = json.load(open(f"{d}/meta.json"))
    segs, Ks = [], []
    for i, sm in enumerate(meta["segments"]):
        segs.append(k6.Segment(
            vals=jnp.asarray(np.load(f"{d}/seg{i}_vals.npy")),
            lcols=jnp.asarray(np.load(f"{d}/seg{i}_lcols.npy")),
            windows=sm["windows"], nblocks=sm["nblocks"],
            block_base=sm["block_base"],
        ))
        Ks.append(jnp.asarray(np.load(f"{d}/seg{i}_K.npy")))
    kell = k6.KernelEll6(
        segments=tuple(segs),
        pids=jnp.asarray(np.load(f"{d}/pids.npy")),
        perm=jnp.asarray(np.load(f"{d}/perm.npy")),
        nrows=meta["nrows"], ncols=meta["ncols"],
        nrows_pad=meta["nrows_pad"],
    )
    x0 = np.load(f"{d}/x0.npy")
    yref = np.load(f"{d}/yref4096.npy")
    return kell, tuple(Ks), x0, yref


def measure(n, seg_list=(1, 2, 6)):
    import jax
    import jax.numpy as jnp
    from meshlessmultigridpoisson_tpu.ops import kernels6 as k6

    dev = jax.devices()[0]
    out = {}
    stream_gb = bench.stream_ceiling()
    out["stream_gb_s"] = stream_gb
    bench.log(f"stream {stream_gb:.0f} GB/s")

    for ms in seg_list:
        if not os.path.exists(cache_dir(n, ms)):
            continue
        kell, k32, x0, yref = load(n, ms)
        tb = kell.table_bytes
        kd = jax.device_put(kell, dev)
        xd = jax.device_put(jnp.asarray(x0, jnp.float32), dev)

        y = np.asarray(jax.jit(
            lambda xx, kk: k6.spmv_tpu6(kk, xx))(xd, kd))[:4096]
        err = np.abs(y - yref).max() / np.abs(yref).max()
        assert err < 1e-4, (ms, err)
        dt = bench.chain_delta(
            lambda xx, kk: k6.spmv_tpu6(kk, xx)[: kell.nrows_pad], xd, kd)
        out[f"s{ms}_spmv"] = dict(
            ms=dt * 1e3, gnnz=n * 70 / dt / 1e9, gb_s=tb / dt / 1e9,
            pct=100 * tb / dt / 1e9 / stream_gb, table_mb=tb / 1e6)
        bench.log(f"[seg{ms}] spmv {dt*1e3:.3f} ms {n*70/dt/1e9:.2f} Gnnz/s "
                  f"{tb/dt/1e9:.0f} GB/s ({100*tb/dt/1e9/stream_gb:.0f}%) "
                  f"table={tb/1e6:.0f}MB")

        nb = kell.nblocks
        b2 = jax.device_put(jnp.asarray(
            np.random.default_rng(2).standard_normal((nb, 128)),
            jnp.float32), dev)
        lagc2 = jax.device_put(jnp.zeros((nb, 128), jnp.float32), dev)
        x2 = xd[: nb * 128].reshape(nb, 128)
        for name, dt_ in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            kv = tuple(kk.astype(dt_) for kk in k32)
            kvd = jax.device_put(kv, dev)
            kb = sum(kk.size * kk.dtype.itemsize for kk in kvd)
            dt = bench.chain_delta(
                lambda xx, kk, kvv, bb: k6.sor_sweep_tpu6(
                    kk, kvv, xx, jnp.zeros((), jnp.float32), bb, lagc2),
                x2, kd, kvd, b2)
            gb = (tb + kb) / dt / 1e9
            out[f"s{ms}_sweep_{name}"] = dict(
                ms=dt * 1e3, gnnz=n * 70 / dt / 1e9, gb_s=gb,
                pct=100 * gb / stream_gb)
            bench.log(f"[seg{ms}] sweep K={name} {dt*1e3:.3f} ms "
                      f"{n*70/dt/1e9:.2f} Gnnz/s {gb:.0f} GB/s "
                      f"({100*gb/stream_gb:.0f}%)")
        del kd, xd, x2, b2, lagc2
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "measure"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else N_DEFAULT
    segs = (tuple(int(s) for s in sys.argv[3].split(","))
            if len(sys.argv) > 3 else (1, 2, 6))
    if cmd == "build":
        build(n, segs)
    else:
        measure(n, segs)
