"""Per-level sweep-kernel probe on the 133k+ flagship hierarchy (cached).

Round-4's flagship fine level silently ran the v2 kernels because
prepare_kernel_ell6 rejected its 73-patch outlier block (VERDICT r4 weak
#1).  Round 5 widened the v6 gmax bank bound and added the v8 wide-scratch
tier (ops/kernels8.py prepare_colored_sweep max_slots_wide); this probe
loads the cached flagship hierarchy (scripts/solve150k_artifact.py
--cache), preps every level, verifies the fine-level v8 sweep against the
colored-order oracle ON DEVICE, and chain-delta-times the v6/v7 baseline
vs v8 per level.

Run: PYTHONPATH=/root/repo python scripts/k8prod150k.py [--cache PATH]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache", default="/tmp/sc150k.npz")
    ap.add_argument("--out", default="results/k8prod150k_r5.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)
    from meshlessmultigridpoisson_tpu.utils.jaxutils import on_cpu

    rows = []
    with on_cpu():
        import warnings

        warnings.filterwarnings("ignore")
        from meshlessmultigridpoisson_tpu.io.bundle import _load_pytree
        from meshlessmultigridpoisson_tpu.ops import kernels6 as k6
        from meshlessmultigridpoisson_tpu.ops import kernels8 as k8
        from meshlessmultigridpoisson_tpu.ops.kernels4 import build_oneshot_K

        t0 = time.perf_counter()
        hier = _load_pytree(args.cache)["hierarchy"]
        bench.log(f"cache load {time.perf_counter() - t0:.0f}s")
        levels = []
        for li, op in enumerate(hier.levels):
            kell = k6.prepare_kernel_ell6(op.A)
            nb = kell.nblocks
            kinvT = build_oneshot_K(
                op.A, op.omega * np.asarray(op.omega_scale),
                np.asarray(op.smooth_mask))
            kinv_sg = k6.pack_oneshot_K6(kell, kinvT)
            try:
                union = k6.union_sweep_tables(kell)
            except k6.Ell4Unsupported:
                union = None
            lagc2 = np.zeros(nb * 128, np.float32)
            lagc2[: op.lag_col.shape[0]] = np.asarray(op.lag_col, np.float32)
            lagc2 = lagc2.reshape(nb, 128)
            try:
                c8 = k8.prepare_colored_sweep(kell, kinvT, lagc2)
                info = (f"mb={c8.mb} g8max={c8.g8max} ncolors={c8.ncolors} "
                        f"exp={c8.expansion:.2f}")
            except k6.Ell4Unsupported as e:
                c8, info = None, f"REJECT ({e})"
            bench.log(f"L{li} n={op.n} nb={nb} gmax={kell.gmax}: {info}")
            levels.append((li, op, kell, kinvT, kinv_sg, union, c8, lagc2))

    dev = jax.devices()[0]
    zl = jnp.zeros((), jnp.float32)
    for li, op, kell, kinvT, kinv_sg, union, c8, lagc2_np in levels:
        nb = kell.nblocks
        nnz = int(np.count_nonzero(np.asarray(op.A.vals)))
        rng = np.random.default_rng(li)
        x2 = jax.device_put(jnp.asarray(
            rng.standard_normal((nb, 128)), jnp.float32), dev)
        b2 = jax.device_put(jnp.asarray(
            rng.standard_normal((nb, 128)), jnp.float32), dev)
        lagc2 = jax.device_put(jnp.asarray(lagc2_np), dev)
        kd = jax.device_put(kell, dev)
        kvd = jax.device_put(kinv_sg, dev)
        kreps = 16 if nb >= 256 else 256
        if union is not None:
            und = jax.device_put(union, dev)
            dt7 = bench.chain_delta(
                lambda xx, kk, un, kv, bb: k6.sor_sweep_tpu7(
                    kk, un, kv, xx, zl, bb, lagc2),
                x2, kd, und, kvd, b2, k=kreps)
            base_kind = "v7"
        else:
            dt7 = bench.chain_delta(
                lambda xx, kk, kv, bb: k6.sor_sweep_tpu6(
                    kk, kv, xx, zl, bb, lagc2),
                x2, kd, kvd, b2, k=kreps)
            base_kind = "v6"
        dt_mv = bench.chain_delta(
            lambda xx, kk: k6.spmv_tpu6(kk, xx.reshape(-1))[
                : nb * 128].reshape(nb, 128), x2, kd, k=kreps)
        row = dict(level=li, n=op.n, nb=nb, nnz=nnz, base_kind=base_kind,
                   gmax=kell.gmax,
                   spmv_ms=round(dt_mv * 1e3, 4),
                   spmv_gnnz_s=round(nnz / dt_mv / 1e9, 2),
                   v7_ms=round(dt7 * 1e3, 4),
                   v7_gnnz_s=round(nnz / dt7 / 1e9, 2))
        if c8 is not None:
            c8d = jax.device_put(c8, dev)
            out8 = np.asarray(jax.jit(
                lambda xx, cc, bb: k8.sor_sweep_tpu8(
                    cc, xx, zl, k8.permute_b8(cc, bb)))(x2, c8d, b2))
            sys.path.insert(0, "/root/repo/tests")
            from test_kernels8 import _colored_oracle

            ref = _colored_oracle(op.A, kinvT, c8.block_order(),
                                  np.asarray(x2), 0.0, np.asarray(b2),
                                  lagc2_np)
            err = np.abs(out8.reshape(-1) - ref).max() / np.abs(ref).max()
            assert err < 1e-4, f"L{li} colored mismatch {err:.2e}"
            dt8 = bench.chain_delta(
                lambda xx, cc, bb: k8.sor_sweep_tpu8(
                    cc, xx, zl, k8.permute_b8(cc, bb)),
                x2, c8d, b2, k=kreps)
            row.update(v8_ms=round(dt8 * 1e3, 4),
                       v8_gnnz_s=round(nnz / dt8 / 1e9, 2),
                       mb=c8.mb, g8max=c8.g8max, ncolors=c8.ncolors,
                       expansion=round(c8.expansion, 3),
                       oracle_rel_err=float(err),
                       speedup=round(dt7 / dt8, 2))
        bench.log(json.dumps(row))
        rows.append(row)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    print(json.dumps(rows), flush=True)


if __name__ == "__main__":
    main()
