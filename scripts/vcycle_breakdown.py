"""Where does a real V-cycle's wall time go, per level and per phase?

VERDICT r4 weak #8/#9: per-kernel profiles exist, but nothing shows how a
flagship-scale cycle's wall time splits across fine sweeps, the coarse
chain, transfers, residuals, and host/dispatch overhead.  This script
loads the flagship setup cache, builds the TPU hierarchy, and times ON
DEVICE with the chained-delta harness:

  * per level: one smoother application (iters sweeps) and one residual
    (matvec + subtract), the two per-level phases of mg/vcycle.v_cycle;
  * per transfer: restriction and prolongation SpMVs;
  * the whole jitted v_cycle, and one inner BiCGStab iteration's
    surroundings (the f64 outer residual of the mixed solver).

The modeled cycle (sum of parts, weighted by the schedule: descend
smooth+residual+restrict per level, coarsest double smooth, ascend
prolong+smooth) is compared against the measured whole-cycle time — the
gap is scheduling/dispatch/fusion effects invisible to per-kernel timing.

Run: PYTHONPATH=/root/repo python scripts/vcycle_breakdown.py [--cache ..]
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
    ap.add_argument("--cache", default="/tmp/sc170k.npz")
    ap.add_argument("--out", default="results/vcycle_breakdown_r5.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)
    from meshlessmultigridpoisson_tpu.io.bundle import _load_pytree
    from meshlessmultigridpoisson_tpu.mg import mixed
    from meshlessmultigridpoisson_tpu.mg.tpu_backend import tpu_hierarchy
    from meshlessmultigridpoisson_tpu.mg.vcycle import init_like, v_cycle
    from meshlessmultigridpoisson_tpu.ops import smoothers as sm
    from meshlessmultigridpoisson_tpu.ops.ell import spmv as ell_spmv
    from meshlessmultigridpoisson_tpu.utils.jaxutils import on_cpu, to_device_tree

    with on_cpu():
        d = _load_pytree(args.cache)
        hier = d["hierarchy"]
        thier = tpu_hierarchy(hier)
    dev = jax.devices()[0]
    thier = jax.device_put(thier, dev)
    op64 = to_device_tree(hier.levels[-1], device=dev)
    b = jax.device_put(d["state0"].b[-1], dev)
    bl = jax.device_put(d["state0"].b_lag[-1], dev)

    rows = []
    L = len(thier.levels)
    for li, op in enumerate(thier.levels):
        rng = np.random.default_rng(li)
        x0 = jax.device_put(jnp.asarray(
            rng.standard_normal(op.n_pad), jnp.float32), dev)
        zl = jnp.zeros((), jnp.float32)
        bb = jax.device_put(jnp.zeros(op.n_pad, jnp.float32), dev)
        kl = int(max(16, min(2048, -(-2e7 // max(op.n_pad, 1)))))
        # levels passed as chain args, never closure constants (HTTP 413
        # on the tunnel's remote-compile at flagship table sizes)
        t_smooth = bench.chain_delta(
            lambda x, lv: sm.smooth(lv, x, zl, bb, zl)[0], x0, op, k=kl)
        t_resid = bench.chain_delta(
            lambda x, lv: bb - sm.matvec(lv, x, zl)[0], x0, op, k=kl)
        rows.append(dict(
            level=li, n=op.n, kernel=op.kernel_kind, iters=op.iters,
            smooth_ms=t_smooth * 1e3, residual_ms=t_resid * 1e3))
        bench.log(f"L{li} n={op.n} [{op.kernel_kind}] "
                  f"smooth {t_smooth*1e3:.3f} ms  resid {t_resid*1e3:.3f} ms")

    transfers = []
    for i in range(L - 1):
        R, Pm = thier.restrict[i], thier.prolong[i]
        fine, coarse = thier.levels[i + 1], thier.levels[i]
        xf = jax.device_put(jnp.asarray(
            np.random.default_rng(i).standard_normal(fine.n_pad),
            jnp.float32), dev)
        klr = int(max(16, min(2048, -(-2e7 // max(fine.n_pad, 1)))))
        t_r = bench.chain_delta(
            lambda x, rr: jnp.zeros(fine.n_pad, jnp.float32)
            .at[:coarse.n_pad].set(ell_spmv(rr, x)[:coarse.n_pad]),
            xf, R, k=klr)
        t_p = bench.chain_delta(
            lambda x, pm: ell_spmv(pm, x[:coarse.n_pad])[:fine.n_pad] * 1.0
            + x * 0.0, xf, Pm, k=klr)
        transfers.append(dict(
            i=i, restrict_ms=t_r * 1e3, prolong_ms=t_p * 1e3))
        bench.log(f"T{i} restrict {t_r*1e3:.3f} ms  prolong {t_p*1e3:.3f} ms")

    # whole jitted V-cycle (the inner solve's preconditioner application)
    st = init_like(thier)
    st = st.replace_level(L - 1, b=b.astype(jnp.float32))

    def cyc(x, th):
        s2 = st.replace_level(L - 1, x=x)
        s2, _ = v_cycle(th, s2)
        return s2.x[L - 1]

    xf0 = jax.device_put(jnp.zeros(thier.levels[-1].n_pad, jnp.float32), dev)
    t_cycle = bench.chain_delta(cyc, xf0, thier, k=16)
    bench.log(f"whole v_cycle: {t_cycle*1e3:.3f} ms")

    # f64 outer residual of the mixed solver (XLA-emulated f64 SpMV)
    x64 = jnp.zeros(op64.n_pad, jnp.float64)
    t0 = time.perf_counter()
    r, rl = mixed._residual64(op64, x64, jnp.zeros((), jnp.float64), b, bl)
    jax.block_until_ready(r)
    t_r64_first = time.perf_counter() - t0
    reps = []
    for _ in range(5):
        t0 = time.perf_counter()
        r, rl = mixed._residual64(op64, x64 + r * 1e-30,
                                  jnp.zeros((), jnp.float64), b, bl)
        jax.block_until_ready(r)
        reps.append(time.perf_counter() - t0)
    t_r64 = float(np.median(reps))
    bench.log(f"f64 outer residual: {t_r64*1e3:.1f} ms "
              f"(first {t_r64_first:.1f} s)")

    # modeled cycle from parts: descend (smooth+resid+restrict), coarsest
    # second smooth, ascend (prolong+smooth) — mirrors mg/vcycle.v_cycle
    model = 0.0
    for li in range(L):
        model += rows[li]["smooth_ms"] * 2 if li > 0 else 0  # pre+post
        if li == 0:
            model += rows[li]["smooth_ms"] * 2  # coarsest double smooth
        if li > 0:
            model += rows[li]["residual_ms"]
    for t in transfers:
        model += t["restrict_ms"] + t["prolong_ms"]
    out = dict(
        cache=args.cache,
        levels=rows, transfers=transfers,
        vcycle_ms=t_cycle * 1e3,
        vcycle_model_ms=model,
        dispatch_gap_ms=t_cycle * 1e3 - model,
        outer_residual64_ms=t_r64 * 1e3,
        device=str(dev),
    )
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    bench.log(f"modeled {model:.3f} ms vs measured {t_cycle*1e3:.3f} ms")
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
