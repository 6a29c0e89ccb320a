"""Bisect the 150k TPU worker crash kernel by kernel.

Both sweep orders crash the worker during the first solve_mixed execution
at the 150k scale (exact-order triage), so the fault is in one of the
shared kernels.  This harness builds the hierarchy ONCE (cached as an
uncompressed pytree npz), then executes each device kernel individually,
printing a marker before each — the last marker names the faulting step.

Run: python scripts/debug150k.py [--from N] [sizes...]
"""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

CACHE = "/tmp/h150k_cache.npz"


def save_pytree_raw(path, tree):
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"arr_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__tree__"] = np.frombuffer(pickle.dumps(treedef), dtype=np.uint8)
    np.savez(path, **arrays)


def load_pytree_raw(path):
    import jax
    import jax.numpy as jnp

    with np.load(path, allow_pickle=False) as data:
        treedef = pickle.loads(data["__tree__"].tobytes())
        n = len([k for k in data.files if k.startswith("arr_")])
        leaves = [jnp.asarray(data[f"arr_{i}"]) for i in range(n)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--from", dest="from_step", type=int, default=0)
    ap.add_argument("--sweep", default="colored")
    ap.add_argument("sizes", nargs="*", type=int,
                    default=[2532, 10197, 37943, 150214])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)
    from meshlessmultigridpoisson_tpu.utils.jaxutils import on_cpu, to_device_tree

    if not os.path.exists(CACHE):
        with on_cpu():
            import warnings

            warnings.filterwarnings("ignore")
            from meshlessmultigridpoisson_tpu.models.poisson import (
                make_poisson_problem,
            )

            print("building problem (one-time)...", flush=True)
            prob = make_poisson_problem(
                "square_with_circle", sizes=args.sizes, poly_deg=6, k1=1,
                neumann=True, ordering="kdtile")
            save_pytree_raw(CACHE, (prob.hierarchy, prob.state0.b[-1],
                                    prob.state0.b_lag[-1]))
            print("cached.", flush=True)

    with on_cpu():
        hier, b_fine, bl_fine = load_pytree_raw(CACHE)
        from meshlessmultigridpoisson_tpu.mg.tpu_backend import tpu_hierarchy

        print("building TPU hierarchy...", flush=True)
        thier = tpu_hierarchy(hier, sweep=args.sweep)

    dev = jax.devices()[0]
    step = [0]

    def mark(name, fn):
        step[0] += 1
        if step[0] <= args.from_step:
            return None
        print(f"STEP {step[0]}: {name} ...", flush=True)
        out = fn()
        jax.tree_util.tree_map(
            lambda a: a.block_until_ready()
            if hasattr(a, "block_until_ready") else a, out)
        print(f"STEP {step[0]}: {name} OK", flush=True)
        return out

    from meshlessmultigridpoisson_tpu.mg import tpu_backend as tb
    from meshlessmultigridpoisson_tpu.ops.kernels import spmv_tpu2
    from meshlessmultigridpoisson_tpu.ops.kernels6 import spmv_tpu6

    thier_d = jax.device_put(thier, dev)
    for li, lv in enumerate(thier_d.levels):
        n_pad = lv.n_pad
        rng = np.random.default_rng(li)
        x = jax.device_put(jnp.asarray(
            rng.standard_normal(n_pad), jnp.float32), dev)
        b = jax.device_put(jnp.asarray(
            rng.standard_normal(n_pad), jnp.float32), dev)
        zl = jnp.zeros((), jnp.float32)
        kind = ("colored" if lv.colored8 is not None else
                "v7" if lv.union7 is not None else
                "v6" if lv.kell6 is not None else "v2")
        print(f"--- level {li}: n={lv.n} n_pad={n_pad} sweep-kind={kind}",
              flush=True)
        if lv.kell6 is not None:
            mark(f"L{li} spmv6",
                 lambda: jax.jit(lambda xx: spmv_tpu6(lv.kell6, xx))(x))
        mark(f"L{li} spmv2 (kell)",
             lambda: jax.jit(lambda xx: spmv_tpu2(lv.kell, xx))(x))
        if lv.bound_n:
            mark(f"L{li} bound_eval (v2)",
                 lambda: jax.jit(
                     lambda xx, bb: tb.bound_eval_neumann(lv, xx, bb))(x, b))
        if lv.cond_n:
            mark(f"L{li} push_inhomog (v2)",
                 lambda: jax.jit(
                     lambda bb: tb.push_inhomog_to_rhs(lv, bb))(b))
        mark(f"L{li} smooth x1",
             lambda: jax.jit(
                 lambda xx, bb: tb.smooth(lv, xx, zl, bb, zl, iters=1))(x, b))
        mark(f"L{li} smooth x5",
             lambda: jax.jit(
                 lambda xx, bb: tb.smooth(lv, xx, zl, bb, zl, iters=5))(x, b))

    for i, (r, p) in enumerate(zip(thier_d.restrict, thier_d.prolong)):
        xf = jax.device_put(jnp.asarray(
            np.random.default_rng(90 + i).standard_normal(
                thier_d.levels[i + 1].n_pad), jnp.float32), dev)
        xc = jax.device_put(jnp.asarray(
            np.random.default_rng(80 + i).standard_normal(
                thier_d.levels[i].n_pad), jnp.float32), dev)
        mark(f"restrict {i}", lambda: jax.jit(
            lambda v: spmv_tpu2(r, v))(xf))
        mark(f"prolong {i}", lambda: jax.jit(
            lambda v: spmv_tpu2(p, v))(xc))

    # f64 outer matvec on the fine LevelOperator
    op64 = to_device_tree(hier.levels[-1], device=dev)
    x64 = jax.device_put(jnp.asarray(
        np.random.default_rng(7).standard_normal(op64.n_pad)), dev)
    from meshlessmultigridpoisson_tpu.ops import smoothers as sm

    mark("f64 outer matvec", lambda: jax.jit(
        lambda xx: sm.matvec(op64, xx, jnp.zeros((), jnp.float64)))(x64))

    # full V-cycle on the defect hierarchy, then solve_mixed
    from meshlessmultigridpoisson_tpu.mg import mixed
    from meshlessmultigridpoisson_tpu.mg.vcycle import init_like, v_cycle

    hd = mixed.defect_hierarchy(thier_d)
    st = init_like(hd)
    fine_i = len(hd.levels) - 1
    st = st.replace_level(
        fine_i, b=jax.device_put(jnp.asarray(
            np.asarray(b_fine), jnp.float32), dev))
    mark("one v_cycle (f32 defect hierarchy)",
         lambda: jax.jit(lambda s: v_cycle(hd, s)[1])(st))
    from meshlessmultigridpoisson_tpu.mg.vcycle import run_v_cycles

    mark("run_v_cycles x20 (sustained load)",
         lambda: run_v_cycles(hd, st, 20)[1])
    from meshlessmultigridpoisson_tpu.mg.krylov import solve_bicgstab

    mark("bicgstab 1 iter",
         lambda: solve_bicgstab(hd, st, tol=1e-12, max_iters=1)[2])
    mark("bicgstab 5 iters",
         lambda: solve_bicgstab(hd, st, tol=1e-12, max_iters=5)[2])
    mark("bicgstab 60 iters",
         lambda: solve_bicgstab(hd, st, tol=1e-5, max_iters=60)[2])
    b64 = jax.device_put(jnp.asarray(np.asarray(b_fine)), dev)
    bl64 = jax.device_put(jnp.asarray(np.asarray(bl_fine)), dev)
    x0 = jnp.zeros(op64.n_pad, jnp.float64)
    mark("solve_mixed outer1/inner5", lambda: mixed.solve_mixed(
        op64, hd, x0, jnp.zeros((), jnp.float64), b64, bl64, tol=1e-8,
        inner_iters=5, max_outer=1)[3])
    mark("solve_mixed", lambda: mixed.solve_mixed(
        op64, hd, x0, jnp.zeros((), jnp.float64), b64, bl64, tol=1e-8)[3])

    def aot():
        lowered = mixed.solve_mixed.lower(
            op64, hd, x0, jnp.zeros((), jnp.float64), b64, bl64, tol=1e-8)
        compiled = lowered.compile()
        return compiled(op64, hd, x0, jnp.zeros((), jnp.float64),
                        b64, bl64, tol=1e-8)[3]

    mark("solve_mixed AOT lower/compile/execute (the CLI path)", aot)
    print("ALL STEPS OK", flush=True)


if __name__ == "__main__":
    main()
