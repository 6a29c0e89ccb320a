"""Compile-time breakdown of the flagship TPU solve (VERDICT r2 weak #6).

Times jit lower+compile for each sub-graph of the mixed-precision solve at
the 38k square_with_circle config, cold (throwaway compilation-cache dir by
default) so the per-component costs are visible:

  * spmv_tpu6 fine-level matvec alone (1 Mosaic kernel)
  * one-shot sweep alone (1 Mosaic kernel)
  * f32 V-cycle (all levels: ~6-8 Mosaic kernels/level)
  * inner f32 solve_bicgstab (V-cycle preconditioned, while_loop)
  * f64 outer residual matvec (XLA-emulated f64 gather, no Mosaic)
  * full solve_mixed (everything in one module)

Usage:
  JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache_probe python scripts/kcompile.py
  (point the env var at /root/.cache/jax to measure warm-cache instead)
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache_probe")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

SIZES = [int(s) for s in os.environ.get("SIZES", "2532,10197,37943").split(",")]


def t_compile(name, fn, *args, results=None, **kw):
    """Time trace+lower and compile of jit(fn) at the given args."""
    import jax

    jfn = jax.jit(fn, **kw)
    t0 = time.time()
    lowered = jfn.lower(*args)
    t_lower = time.time() - t0
    t0 = time.time()
    lowered.compile()
    t_comp = time.time() - t0
    print(f"{name:34s} lower {t_lower:7.1f}s   compile {t_comp:7.1f}s",
          file=sys.stderr, flush=True)
    if results is not None:
        results[name] = dict(lower_s=round(t_lower, 2),
                             compile_s=round(t_comp, 2))
    return t_comp


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)
    from meshlessmultigridpoisson_tpu.mg import mixed
    from meshlessmultigridpoisson_tpu.mg.krylov import solve_bicgstab
    from meshlessmultigridpoisson_tpu.mg.tpu_backend import tpu_hierarchy
    from meshlessmultigridpoisson_tpu.mg.vcycle import init_like, v_cycle
    from meshlessmultigridpoisson_tpu.models.poisson import make_poisson_problem
    from meshlessmultigridpoisson_tpu.ops import smoothers as sm
    from meshlessmultigridpoisson_tpu.ops.kernels6 import sor_sweep_tpu6, spmv_tpu6
    from meshlessmultigridpoisson_tpu.utils.jaxutils import on_cpu, to_device_tree

    dev = jax.devices()[0]
    print(f"device {dev}, cache dir {os.environ['JAX_COMPILATION_CACHE_DIR']}",
          file=sys.stderr)
    t0 = time.time()
    with on_cpu():
        prob = make_poisson_problem(
            "square_with_circle", sizes=SIZES, poly_deg=6, k1=1, neumann=True)
        thier = tpu_hierarchy(prob.hierarchy)
    print(f"setup {time.time()-t0:.0f}s", file=sys.stderr, flush=True)
    thier = jax.device_put(thier, dev)
    op64 = to_device_tree(prob.hierarchy.levels[-1], device=dev)
    hd = mixed.defect_hierarchy(thier)
    fine = hd.levels[-1]
    n_pad = fine.n_pad

    res = {}
    x32 = jnp.zeros(n_pad, jnp.float32)
    zl32 = jnp.zeros((), jnp.float32)
    x64 = jnp.zeros(op64.n_pad, jnp.float64)
    zl64 = jnp.zeros((), jnp.float64)

    # single Mosaic kernels on the fine level
    print(f"fine level: n={fine.n} kell6={'yes' if fine.kell6 is not None else 'NONE (v2 fallback)'}",
          file=sys.stderr, flush=True)
    if fine.kell6 is not None:
        t_compile("spmv_tpu6 (fine)", lambda x: spmv_tpu6(fine.kell6, x),
                  x32, results=res)
    else:
        t_compile("matvec (fine, v2 fallback)",
                  lambda x: sm.matvec(fine, x, zl32)[0], x32, results=res)
    t_compile(
        "oneshot sweep (fine)",
        lambda x: sm.smooth(fine, x, zl32, x, zl32, iters=1)[0],
        x32, results=res)

    # all-level f32 V-cycle
    st = init_like(hd)
    t_compile("v_cycle f32 (all levels)",
              lambda s: v_cycle(hd, s)[1], st, results=res)

    # inner Krylov wrapper (same engine solve_mixed embeds)
    t_compile(
        "solve_bicgstab f32",
        lambda s: solve_bicgstab(hd, s, tol=1e-5, max_iters=60)[2],
        st, results=res, static_argnames=())

    # f64 outer residual (no Mosaic; emulated f64 gather path)
    t_compile(
        "f64 residual matvec",
        lambda x, xl: mixed._full_matvec64(op64, x, xl)[0],
        x64, zl64, results=res)

    # the whole production module
    b = jax.device_put(prob.state0.b[-1], dev)
    bl = jax.device_put(prob.state0.b_lag[-1], dev)
    t_compile(
        "solve_mixed (full)",
        lambda x, xl: mixed.solve_mixed(op64, hd, x, xl, b, bl, tol=1e-8)[3],
        x64, zl64, results=res)

    res["sizes"] = SIZES
    res["device"] = str(dev)
    out = os.environ.get("OUT", "results/compile_breakdown_r3.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
