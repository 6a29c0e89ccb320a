"""Produce the 150k flagship-solve artifact through the proven run recipe.

The CLI-shaped invocation of the identical solve_mixed program crashes the
tunneled v5e WORKER at this scale (7/7 runs), while this flow — the
debug150k.py harness recipe: setup-bundle load, per-level buffer
allocations, then AOT lower/compile/execute — runs the byte-identical HLO
on bit-identical data to completion (4/4 runs; see scripts/debug150k.py
and scripts/debug150k_b.py for the bisect record).  The infrastructure
incident is documented in RESULTS.md; the measurement itself is the same
computation the CLI would time.

Writes results/solve150k_r4.json in the CLI SolveRecord schema.

Run: python scripts/solve150k_artifact.py [--cache /tmp/sc150k.npz]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from meshlessmultigridpoisson_tpu.io.bundle import _load_pytree  # noqa: E402
from meshlessmultigridpoisson_tpu.mg import mixed  # noqa: E402
from meshlessmultigridpoisson_tpu.mg.tpu_backend import tpu_hierarchy  # noqa: E402
from meshlessmultigridpoisson_tpu.utils.jaxutils import on_cpu, to_device_tree  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache", default="/tmp/sc150k.npz")
    ap.add_argument("--out", default="results/solve150k_r4.json")
    ap.add_argument("--tol", type=float, default=1e-8)
    ap.add_argument("--sweep", default="colored")
    args = ap.parse_args()

    t0 = time.perf_counter()
    with on_cpu():
        d = _load_pytree(args.cache)
        hier = d["hierarchy"]
        state0 = d["state0"]
        exact = np.asarray(d["exact"])
        sizes = np.asarray(d["sizes"]).tolist()
        thier = tpu_hierarchy(hier, sweep=args.sweep)
    t_setup = time.perf_counter() - t0
    print(f"setup (bundle load + kernel prep): {t_setup:.1f}s", flush=True)

    dev = jax.devices()[0]
    thier_d = jax.device_put(thier, dev)
    # per-level scratch allocations — part of the only flow that executes
    # at this scale on the tunneled worker (see module docstring)
    keep = []
    for li, lv in enumerate(thier_d.levels):
        rng = np.random.default_rng(li)
        keep.append(jax.device_put(jnp.asarray(
            rng.standard_normal(lv.n_pad), jnp.float32), dev))
        keep.append(jax.device_put(jnp.asarray(
            rng.standard_normal(lv.n_pad), jnp.float32), dev))
    op64 = to_device_tree(hier.levels[-1], device=dev)
    hd = mixed.defect_hierarchy(thier_d)
    b = jax.device_put(state0.b[-1], dev)
    bl = jax.device_put(state0.b_lag[-1], dev)
    x0 = jnp.zeros(op64.n_pad, jnp.float64)
    xl0 = jnp.zeros((), jnp.float64)

    t0 = time.perf_counter()
    lowered = mixed.solve_mixed.lower(op64, hd, x0, xl0, b, bl, tol=args.tol)
    t_lower = time.perf_counter() - t0
    print(f"lower: {t_lower:.1f}s", flush=True)
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    print(f"compile: {t_compile:.1f}s", flush=True)
    t0 = time.perf_counter()
    res0 = compiled(op64, hd, x0, xl0, b, bl, tol=args.tol)[3]
    float(np.asarray(res0))
    t_first = time.perf_counter() - t0
    print(f"first run: {t_first:.1f}s", flush=True)
    t0 = time.perf_counter()
    x, xl, it, res = compiled(op64, hd, x0, xl0, b, bl, tol=args.tol)
    res_f = float(np.asarray(res))
    t_solve = time.perf_counter() - t0
    print(f"solve: {t_solve:.3f}s  outer={int(np.asarray(it))} "
          f"residual={res_f:.3e}", flush=True)

    sol = np.asarray(hier.levels[-1].to_logical(
        jax.device_put(x, jax.devices("cpu")[0])))
    sol = sol + (exact.mean() - sol.mean())  # Neumann gauge
    l1 = float(np.abs(sol - exact).mean())
    print(f"l1 error vs manufactured solution: {l1:.3e}", flush=True)

    from meshlessmultigridpoisson_tpu.utils.profiling import profile_hierarchy

    per_level = profile_hierarchy(thier_d)
    rec = {
        "name": "poisson-square_with_circle-tpu",
        "config": {
            "sizes": sizes, "deg": 6, "k": 1, "neumann": True,
            "solver": "mixed-defect", "tol": args.tol, "platform": "tpu",
            "msh": None, "fast_k": False, "sweep_order": args.sweep,
            "ordering": "kdtile",
            "runner": "scripts/solve150k_artifact.py (harness flow; see "
                      "docstring re the CLI-shape worker crash)",
        },
        "residual_history": [],
        "cycles": int(np.asarray(it)),
        "wall_time_s": t_solve,
        "final_residual": res_f,
        "l1_error": l1,
        "extra": {
            "setup_time_s": t_setup,
            "lower_time_s": t_lower,
            "compile_time_s": t_compile,
            "first_run_s": t_first,
            "device": str(dev),
            "per_level": per_level,
        },
    }
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
