"""Minimal _solve_tpu-sequence replica over the debug cache.

The full-kernel harness (debug150k.py) executes the identical solve_mixed
HLO on identical data and PASSES (4/4); every CLI-flavored run CRASHES the
tunnel worker (7/7).  This replica follows the CLI's exact statement order
(load -> tpu_hierarchy -> device_put rebind -> op64 -> b -> bl -> hd ->
x0 -> AOT lower/compile/execute) with none of the harness's extra
allocations, to determine whether the difference lives inside the flow or
outside it (imports/process shape).

Run: python scripts/debug150k_b.py
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from meshlessmultigridpoisson_tpu.utils.jaxutils import on_cpu, to_device_tree  # noqa: E402
from meshlessmultigridpoisson_tpu.mg import mixed  # noqa: E402
from meshlessmultigridpoisson_tpu.mg.tpu_backend import tpu_hierarchy  # noqa: E402

sys.path.insert(0, "/root/repo/scripts")
from debug150k import CACHE, load_pytree_raw  # noqa: E402


def main():
    with on_cpu():
        hier, b_fine, bl_fine = load_pytree_raw(CACHE)
        thier = tpu_hierarchy(hier, sweep="colored")
    dev = jax.devices()[0]
    import os
    variant = os.environ.get("VARIANT", "base")
    if variant == "keepalive":
        thier_host = thier
        thier = jax.device_put(thier, dev)
        main.keep = [thier_host, hier]
    elif variant == "prealloc":
        keep = []
        for lv in tpu_hierarchy.__self__ if False else []:
            pass
        thier = jax.device_put(thier, dev)
        for lv in thier.levels:
            keep.append(jax.device_put(jnp.asarray(
                np.random.default_rng(1).standard_normal(lv.n_pad),
                jnp.float32), dev))
            keep.append(jax.device_put(jnp.asarray(
                np.random.default_rng(2).standard_normal(lv.n_pad),
                jnp.float32), dev))
        main.keep = keep
    else:
        thier = jax.device_put(thier, dev)
    op64 = to_device_tree(hier.levels[-1], device=dev)
    b = jax.device_put(b_fine, dev)
    bl = jax.device_put(bl_fine, dev)
    hd = mixed.defect_hierarchy(thier)
    x0 = jnp.zeros(op64.n_pad, jnp.float64)
    xl0 = jnp.zeros((), jnp.float64)
    print("lowering...", flush=True)
    lowered = mixed.solve_mixed.lower(op64, hd, x0, xl0, b, bl, tol=1e-8)
    print("compiling...", flush=True)
    compiled = lowered.compile()
    print("executing...", flush=True)
    res0 = compiled(op64, hd, x0, xl0, b, bl, tol=1e-8)[3]
    print("res:", float(np.asarray(res0)), flush=True)
    print("PASS", flush=True)


if __name__ == "__main__":
    main()
