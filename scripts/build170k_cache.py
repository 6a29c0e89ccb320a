"""Build the round-5 flagship setup cache: >= 150,214 fine points.

The reference's largest demonstrated problem is 150,214 points
(square_hole_150214.msh, testing_functions.cpp:359).  Bridson sampling
realizes ~88.6% of the requested target on this geometry (round 4:
request 150214 -> 133,240 achieved), so round 5 requests 171,000 to land
>= 150,214 achieved.  The cache is written through the CLI's own
_save_setup with the CLI's build_config stamp, so the subsequent
`solve --platform tpu --setup-cache` run validates and reuses it.

Run: PYTHONPATH=/root/repo python scripts/build170k_cache.py [--out PATH]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

SIZES = [2532, 10197, 37943, 171000]


def cli_args(cache, block_rows):
    return argparse.Namespace(
        geom="square_with_circle", sizes=SIZES, deg=6, k=1, neumann=True,
        seed=0, msh=None, ordering="kdtile", block_rows=block_rows,
        setup_cache=cache)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sc170k.npz")
    ap.add_argument("--block-rows", type=int, default=512,
                    help="512 keeps the kd-compact blocks colorable "
                         "(~100 conflicts vs 8k at 256; see cli --block-rows)")
    args = ap.parse_args()

    from meshlessmultigridpoisson_tpu.apps import cli
    from meshlessmultigridpoisson_tpu.models.poisson import make_poisson_problem

    a = cli_args(args.out, args.block_rows)
    t0 = time.perf_counter()
    prob = make_poisson_problem(
        a.geom, sizes=list(a.sizes), poly_deg=a.deg, k1=a.k,
        neumann=a.neumann, seed=a.seed, msh_files=a.msh, ordering=a.ordering,
        block_rows=a.block_rows)
    print(f"setup built in {time.perf_counter() - t0:.0f}s; "
          f"achieved sizes {[c.n for c in prob.clouds]}", flush=True)
    assert prob.clouds[-1].n >= 150214, (
        f"fine cloud {prob.clouds[-1].n} < 150214; raise the request")
    cli._save_setup(args.out, prob, a)
    print("done", flush=True)


if __name__ == "__main__":
    main()
