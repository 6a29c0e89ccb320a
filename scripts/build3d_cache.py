"""Build the round-5 3D flagship setup cache: BASELINE config 3.

box3d ladder to >= 1M points, 5 levels, 3D RBF-FD stencils (fine deg 3 =
50 neighbors, coarse deg 2 = 25 — the "27+-neighbor class"), kd-tile
ordering, 512-row smoother blocks (see cli --block-rows).  The reference
is strictly 2D (distance drops z, general_computation_functions.cpp:4-6);
this is the designed extension BASELINE.md names as config 3.

Run: PYTHONPATH=/root/repo python scripts/build3d_cache.py [--out PATH]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

SIZES = [500, 2600, 19000, 140000, 1060000]


def cli_args(cache, block_rows=512):
    return argparse.Namespace(
        geom="box3d", sizes=SIZES, deg=3, k=1, neumann=False,
        seed=0, msh=None, ordering="kdtile", block_rows=block_rows,
        setup_cache=cache)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sc3d1m.npz")
    args = ap.parse_args()

    from meshlessmultigridpoisson_tpu.apps import cli
    from meshlessmultigridpoisson_tpu.models.poisson import make_poisson_problem

    a = cli_args(args.out)
    t0 = time.perf_counter()
    prob = make_poisson_problem(
        a.geom, sizes=list(a.sizes), poly_deg=a.deg, k1=a.k,
        neumann=a.neumann, seed=a.seed, msh_files=a.msh, ordering=a.ordering,
        block_rows=a.block_rows)
    print(f"setup built in {time.perf_counter() - t0:.0f}s; "
          f"achieved sizes {[c.n for c in prob.clouds]}", flush=True)
    assert prob.clouds[-1].n >= 1_000_000, (
        f"fine cloud {prob.clouds[-1].n} < 1M; raise the request")
    cli._save_setup(args.out, prob, a)
    print("done", flush=True)


if __name__ == "__main__":
    main()
