"""Strict reference-PPE fractional step on REAL .msh input (VERDICT r2
missing #3: the last unreproduced reference behavior).

PARITY.md §6 measured the strict mode (assembled-Laplacian PPE + RHS
pushdown, explicit diffusion, p_relax=1 — run_fracstep_param,
FractionalStepSim.cpp:50-79,130-156) divergent within ~15 steps on
*generated* clouds.  The reference only ever ran it on Gmsh meshes.  This
script re-runs it on real .msh fixtures (the committed square_170/600 plus
a generated square_2500.msh via the same Gmsh-v2 writer) and, as control,
the production compatible-PPE mode on the SAME meshes — so the outcome is
either a reproduction (strict converges on meshes) or a clean bound
(divergence signature identical to generated clouds; mesh input ruled out
as the cause).

Writes results/ns_strict_msh_r3.json.

Run: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python scripts/ns_strict_msh.py
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def ensure_msh(paths):
    """Generate any missing square fixtures with the Gmsh v2 writer."""
    from meshlessmultigridpoisson_tpu.geometry.msh import write_msh
    from meshlessmultigridpoisson_tpu.geometry.pointclouds import make_cloud
    from make_msh_fixtures import boundary_loops, domain_triangles

    for path, n in paths:
        if os.path.exists(path):
            continue
        cloud = make_cloud("square", n, seed=0)
        tris = domain_triangles(cloud.points, "square")
        write_msh(path, cloud.points, boundary_loops(cloud), tris)
        print(f"generated {path}: {cloud.n} nodes", file=sys.stderr)


def run_mode(msh_files, strict: bool, steps: int, blowup=1e3):
    """Run one mode; early-stop on blow-up.  Returns a result row."""
    import jax

    jax.config.update("jax_enable_x64", True)
    from meshlessmultigridpoisson_tpu.config import FracStepConfig
    from meshlessmultigridpoisson_tpu.models import fracstep as fs

    cfg = FracStepConfig(
        dt=2e-4, mu=0.025, rho=1.0, ppe_tol=1e-10,
        p_relax=1.0 if strict else 0.7,
        diffusion="explicit",
        max_steps=steps,
    )
    t0 = time.time()
    prob = fs.build_fracstep_problem(
        poly_deg=6, config=cfg, compatible_ppe=not strict,
        msh_files=msh_files,
    )
    setup_s = time.time() - t0
    state = prob.state0
    hist, err_hist = [], []
    diverged_at = None
    t0 = time.time()
    for i in range(steps):
        state, res = fs.timestep(prob, state, ppe_solver="bicgstab")
        r = float(res)
        hist.append(r)
        if i % 10 == 0 or i == steps - 1:
            err = float(fs.u_error_vs_kovasznay(prob, state))
            err_hist.append([i, err])
            print(f"  [{'strict' if strict else 'compat'}] step {i}: "
                  f"fs_res={r:.3e} u_err={err:.3e}", file=sys.stderr,
                  flush=True)
            if not np.isfinite(err) or err > blowup:
                diverged_at = i
                break
        if not np.isfinite(r) or r > blowup:
            diverged_at = i
            break
    return dict(
        mode="strict-reference" if strict else "compatible",
        p_relax=cfg.p_relax, diffusion=cfg.diffusion,
        sizes=[c.n for c in prob.clouds],
        steps_run=len(hist), diverged_at_step=diverged_at,
        fs_residual_history=hist[:: max(1, len(hist) // 200)],
        u_err_history=err_hist,
        final_u_err=err_hist[-1][1] if err_hist else None,
        setup_s=setup_s, run_s=time.time() - t0,
    )


def main():
    fixtures = "tests/fixtures"
    gen = "results/.mshcache"
    os.makedirs(gen, exist_ok=True)
    msh_files = [
        (os.path.join(fixtures, "square_170.msh"), 170),
        (os.path.join(fixtures, "square_600.msh"), 600),
        (os.path.join(gen, "square_2500.msh"), 2500),
    ]
    ensure_msh(msh_files)
    paths = [p for p, _ in msh_files]

    steps = int(os.environ.get("NS_STEPS", 200))
    out = dict(msh_files=paths, reference_defaults=dict(
        dt=2e-4, mu=0.025, rho=1.0, ppe_tol=1e-10))
    out["runs"] = [
        run_mode(paths, strict=True, steps=steps),
        run_mode(paths, strict=False, steps=steps),
    ]
    with open("results/ns_strict_msh_r3.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote results/ns_strict_msh_r3.json")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(__file__))
    main()
