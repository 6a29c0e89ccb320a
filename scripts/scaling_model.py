"""Weak-scaling stand-in: comm-bytes-per-cycle model + virtual-mesh curve
(VERDICT r2 weak #8; redone for r4 next #5 with production-sized shards,
round-5 measured kernel rates, and a CONVERGED sharded solve per point).

Single-chip rig, so two complementary measurements replace a real
multi-host weak-scaling run:

1. ANALYTIC comm volume per V-cycle, from the REAL partition metadata
   (not a guess): frontier ppermutes (phases x hops x nf rows, per sweep
   and per matvec, sharded.py:49-62,151-152,192), Lagrange/norm psums,
   and the coarse-tail restriction psum + prolongation all_gather
   (sharded.py:246,275,286).  Volumes scale linearly in nf and nc and are
   INDEPENDENT of interior rows — the weak-scaling story.

2. MEASURED per-cycle wall time on the virtual CPU mesh at fixed
   rows/shard for P in {1,2,4,8} (XLA scan fallback; the 2-core host
   oversubscribes, so the curve bounds SPMD overhead growth, not absolute
   speed — absolute kernel speed comes from the real-chip bench).

The model then projects 2-host efficiency at BASELINE's target: with
Tcomp from the measured on-chip sweep throughput (bench_r3: 12.37 Gnnz/s)
and Tcomm = bytes / BW + latency * n_collectives for ICI (intra-host) and
DCN (host boundary), efficiency = Tcomp / (Tcomp + Tcomm_DCN_boundary).

Writes results/scaling_model_r5.json.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
     PYTHONPATH=/root/repo python scripts/scaling_model.py
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

ROWS_PER_SHARD = int(os.environ.get("ROWS_PER_SHARD", 65536))
CYCLES = int(os.environ.get("CYCLES", 8))

# measured on-chip numbers for the projection: the round-5 flagship's
# kd-512 production fine level (results/solve150k_r5.json per_level L3 —
# REAL 151,805-point operator, not the synthetic bench), v8-colored sweep
SWEEP_GNNZ_S = 7.2e9
SPMV_GNNZ_S = 10.8e9
# link bandwidths (bytes/s) and per-collective latency (s)
ICI_BW = 45e9   # v5e per-direction per-link effective
DCN_BW = 12.5e9  # 100 Gb/s host NIC effective
LAT_ICI = 1e-6
LAT_DCN = 10e-6


def comm_model(f, nnz_fine, iters, nc_tail):
    """Per-V-cycle comm volumes (bytes, counts) from partition metadata.

    Per sweep: `phases` frontier exchanges (each = 2*hops ppermutes of
    nf f32 rows) + 1 bound_eval exchange + (has_lagrange) 1 scalar psum.
    Per cycle at the fine level: pre+post smooth (2*iters sweeps),
    1 residual matvec exchange + 1 relative-residual psum pair,
    restriction psum of the nc-row tail, all_gather of nc rows coming up.
    """
    nf, hops, phases = f.frontier_rows, f.phases - 1, f.phases
    sweeps = 2 * iters
    exch_per_sweep = phases + 1  # frontier phases + bound_eval
    n_exchanges = sweeps * exch_per_sweep + 1  # + residual matvec
    bytes_exchange = 2 * hops * nf * 4  # per shard, both directions
    ppermute_bytes = n_exchanges * bytes_exchange
    n_psum_scalar = sweeps + 3  # lagrange per sweep + resid num/den + lag
    psum_tail_bytes = nc_tail * 4  # restriction partial-product all-reduce
    allgather_bytes = nc_tail * 4  # coarse solution up
    coll_count = n_exchanges * 2 * hops + n_psum_scalar + 2
    total_bytes = ppermute_bytes + 2 * psum_tail_bytes + allgather_bytes
    # compute per cycle per shard (dominant fine-level work)
    nnz_shard = nnz_fine / f.num_shards
    t_comp = sweeps * nnz_shard / SWEEP_GNNZ_S + 2 * nnz_shard / SPMV_GNNZ_S
    return dict(
        frontier_rows=nf, phases=phases,
        exchanges_per_cycle=n_exchanges,
        ppermute_bytes_per_cycle=int(ppermute_bytes),
        psum_tail_bytes=int(2 * psum_tail_bytes),
        allgather_bytes=int(allgather_bytes),
        total_bytes_per_cycle=int(total_bytes),
        collective_count=int(coll_count),
        t_comp_per_cycle_s=t_comp,
        t_comm_ici_s=total_bytes / ICI_BW + coll_count * LAT_ICI,
        t_comm_dcn_s=total_bytes / DCN_BW + coll_count * LAT_DCN,
    )


def main():
    import jax
    import jax.numpy as jnp

    from meshlessmultigridpoisson_tpu.models.poisson import (
        make_poisson_problem,
    )
    from meshlessmultigridpoisson_tpu.parallel.partition import (
        partition_hierarchy, hierarchy_to_f32,
    )
    from meshlessmultigridpoisson_tpu.parallel import sharded as sh
    from jax.sharding import Mesh

    devs = np.array(jax.devices())
    rows = []
    for P in (1, 2, 4, 8):
        n_fine = ROWS_PER_SHARD * P
        sizes = [max(n_fine // 16, 300), max(n_fine // 4, 900), n_fine]
        t0 = time.time()
        prob = make_poisson_problem(
            "square", sizes=sizes, poly_deg=4, k1=1, neumann=True,
            ordering="kdtile")
        setup_s = time.time() - t0
        shier = hierarchy_to_f32(partition_hierarchy(prob.hierarchy, P))
        f = shier.fine
        op_fine = prob.hierarchy.levels[-1]
        nnz_fine = int(np.count_nonzero(np.asarray(op_fine.A.vals)))
        nc_tail = shier.coarse.levels[-1].n_pad if shier.coarse.levels else 0

        mesh = Mesh(devs[:P], (sh.AXIS,))
        cycle = sh.make_sharded_vcycle(shier, mesh)
        nfp = f.num_shards * f.shard_rows
        bf = jnp.zeros(nfp, jnp.float32).at[: op_fine.n].set(
            jnp.asarray(np.random.default_rng(0).standard_normal(op_fine.n),
                        jnp.float32))
        xf = jnp.zeros(nfp, jnp.float32)
        zero = jnp.zeros((), jnp.float32)
        # warm-up (compile)
        x1, xl1, res = cycle(xf, zero, bf, zero)
        jax.block_until_ready(x1)
        t0 = time.time()
        x, xl = xf, zero
        for _ in range(CYCLES):
            x, xl, res = cycle(x, xl, bf, zero)
        jax.block_until_ready(x)
        per_cycle_s = (time.time() - t0) / CYCLES
        # converged sharded solve (VERDICT r4: the r3 curve rows carried
        # unconverged 8-cycle residuals)
        solver = sh.make_sharded_bicgstab(shier, mesh)
        t0 = time.time()
        xs, xls, iters_s, res_s = solver(xf, zero, bf, zero, 1e-8)
        jax.block_until_ready(xs)
        solve_s = time.time() - t0
        model = comm_model(f, nnz_fine, op_fine.iters, nc_tail)
        eff_ici = model["t_comp_per_cycle_s"] / (
            model["t_comp_per_cycle_s"] + model["t_comm_ici_s"])
        eff_dcn = model["t_comp_per_cycle_s"] / (
            model["t_comp_per_cycle_s"] + model["t_comm_dcn_s"])
        row = dict(
            P=P, rows_per_shard=f.shard_rows, n_fine=op_fine.n,
            nnz_fine=nnz_fine, setup_s=round(setup_s, 1),
            measured_cpu_cycle_s=per_cycle_s,
            cycle_residual_8=float(res),
            solve_iters=int(iters_s), solve_residual=float(res_s),
            solve_cpu_s=round(solve_s, 2),
            model=model,
            projected_eff_ici=round(eff_ici, 4),
            projected_eff_dcn=round(eff_dcn, 4),
        )
        rows.append(row)
        print(f"P={P} rows/shard={f.shard_rows} nf={f.frontier_rows} "
              f"cycle={per_cycle_s*1e3:.1f}ms (cpu) "
              f"bytes/cycle={model['total_bytes_per_cycle']/1e6:.2f}MB "
              f"eff_ici={eff_ici:.3f} eff_dcn={eff_dcn:.3f}",
              file=sys.stderr, flush=True)

    # project BASELINE's 2-host target at production scale: 1M rows/shard
    big = dict()
    for rps in (131072, 524288, 1048576):
        # frontier fraction from the measured partitions (nf ~ const blocks)
        nf = max(r["model"]["frontier_rows"] for r in rows)
        f_fake = type("F", (), dict(
            frontier_rows=nf, phases=rows[-1]["model"]["phases"],
            num_shards=2))()
        m = comm_model(f_fake, rps * 2 * 70, 5, max(rps // 16, 2048))
        big[str(rps)] = dict(
            rows_per_shard=rps,
            eff_2host_dcn=round(m["t_comp_per_cycle_s"] / (
                m["t_comp_per_cycle_s"] + m["t_comm_dcn_s"]), 4),
            model=m,
        )
        print(f"rows/shard={rps}: projected 2-host DCN efficiency "
              f"{big[str(rps)]['eff_2host_dcn']:.3f}",
              file=sys.stderr, flush=True)

    out = dict(
        rows_per_shard=ROWS_PER_SHARD, cycles=CYCLES,
        assumptions=dict(
            sweep_gnnz_s=SWEEP_GNNZ_S, spmv_gnnz_s=SPMV_GNNZ_S,
            ici_bw=ICI_BW, dcn_bw=DCN_BW, lat_ici=LAT_ICI, lat_dcn=LAT_DCN),
        curve=rows, projection_2host=big,
    )
    with open("results/scaling_model_r5.json", "w") as fo:
        json.dump(out, fo, indent=1)
    print("wrote results/scaling_model_r5.json")


if __name__ == "__main__":
    main()
