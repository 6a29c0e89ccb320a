"""Distributed tests on the virtual 8-device CPU mesh (SURVEY.md section 4).

Exercises the REAL sharded code path: frontier/interior partitioner,
frontier-slice exchange, exact phased cross-shard GS, psum reductions,
replicated coarse sub-cycle — and asserts SOLUTION PARITY with the serial
solver at tight tolerance (no seam damping: the sharded smoother is exact
Gauss-Seidel under the partitioner's global order).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from meshlessmultigridpoisson_tpu.models.poisson import make_poisson_problem, l1_error
from meshlessmultigridpoisson_tpu.mg.vcycle import run_v_cycles
from meshlessmultigridpoisson_tpu.mg.krylov import solve_bicgstab
from meshlessmultigridpoisson_tpu.parallel import (
    partition_hierarchy,
    make_sharded_vcycle,
)
from meshlessmultigridpoisson_tpu.parallel.sharded import (
    _frontier_exchange,
    make_sharded_bicgstab,
    make_sharded_solver,
    shard_vector,
    unshard_vector,
    AXIS,
)


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices (see conftest)")
    return Mesh(np.array(devs[:8]), (AXIS,))


def test_frontier_exchange_layout(mesh):
    """ext = [own | L1 frontier | R1 | L2 | R2 | ...], zeros off-end."""
    import dataclasses as dc
    from meshlessmultigridpoisson_tpu.parallel.partition import ShardedFineLevel

    p, ns, nf, C = 8, 32, 8, 3

    class F:  # minimal duck-typed level for the exchange helper
        num_shards, frontier_rows, phases = p, nf, C

    def f(x):
        return _frontier_exchange(F, x)

    x = jnp.arange(p * ns, dtype=jnp.float64)
    out = jax.jit(
        jax.shard_map(
            f, mesh=mesh,
            in_specs=jax.sharding.PartitionSpec(AXIS),
            out_specs=jax.sharding.PartitionSpec(AXIS),
            check_vma=False,
        )
    )(x)
    hops = C - 1
    out = np.asarray(out).reshape(p, ns + 2 * hops * nf)
    xs = np.asarray(x).reshape(p, ns)
    for s in range(p):
        np.testing.assert_array_equal(out[s, :ns], xs[s])
        off = ns
        for d in range(1, hops + 1):
            left = xs[s - d, :nf] if s - d >= 0 else np.zeros(nf)
            right = xs[s + d, :nf] if s + d < p else np.zeros(nf)
            np.testing.assert_array_equal(out[s, off:off + nf], left)
            np.testing.assert_array_equal(out[s, off + nf:off + 2 * nf], right)
            off += 2 * nf


@pytest.mark.parametrize("neumann", [False, True])
def test_sharded_vcycle_tracks_serial(mesh, neumann):
    """Per-cycle residual history of the sharded cycle stays close to the
    serial engine's (same algorithm, different exact-GS row order)."""
    prob = make_poisson_problem(
        "square", sizes=[600, 2500], poly_deg=4, k1=1, neumann=neumann
    )
    shier = partition_hierarchy(prob.hierarchy, 8)
    cycle = make_sharded_vcycle(shier, mesh)

    op = prob.hierarchy.finest
    b_log = np.asarray(op.to_logical(prob.state0.b[-1]))
    bf = shard_vector(shier, mesh, b_log)
    xf = jnp.zeros_like(bf)
    xl = jnp.zeros(())
    bl = jnp.zeros(())
    hist = []
    for _ in range(25):
        xf, xl, r = cycle(xf, xl, bf, bl)
        hist.append(float(r))
    h = np.asarray(hist)
    assert h[0] == pytest.approx(1.0)
    assert np.isfinite(h).all()

    state, hist_serial = run_v_cycles(prob.hierarchy, prob.state0, 25)
    hs = np.asarray(hist_serial)
    # same contraction behavior (order differs -> small rate differences)
    assert h[-1] < 10 * hs[-1] + 1e-12
    # solutions agree where both have converged
    x_log = unshard_vector(shier, xf)
    serial = np.asarray(op.to_logical(state.x[-1]))
    if neumann:
        x_log = x_log - x_log.mean()
        serial = serial - serial.mean()
    scale = np.abs(serial).max()
    assert np.abs(x_log - serial).max() / scale < 10 * max(h[-1], hs[-1])


@pytest.mark.parametrize("neumann", [False, True])
def test_two_sharded_levels_solution_parity(mesh, neumann):
    """shard_levels=2: the second level also runs row-sharded (its own
    frontier-phase GS; transfers psum down / all_gather up).

    Dirichlet: raw cycling converges — solve to 1e-8 and match the serial
    solution.  Neumann: raw 3-level cycling diverges even SERIALLY on this
    hierarchy (PARITY.md deviation 5; production wraps BiCGStab), so the
    SHARDED BiCGStab must solve it to 1e-8 and match the serial solution.
    """
    prob = make_poisson_problem(
        "square", sizes=[170, 600, 2500], poly_deg=4, k1=1, neumann=neumann
    )
    shier = partition_hierarchy(prob.hierarchy, 8, shard_levels=2)
    assert len(shier.sharded) == 2

    op = prob.hierarchy.finest
    b_log = np.asarray(op.to_logical(prob.state0.b[-1]))
    bf = shard_vector(shier, mesh, b_log)

    if neumann:
        solver = make_sharded_bicgstab(shier, mesh, max_iters=200)
    else:
        solver = make_sharded_solver(shier, mesh, max_cycles=400)
    xf, xl, it, resid = solver(jnp.zeros_like(bf), jnp.zeros(()), bf,
                               jnp.zeros(()), 1e-8)
    assert float(resid) < 1e-8, f"2-sharded-level solve stalled at {float(resid)}"

    st, _, _ = solve_bicgstab(prob.hierarchy, prob.state0, tol=1e-10)
    serial = np.asarray(op.to_logical(st.x[-1]))
    x_log = unshard_vector(shier, xf)
    if neumann:  # gauge: fix the mean (Lagrange leaves a 1-dim family)
        x_log = x_log - x_log.mean()
        serial = serial - serial.mean()
    scale = max(np.abs(serial).max(), 1e-30)
    diff = np.abs(x_log - serial).max() / scale
    assert diff < 1e-6, f"2-level-sharded vs serial diff {diff:.2e}"


@pytest.mark.slow  # interpret-mode / multi-process: minutes each
def test_shard_kernel_tables_match_xla_per_shard(mesh):
    """Every shard's stacked v6 tables (incl. cross-shard window padding)
    reproduce the XLA gather matvec and the masked interior sweep —
    interpret mode, one shard at a time (the interpreter is not safe under
    concurrent shard_map threads)."""
    from jax.experimental.pallas import tpu as pltpu
    from meshlessmultigridpoisson_tpu.ops.kernels6 import (
        sor_sweep_tpu6,
        spmv_tpu6,
    )
    from meshlessmultigridpoisson_tpu.parallel import sharded as sh
    from meshlessmultigridpoisson_tpu.parallel.partition import hierarchy_to_f32

    prob = make_poisson_problem(
        "square", sizes=[600, 2500], poly_deg=4, k1=1, neumann=False
    )
    shier = hierarchy_to_f32(partition_hierarchy(prob.hierarchy, 8, kernels=True))
    f = shier.fine
    assert f.has_kernels, "kernel tables were not built"
    p, ns = f.num_shards, f.shard_rows
    rng = np.random.default_rng(2)
    ext = f.ext_rows
    ext_pad = -(-ext // 128) * 128

    for s in range(p):
        fs = jax.tree_util.tree_map(lambda a: a[s], f)
        kell = sh._kell_of(fs)
        x_ext = jnp.asarray(rng.standard_normal(ext), jnp.float32)
        y_xla = np.asarray(jnp.sum(
            fs.vals * jnp.take(x_ext, fs.lcols_ext, axis=0), axis=-1))
        with pltpu.force_tpu_interpret_mode():
            y_k = np.asarray(spmv_tpu6(kell, x_ext)[:ns])
        np.testing.assert_allclose(y_k, y_xla, rtol=2e-4, atol=2e-4)

        # interior sweep: frontier rows must not move, interior rows must
        # match the scan-tile oracle
        x0 = jnp.asarray(rng.standard_normal(ns), jnp.float32)
        b = jnp.asarray(rng.standard_normal(ns), jnp.float32)
        xl = jnp.asarray(0.11, jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            out_k = np.asarray(sh._interior_sweep_kernel(fs, x0, xl, b))
        nf = fs.frontier_rows
        np.testing.assert_array_equal(out_k[:nf], np.asarray(x0)[:nf])
        pad = jnp.zeros(2 * (fs.phases - 1) * nf, x0.dtype)
        x_e = jnp.concatenate([x0, pad]) if pad.size else x0
        s_ = fs.class_size
        out_x = np.asarray(sh._scan_tiles(
            fs, x_e, xl, b, nf // s_, ns // s_, True))[:ns]
        scale = max(np.abs(out_x).max(), 1.0)
        np.testing.assert_allclose(out_k, out_x, rtol=0, atol=3e-4 * scale)


@pytest.mark.slow  # interpret-mode / multi-process: minutes each
def test_sharded_kernel_cycle_single_shard(mesh):
    """Full kernel-dispatch V-cycle on a 1-shard mesh (the real-TPU
    single-chip configuration) vs the XLA sharded path, interpret mode."""
    from jax.experimental.pallas import tpu as pltpu
    from meshlessmultigridpoisson_tpu.parallel.partition import hierarchy_to_f32

    mesh1 = Mesh(np.array(jax.devices()[:1]), (AXIS,))
    prob = make_poisson_problem(
        "square", sizes=[600, 2500], poly_deg=4, k1=1, neumann=False
    )
    shier = partition_hierarchy(prob.hierarchy, 1)
    shier_k = hierarchy_to_f32(partition_hierarchy(prob.hierarchy, 1, kernels=True))
    assert shier_k.fine.has_kernels

    cycle = make_sharded_vcycle(shier, mesh1)
    cycle_k = make_sharded_vcycle(shier_k, mesh1)
    op = prob.hierarchy.finest
    b_log = np.asarray(op.to_logical(prob.state0.b[-1]))
    bf = shard_vector(shier, mesh1, b_log)
    xf, xl, bl = jnp.zeros_like(bf), jnp.zeros(()), jnp.zeros(())
    bfk = bf.astype(jnp.float32)
    xfk = jnp.zeros_like(bfk)
    xlk, blk = jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)

    hist, hist_k = [], []
    for _ in range(4):
        xf, xl, r = cycle(xf, xl, bf, bl)
        hist.append(float(r))
    with pltpu.force_tpu_interpret_mode():
        for _ in range(4):
            xfk, xlk, rk = cycle_k(xfk, xlk, bfk, blk)
            hist_k.append(float(rk))

    np.testing.assert_allclose(hist_k, hist, rtol=1e-3)
    x64 = unshard_vector(shier, xf)
    x32 = unshard_vector(shier_k, np.asarray(xfk, np.float64))
    scale = np.abs(x64).max()
    assert np.abs(x32 - x64).max() / scale < 1e-3


@pytest.mark.parametrize("neumann", [False, True])
def test_sharded_solution_parity_1e8(mesh, neumann):
    """VERDICT item: sharded solve to 1e-8 matches the serial solution.

    The sharded path solves to 1e-8 rel-L1 with raw V-cycling (exact GS
    smoother); the serial reference solves with BiCGStab to 1e-10.  Both
    discrete solutions must agree to ~1e-8 of the solution scale.
    """
    prob = make_poisson_problem(
        "square", sizes=[600, 2500], poly_deg=4, k1=1, neumann=neumann
    )
    shier = partition_hierarchy(prob.hierarchy, 8)
    solver = make_sharded_solver(shier, mesh, max_cycles=400)

    op = prob.hierarchy.finest
    b_log = np.asarray(op.to_logical(prob.state0.b[-1]))
    bf = shard_vector(shier, mesh, b_log)
    xf, xl, it, resid = solver(jnp.zeros_like(bf), jnp.zeros(()), bf,
                               jnp.zeros(()), 1e-8)
    assert float(resid) < 1e-8, f"sharded solve stalled at {float(resid)}"

    st, _, r_serial = solve_bicgstab(prob.hierarchy, prob.state0, tol=1e-10)
    serial = np.asarray(op.to_logical(st.x[-1]))
    x_log = unshard_vector(shier, xf)
    if neumann:  # gauge: fix the mean (Lagrange leaves a 1-dim family)
        x_log = x_log - x_log.mean()
        serial = serial - serial.mean()
    scale = max(np.abs(serial).max(), 1e-30)
    diff = np.abs(x_log - serial).max() / scale
    assert diff < 1e-6, f"sharded-vs-serial solution diff {diff:.2e}"

    # and the physical answer matches the manufactured solution
    err = np.abs(
        (x_log + (prob.exact.mean() - x_log.mean()) if neumann else x_log)
        - prob.exact
    ).mean()
    err_serial = np.abs(
        (serial + (prob.exact.mean() - serial.mean()) if neumann else serial)
        - prob.exact
    ).mean()
    assert err < 1.5 * err_serial + 1e-12


# ---------------------------------------------------------------------------
# multi-host runtime layer (parallel/runtime.py)
# ---------------------------------------------------------------------------


def test_solver_mesh_shapes_and_order():
    from meshlessmultigridpoisson_tpu.parallel import solver_mesh
    from meshlessmultigridpoisson_tpu.parallel.runtime import AXIS as RAXIS

    m = solver_mesh()
    assert m.axis_names == (RAXIS,)
    assert m.devices.ndim == 1
    # prefix subset preserves jax.devices() (process-major / ICI) order
    m4 = solver_mesh(4)
    assert list(m4.devices) == list(jax.devices()[:4])
    with pytest.raises(ValueError):
        solver_mesh(len(jax.devices()) + 1)


def test_init_distributed_single_process_noop():
    from meshlessmultigridpoisson_tpu.parallel import (
        init_distributed,
        topology_summary,
    )

    assert init_distributed() is False  # no coordinator configured: no-op
    topo = topology_summary()
    assert topo["num_processes"] == 1 and topo["process_id"] == 0
    assert topo["num_devices"] >= 8  # the virtual mesh (conftest)


_DIST_WORKER = r"""
import os, sys
import jax
from meshlessmultigridpoisson_tpu.parallel.runtime import (
    init_distributed, solver_mesh, topology_summary,
)

pid = int(sys.argv[1])
started = init_distributed(
    coordinator_address="localhost:{port}", num_processes=2, process_id=pid)
assert started is True, "multi-process runtime did not start"
# idempotency across the real multi-process path
assert init_distributed(
    coordinator_address="localhost:{port}", num_processes=2,
    process_id=pid) is True
topo = topology_summary()
assert topo["num_processes"] == 2, topo
assert topo["process_id"] == pid, topo
assert topo["num_devices"] == 2, topo   # one CPU device per process
m = solver_mesh()
assert m.devices.shape == (2,)
# a real DCN collective over the 2-process mesh
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
arr = jax.make_array_from_callback(
    (2,), NamedSharding(m, P("points")),
    lambda idx: jnp.asarray([float(pid + 1)]))
tot = jax.jit(jnp.sum, out_shardings=NamedSharding(m, P()))(arr)
assert float(tot) == 3.0, float(tot)
print("OK", pid, flush=True)
"""


@pytest.mark.slow  # interpret-mode / multi-process: minutes each
def test_init_distributed_two_process_smoke(tmp_path):
    """Real 2-process jax.distributed bring-up on CPU (the DCN path the
    virtual mesh can't exercise): both workers initialize against one
    coordinator, see the global 2-device topology, and run a cross-process
    reduction."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:  # free port for the coordinator
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker.py"
    script.write_text(_DIST_WORKER.format(port=port))
    env = dict(os.environ)
    # a clean single-host CPU environment: no virtual-device XLA_FLAGS, no
    # leaked cluster env, and no TPU-tunnel plugin (its sitecustomize
    # interferes with multi-process CPU client bring-up on this rig)
    env.update(JAX_PLATFORMS="cpu", XLA_FLAGS="", JAX_NUM_PROCESSES="",
               JAX_COORDINATOR_ADDRESS="", JAX_PROCESS_ID="",
               PALLAS_AXON_POOL_IPS="")
    env = {k: v for k, v in env.items() if v != ""}
    env["PYTHONPATH"] = "/root/repo"
    procs = [
        subprocess.Popen([sys.executable, str(script), str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         env=env, cwd="/root/repo", text=True)
        for i in range(2)
    ]
    outs = []
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"OK {i}" in out, out


def test_shard_v8_colored_tables_fixed_point(mesh):
    """Round-5: the partitioner also builds uniform per-shard v8 colored
    tables when every shard admits them (>= 32 blocks/shard).  Validate
    the interior colored sweep's FIXED POINT per shard in interpret mode:
    with b = A x_ext (halo zeros) one sweep must return x unchanged —
    dx = K r = 0 iff r = 0, masked frontier rows never move.  Colored-
    order exactness itself is oracle-tested in tests/test_kernels8.py."""
    from jax.experimental.pallas import tpu as pltpu
    from meshlessmultigridpoisson_tpu.ops.kernels8 import (
        permute_b8,
        sor_sweep_tpu8,
    )
    from meshlessmultigridpoisson_tpu.parallel import sharded as sh
    from meshlessmultigridpoisson_tpu.parallel.partition import hierarchy_to_f32

    prob = make_poisson_problem(
        "square", sizes=[2500, 10000], poly_deg=3, k1=1, neumann=True,
        ordering="kdtile",
    )
    shier = hierarchy_to_f32(partition_hierarchy(prob.hierarchy, 2, kernels=True))
    f = shier.fine
    assert f.has_kernels
    assert f.k8_vals is not None, "v8 shard tables failed to build"
    rng = np.random.default_rng(0)
    ns, nb = f.shard_rows, f.shard_rows // 128
    ext_pad = -(-f.ext_rows // 128) * 128
    for s in range(f.num_shards):
        fs = jax.tree_util.tree_map(lambda a: a[s], f)
        c8 = sh._c8_of(fs)
        x_ext = np.zeros(ext_pad, np.float32)
        x_ext[:ns] = rng.standard_normal(ns).astype(np.float32)
        b = np.sum(np.asarray(fs.vals, np.float32)
                   * x_ext[np.asarray(fs.lcols_ext)], axis=-1)
        with pltpu.force_tpu_interpret_mode():
            b8 = permute_b8(c8, jnp.asarray(b.reshape(nb, 128)))
            out = np.asarray(sor_sweep_tpu8(
                c8, jnp.asarray(x_ext.reshape(-1, 128)),
                jnp.zeros((), jnp.float32), b8))
        np.testing.assert_allclose(
            out.reshape(-1)[:ns], x_ext[:ns], rtol=0, atol=2e-3)
