"""Checkpoint/bundle round-trips (SURVEY.md section 5 checkpoint subsystem)."""

import numpy as np
import jax.numpy as jnp

from meshlessmultigridpoisson_tpu.io import save_bundle, load_bundle, save_state, load_state
from meshlessmultigridpoisson_tpu.io.bundle import write_vector_txt, read_vector_txt
from meshlessmultigridpoisson_tpu.models.poisson import make_poisson_problem
from meshlessmultigridpoisson_tpu.mg.vcycle import run_v_cycles


def test_bundle_and_state_roundtrip(tmp_path):
    prob = make_poisson_problem("square", sizes=[200, 700], poly_deg=3, k1=1)
    bpath = str(tmp_path / "bundle.npz")
    save_bundle(bpath, prob.hierarchy)
    hier2 = load_bundle(bpath)
    assert hier2.num_levels == prob.hierarchy.num_levels
    assert np.array_equal(
        np.asarray(hier2.finest.A.vals), np.asarray(prob.hierarchy.finest.A.vals)
    )

    # resume: run 5 cycles, checkpoint, run 5 more from the restored state
    state, _ = run_v_cycles(prob.hierarchy, prob.state0, 5)
    spath = str(tmp_path / "state.npz")
    save_state(spath, state)
    state2 = load_state(spath)
    a, _ = run_v_cycles(prob.hierarchy, state, 5)
    b, _ = run_v_cycles(hier2, state2, 5)
    assert np.allclose(np.asarray(a.x[-1]), np.asarray(b.x[-1]), atol=1e-13)


def test_txt_vector_roundtrip(tmp_path):
    v = np.linspace(0, 1, 17)
    p = str(tmp_path / "v.txt")
    write_vector_txt(v, p)
    assert np.allclose(read_vector_txt(p), v)
