"""v8 colored-sweep tests: coloring validity + interpret-mode oracle.

The v8 sweep is exact (block, class)-GS under the COLORED block order
(ops/kernels8.py module docstring) — the oracle here applies the one-shot
recurrence x_b += K_b (b_b - (A x)_b - lagc_b * xl) block-by-block in that
order (duplicate padding slots collapse to one update, which the numpy
oracle reproduces by deduplicating).
"""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse as sp
from jax.experimental.pallas import tpu as pltpu

from meshlessmultigridpoisson_tpu.ops.ell import ell_from_csr, global_cols, spmv
from meshlessmultigridpoisson_tpu.ops import kernels6 as K6
from meshlessmultigridpoisson_tpu.ops import kernels8 as K8
from meshlessmultigridpoisson_tpu.ops.kernels4 import build_oneshot_K

# whole module runs in ~20 s on the CPU mesh — stays in the default set


@pytest.fixture(scope="module")
def pattern():
    from scipy.spatial import cKDTree
    from meshlessmultigridpoisson_tpu.geometry.ordering import kd_tile_ordering

    n_side, k = 36, 28
    rng = np.random.default_rng(3)
    xy = np.stack(
        np.meshgrid(np.arange(n_side), np.arange(n_side), indexing="ij"), -1
    ).reshape(-1, 2).astype(np.float64)
    xy += rng.uniform(-0.3, 0.3, xy.shape)
    xy = xy[kd_tile_ordering(xy, leaf=128)]
    nbr = cKDTree(xy).query(xy, k=k)[1]
    n = xy.shape[0]
    vals = rng.standard_normal((n, k))
    vals[:, 0] = k + 1.0
    rows = np.repeat(np.arange(n), k)
    a = sp.coo_matrix((vals.ravel(), (rows, nbr.ravel())), shape=(n, n)).tocsr()
    a.sum_duplicates()
    return a


@pytest.fixture(scope="module")
def kell(pattern):
    return K6.prepare_kernel_ell6(ell_from_csr(pattern, block_rows=128),
                                  max_segments=1)


@pytest.fixture(scope="module")
def colored(pattern, kell):
    ell = ell_from_csr(pattern, block_rows=128)
    kinvT = build_oneshot_K(ell, np.full(ell.nrows_pad, 1.4),
                            np.ones(ell.nrows_pad))
    lagc2 = np.random.default_rng(5).standard_normal(
        (kell.nblocks, 128)).astype(np.float32) * 0.01
    # max_expand relaxed: the 11-block fixture pads heavily at mb=8 (the
    # guard is an efficiency bound for production sizes, not correctness)
    c8 = K8.prepare_colored_sweep(kell, kinvT, lagc2, max_expand=4.0, min_blocks=2)
    return c8, kinvT, lagc2


def test_coloring_is_proper(kell, colored):
    c8, _, _ = colored
    pids = np.asarray(kell.pids).reshape(kell.nblocks, kell.gmax)
    colors = K8.color_blocks(pids, kell.nblocks)
    assert colors.min() >= 0
    # no block shares a color with a block whose x rows it reads
    for b in range(kell.nblocks):
        for p in np.unique(pids[b]):
            if int(p) != b and int(p) < kell.nblocks:
                assert colors[b] != colors[p], (b, int(p))
    assert c8.ncolors == colors.max() + 1


def test_program_slots_are_same_color_and_cover(kell, colored):
    c8, _, _ = colored
    pids = np.asarray(kell.pids).reshape(kell.nblocks, kell.gmax)
    colors = K8.color_blocks(pids, kell.nblocks)
    blkid = c8.block_order().reshape(c8.nprog, c8.mb)
    for p in range(c8.nprog):
        assert len(set(colors[blkid[p]])) == 1, f"program {p} mixes colors"
    assert set(c8.block_order()) == set(range(kell.nblocks))
    # slot j holds block j's own x row
    pids8 = np.asarray(c8.pids8).reshape(c8.nprog, c8.g8max)
    np.testing.assert_array_equal(pids8[:, :c8.mb], blkid)


def _colored_oracle(ell, kinvT, order, x2, xl, b2, lagc2):
    """GS one-shot recurrence in colored order; duplicates skipped."""
    gcols = np.asarray(global_cols(ell))
    vals = np.asarray(ell.vals, np.float64)
    x = np.asarray(x2, np.float64).reshape(-1)
    b = np.asarray(b2, np.float64).reshape(-1)
    lagc = np.asarray(lagc2, np.float64).reshape(-1)
    K = np.asarray(kinvT, np.float64)
    seen = set()
    for bi in order:
        bi = int(bi)
        if bi in seen:
            continue
        seen.add(bi)
        sl = slice(bi * 128, (bi + 1) * 128)
        y = (vals[sl] * x[gcols[sl]]).sum(axis=1)
        tvec = b[sl] - y - lagc[sl] * xl
        x[sl] = x[sl] + tvec @ K[bi]
    return x


def test_sweep8_interpret_matches_colored_oracle(pattern, kell, colored):
    c8, kinvT, lagc2 = colored
    ell = ell_from_csr(pattern, block_rows=128)
    rng = np.random.default_rng(7)
    nb = kell.nblocks
    x2 = jnp.asarray(rng.standard_normal((nb, 128)), jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((nb, 128)), jnp.float32)
    xl = 0.37
    with pltpu.force_tpu_interpret_mode():
        b8 = K8.permute_b8(c8, b2)
        out = np.asarray(K8.sor_sweep_tpu8(
            c8, x2, jnp.asarray(xl, jnp.float32), b8))
    ref = _colored_oracle(ell, kinvT, c8.block_order(), x2, xl, b2, lagc2)
    np.testing.assert_allclose(out.reshape(-1), ref, rtol=3e-4, atol=3e-4)


def test_sweep8_mb4_matches_colored_oracle(pattern, kell):
    """mb=4 programs (the production regime for 2D operators whose 8-block
    unions overflow the scratch) with stride-8 row tables."""
    ell = ell_from_csr(pattern, block_rows=128)
    kinvT = build_oneshot_K(ell, np.full(ell.nrows_pad, 1.4),
                            np.ones(ell.nrows_pad))
    rng = np.random.default_rng(13)
    nb = kell.nblocks
    lagc2 = rng.standard_normal((nb, 128)).astype(np.float32) * 0.01
    c8 = K8.prepare_colored_sweep(kell, kinvT, lagc2, max_expand=6.0, mb=4, min_blocks=2)
    assert c8.mb == 4
    x2 = jnp.asarray(rng.standard_normal((nb, 128)), jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((nb, 128)), jnp.float32)
    xl = -0.21
    with pltpu.force_tpu_interpret_mode():
        b8 = K8.permute_b8(c8, b2)
        out = np.asarray(K8.sor_sweep_tpu8(
            c8, x2, jnp.asarray(xl, jnp.float32), b8))
    ref = _colored_oracle(ell, kinvT, c8.block_order(), x2, xl, b2, lagc2)
    np.testing.assert_allclose(out.reshape(-1), ref, rtol=3e-4, atol=3e-4)


def test_sweep8_fixed_point(pattern, kell):
    ell = ell_from_csr(pattern, block_rows=128)
    rng = np.random.default_rng(9)
    nb = kell.nblocks
    kinvT = build_oneshot_K(ell, np.full(ell.nrows_pad, 1.4),
                            np.ones(ell.nrows_pad))
    lagc2 = np.zeros((nb, 128), np.float32)
    c8 = K8.prepare_colored_sweep(kell, kinvT, lagc2, max_expand=4.0, min_blocks=2)
    xsol = rng.standard_normal(ell.nrows_pad)
    b = np.asarray(spmv(ell.astype(jnp.float64), jnp.asarray(xsol)))
    x2 = jnp.asarray(xsol.reshape(nb, 128), jnp.float32)
    b2 = jnp.asarray(b.reshape(nb, 128), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        b8 = K8.permute_b8(c8, b2)
        out = np.asarray(K8.sor_sweep_tpu8(
            c8, x2, jnp.zeros((), jnp.float32), b8))
    np.testing.assert_allclose(out, np.asarray(x2), rtol=0, atol=5e-4)


def test_spmv8_interpret_matches_reference(pattern, kell, colored):
    """The colored-order SpMV (round 5: shares the sweep tables so v8
    levels carry no separate v6 matvec table) is a pure matvec."""
    from meshlessmultigridpoisson_tpu.ops.ell import spmv

    c8, _, _ = colored
    ell = ell_from_csr(pattern, block_rows=128)
    rng = np.random.default_rng(23)
    x = rng.standard_normal(ell.nrows_pad)
    with pltpu.force_tpu_interpret_mode():
        y = np.asarray(K8.spmv_tpu8(c8, jnp.asarray(x, jnp.float32)))
    yref = np.asarray(spmv(ell.astype(jnp.float64), jnp.asarray(x)))
    scale = np.abs(yref).max()
    np.testing.assert_allclose(y[:yref.size], yref, rtol=0, atol=3e-4 * scale)


def test_sweep8_wide_tier_matches_colored_oracle(pattern, kell):
    """Tier-2 (wide-scratch) selection: when no mb fits ``max_slots``, the
    prep picks the least-gather-work mb under ``max_slots_wide`` instead
    of raising (the round-4 133k fine level needed 136 > 96 slots and
    silently lost v8).  Forced here by shrinking max_slots below the
    fixture's unions; the kernel itself must stay exact."""
    ell = ell_from_csr(pattern, block_rows=128)
    kinvT = build_oneshot_K(ell, np.full(ell.nrows_pad, 1.4),
                            np.ones(ell.nrows_pad))
    rng = np.random.default_rng(17)
    nb = kell.nblocks
    lagc2 = rng.standard_normal((nb, 128)).astype(np.float32) * 0.01
    c8 = K8.prepare_colored_sweep(
        kell, kinvT, lagc2, max_expand=6.0, min_blocks=2,
        max_slots=8, max_slots_wide=96)
    assert c8.g8max > 8  # proves tier 1 could not have produced this
    x2 = jnp.asarray(rng.standard_normal((nb, 128)), jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((nb, 128)), jnp.float32)
    xl = 0.11
    with pltpu.force_tpu_interpret_mode():
        b8 = K8.permute_b8(c8, b2)
        out = np.asarray(K8.sor_sweep_tpu8(
            c8, x2, jnp.asarray(xl, jnp.float32), b8))
    ref = _colored_oracle(ell, kinvT, c8.block_order(), x2, xl, b2, lagc2)
    np.testing.assert_allclose(out.reshape(-1), ref, rtol=3e-4, atol=3e-4)


def test_degenerate_dense_falls_back():
    """A densely coupled operator must raise Ell4Unsupported when its
    program unions overflow the scratch at a FORCED mb (callers keep the
    exact v7 sweep); auto-mb may still fit by shrinking programs."""
    n = 4 * 128
    rng = np.random.default_rng(11)
    k = 12
    nbr = np.stack([
        (np.arange(n) + s * 97) % n for s in range(k)], axis=1)
    nbr[:, 0] = np.arange(n)
    vals = rng.standard_normal((n, k)) * 0.1
    vals[:, 0] = 5.0
    a = sp.coo_matrix(
        (vals.ravel(), (np.repeat(np.arange(n), k), nbr.ravel())),
        shape=(n, n)).tocsr()
    ell = ell_from_csr(a, block_rows=128)
    kell = K6.prepare_kernel_ell6(ell, max_segments=1)
    kinvT = build_oneshot_K(ell, np.full(ell.nrows_pad, 1.4),
                            np.ones(ell.nrows_pad))
    with pytest.raises(K6.Ell4Unsupported):
        K8.prepare_colored_sweep(
            kell, kinvT, np.zeros((kell.nblocks, 128), np.float32), mb=8, min_blocks=2)
