"""v6 segment-ragged kernel tests: layout invariants + INTERPRET-MODE
oracles.

Unlike test_kernels4 (host-side layout math only), these run the actual
Pallas kernels in interpreter mode on CPU, asserting

  * spmv_tpu6 == the windowed-ELL XLA oracle (ops/ell.spmv) in f32, and
  * sor_sweep_tpu6 == the one-shot Gauss-Seidel reference recurrence
    x + K (b - A x - lag*xl) applied block-by-block in storage order with
    fresh earlier-block values (exactly reference grid.cpp:104-146 under
    the (block, class, slot) permutation),

so kernel regressions are caught in CI without a live TPU
(scripts/verify_tpu.py remains the on-device check).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.sparse as sp
from jax.experimental.pallas import tpu as pltpu

from meshlessmultigridpoisson_tpu.ops.ell import ell_from_csr, spmv
from meshlessmultigridpoisson_tpu.ops import kernels6 as K6
from meshlessmultigridpoisson_tpu.ops.kernels4 import build_oneshot_K


@pytest.fixture(scope="module")
def pattern():
    from scipy.spatial import cKDTree
    from meshlessmultigridpoisson_tpu.geometry.ordering import kd_tile_ordering

    n_side, k = 36, 28  # 1296 rows -> 11 blocks (exercises the MB tail)
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
                                  max_segments=3)


def test_segments_cover_blocks(kell):
    covered = 0
    for sg in kell.segments:
        assert sg.block_base == covered or covered > kell.nblocks
        assert sg.nblocks % K6.MB == 0
        covered = sg.block_base + sg.nblocks
    assert covered >= kell.nblocks


def test_tile_row_patch_invariant(kell):
    for sg in kell.segments:
        lc = np.asarray(sg.lcols).astype(np.int32)
        hi = lc >> 7
        assert (hi == hi[:, :1]).all(), "tile row reads more than one patch"
        assert hi.max() < kell.gmax


def test_spmv6_interpret_matches_oracle(pattern, kell):
    ell = ell_from_csr(pattern, block_rows=128)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal(ell.nrows_pad), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        y = np.asarray(K6.spmv_tpu6(kell, x))
    yref = np.asarray(spmv(ell.astype(jnp.float32), x))
    np.testing.assert_allclose(y[: ell.nrows], yref[: ell.nrows],
                               rtol=2e-5, atol=1e-5)


def _oneshot_oracle(ell, kinvT, x2, xl, b2, lagc2):
    """numpy reference: per block in storage order, with fresh earlier
    blocks, x_b += K_b (b_b - (A x)_b - lagc_b * xl)."""
    from meshlessmultigridpoisson_tpu.ops.ell import global_cols

    gcols = np.asarray(global_cols(ell))
    vals = np.asarray(ell.vals, np.float64)
    x = np.asarray(x2, np.float64).reshape(-1)
    b = np.asarray(b2, np.float64).reshape(-1)
    lagc = np.asarray(lagc2, np.float64).reshape(-1)
    K = np.asarray(kinvT, np.float64)  # [nb,128,128] TRANSPOSED
    nb = x.size // 128
    for bi in range(nb):
        sl = slice(bi * 128, (bi + 1) * 128)
        y = (vals[sl] * x[gcols[sl]]).sum(axis=1)
        tvec = b[sl] - y - lagc[sl] * xl
        x[sl] = x[sl] + tvec @ K[bi]
    return x


def test_sweep6_interpret_matches_oneshot_oracle(pattern, kell):
    ell = ell_from_csr(pattern, block_rows=128)
    rng = np.random.default_rng(7)
    nb = kell.nblocks
    omega = np.full(ell.nrows_pad, 1.4)
    smask = np.ones(ell.nrows_pad)
    smask[: ell.nrows // 7] = 0.0  # some non-smoothed rows
    kinvT = build_oneshot_K(ell, omega, smask)
    kinv_sg = K6.pack_oneshot_K6(kell, kinvT)
    x2 = jnp.asarray(rng.standard_normal((nb, 128)), jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((nb, 128)), jnp.float32)
    lagc2 = jnp.asarray(rng.standard_normal((nb, 128)) * 0.01, jnp.float32)
    xl = 0.37
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(K6.sor_sweep_tpu6(
            kell, kinv_sg, x2, jnp.asarray(xl, jnp.float32), b2, lagc2))
    ref = _oneshot_oracle(ell, kinvT, x2, xl, b2, lagc2)
    np.testing.assert_allclose(out.reshape(-1), ref, rtol=3e-4, atol=3e-4)
    # masked rows never move
    moved = np.abs(out.reshape(-1) - np.asarray(x2).reshape(-1))
    assert moved[: ell.nrows // 7].max() == 0.0


def test_production_default_block_rows_256(pattern):
    """The production layout (build_level_operator defaults block_rows=256)
    through BOTH v6 kernels vs their oracles — guards the 256-row packing
    that no other test exercises (advisor round-1 finding)."""
    ell = ell_from_csr(pattern, block_rows=256)
    kell = K6.prepare_kernel_ell6(ell, max_segments=3)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal(ell.nrows_pad), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        y = np.asarray(K6.spmv_tpu6(kell, x))
    yref = np.asarray(spmv(ell.astype(jnp.float32), x))
    np.testing.assert_allclose(y[: ell.nrows], yref[: ell.nrows],
                               rtol=2e-5, atol=1e-5)

    nb = ell.nrows_pad // 128
    omega = np.full(ell.nrows_pad, 1.4)
    smask = np.ones(ell.nrows_pad)
    smask[: ell.nrows // 5] = 0.0
    kinvT = build_oneshot_K(ell, omega, smask)
    kinv_sg = K6.pack_oneshot_K6(kell, kinvT)
    x2 = jnp.asarray(rng.standard_normal((nb, 128)), jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((nb, 128)), jnp.float32)
    lagc2 = jnp.asarray(rng.standard_normal((nb, 128)) * 0.01, jnp.float32)
    xl = -0.21
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(K6.sor_sweep_tpu6(
            kell, kinv_sg, x2, jnp.asarray(xl, jnp.float32), b2, lagc2))
    ref = _oneshot_oracle(ell, kinvT, x2, xl, b2, lagc2)
    np.testing.assert_allclose(out.reshape(-1), ref, rtol=3e-4, atol=3e-4)


def test_sweep6_fixed_point(pattern, kell):
    """At the exact solution the sweep is a no-op (fixed-point exactness,
    independent of K precision)."""
    ell = ell_from_csr(pattern, block_rows=128)
    rng = np.random.default_rng(9)
    nb = kell.nblocks
    kinvT = build_oneshot_K(ell, np.full(ell.nrows_pad, 1.4),
                            np.ones(ell.nrows_pad))
    kinv_sg = K6.pack_oneshot_K6(kell, kinvT)
    xsol = rng.standard_normal(ell.nrows_pad)
    b = np.asarray(spmv(ell.astype(jnp.float64), jnp.asarray(xsol)))
    x2 = jnp.asarray(xsol.reshape(nb, 128), jnp.float32)
    b2 = jnp.asarray(b.reshape(nb, 128), jnp.float32)
    lagc2 = jnp.zeros((nb, 128), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(K6.sor_sweep_tpu6(
            kell, kinv_sg, x2, jnp.zeros((), jnp.float32), b2, lagc2))
    # f32 representation of the fixed point moves only at rounding level
    np.testing.assert_allclose(out, np.asarray(x2), rtol=0, atol=5e-4)


def test_sweep7_union_matches_sweep6(pattern, kell):
    """v7 union-scratch sweep == v6 sweep (same GS arithmetic, hoisted x
    loads) on the multi-segment layout, including the MB tail guard."""
    ell = ell_from_csr(pattern, block_rows=128)
    rng = np.random.default_rng(11)
    nb = kell.nblocks
    kinvT = build_oneshot_K(ell, np.full(ell.nrows_pad, 1.4),
                            np.ones(ell.nrows_pad))
    kinv_sg = K6.pack_oneshot_K6(kell, kinvT)
    union = K6.union_sweep_tables(kell)
    assert union.g8max % 8 == 0 and union.g8max <= 32
    x2 = jnp.asarray(rng.standard_normal((nb, 128)), jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((nb, 128)), jnp.float32)
    lagc2 = jnp.asarray(rng.standard_normal((nb, 128)) * 0.01, jnp.float32)
    xl = jnp.asarray(0.37, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out6 = np.asarray(K6.sor_sweep_tpu6(kell, kinv_sg, x2, xl, b2, lagc2))
        out7 = np.asarray(K6.sor_sweep_tpu7(
            kell, union, kinv_sg, x2, xl, b2, lagc2))
    scale = max(np.abs(out6).max(), 1.0)
    np.testing.assert_allclose(out7, out6, rtol=0, atol=1e-6 * scale)


def test_sweep7_single_segment(pattern):
    """v7 on the single-segment production layout (max_segments=1)."""
    ell = ell_from_csr(pattern, block_rows=128)
    kell1 = K6.prepare_kernel_ell6(ell, max_segments=1)
    assert len(kell1.segments) == 1
    rng = np.random.default_rng(12)
    nb = kell1.nblocks
    kinvT = build_oneshot_K(ell, np.full(ell.nrows_pad, 1.4),
                            np.ones(ell.nrows_pad))
    kinv_sg = K6.pack_oneshot_K6(kell1, kinvT)
    union = K6.union_sweep_tables(kell1)
    x2 = jnp.asarray(rng.standard_normal((nb, 128)), jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((nb, 128)), jnp.float32)
    lagc2 = jnp.zeros((nb, 128), jnp.float32)
    xl = jnp.asarray(0.0, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out7 = np.asarray(K6.sor_sweep_tpu7(
            kell1, union, kinv_sg, x2, xl, b2, lagc2))
    ref = _oneshot_oracle(ell, kinvT, x2, 0.0, b2, lagc2)
    np.testing.assert_allclose(out7.reshape(-1), ref, rtol=3e-4, atol=3e-4)


@pytest.fixture(scope="module")
def wide_pattern():
    """Banded matrix + long-range couplings so blocks touch > 16 x-patches
    (the condensation/boundary-row regime at 100k+ rows that used to force
    the v2 fallback).  33 blocks so the whole-space patch count (33)
    exceeds the old GMAX=16 bound."""
    n = 33 * 128
    rng = np.random.default_rng(17)
    rows, cols, vals = [], [], []
    band = np.arange(-4, 5)
    for r in range(n):
        cc = np.clip(r + band, 0, n - 1)
        rows.extend([r] * cc.size)
        cols.extend(cc.tolist())
        v = rng.standard_normal(cc.size)
        v[4] = 20.0  # strong diagonal
        vals.extend(v.tolist())
        if r % 4 == 0:  # long-range couplings across many patches
            far = rng.choice(n, size=20, replace=False)
            rows.extend([r] * far.size)
            cols.extend(far.tolist())
            vals.extend((rng.standard_normal(far.size) * 0.1).tolist())
    a = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    a.sum_duplicates()
    return a


def test_wide_pattern_needs_gmax_banks(wide_pattern):
    ell = ell_from_csr(wide_pattern, block_rows=128)
    kell = K6.prepare_kernel_ell6(ell, max_segments=1)
    assert kell.gmax > K6.GMAX and kell.gmax % 8 == 0
    # layout invariant holds in the widened patch space
    for sg in kell.segments:
        hi = np.asarray(sg.lcols).astype(np.int32) >> 7
        assert (hi == hi[:, :1]).all()
        assert hi.max() < kell.gmax


def test_spmv6_wide_gmax_matches_oracle(wide_pattern):
    ell = ell_from_csr(wide_pattern, block_rows=128)
    kell = K6.prepare_kernel_ell6(ell, max_segments=1)
    rng = np.random.default_rng(19)
    x = jnp.asarray(rng.standard_normal(ell.nrows_pad), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        y = np.asarray(K6.spmv_tpu6(kell, x))
    yref = np.asarray(spmv(ell.astype(jnp.float32), x))
    np.testing.assert_allclose(y[: ell.nrows], yref[: ell.nrows],
                               rtol=2e-5, atol=1e-5)


def test_sweep6_wide_gmax_matches_oracle(wide_pattern):
    ell = ell_from_csr(wide_pattern, block_rows=128)
    kell = K6.prepare_kernel_ell6(ell, max_segments=1)
    rng = np.random.default_rng(23)
    nb = kell.nblocks
    kinvT = build_oneshot_K(ell, np.full(ell.nrows_pad, 1.4),
                            np.ones(ell.nrows_pad))
    kinv_sg = K6.pack_oneshot_K6(kell, kinvT)
    x2 = jnp.asarray(rng.standard_normal((nb, 128)), jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((nb, 128)), jnp.float32)
    lagc2 = jnp.zeros((nb, 128), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(K6.sor_sweep_tpu6(
            kell, kinv_sg, x2, jnp.asarray(0.0, jnp.float32), b2, lagc2))
    ref = _oneshot_oracle(ell, kinvT, x2, 0.0, b2, lagc2)
    np.testing.assert_allclose(out.reshape(-1), ref, rtol=3e-4, atol=3e-4)


def test_pad_gmax_roundtrip(pattern):
    ell = ell_from_csr(pattern, block_rows=128)
    kell = K6.prepare_kernel_ell6(ell, max_segments=1)
    padded = K6.pad_gmax(kell, kell.gmax + 16)
    assert padded.gmax == kell.gmax + 16
    rng = np.random.default_rng(29)
    x = jnp.asarray(rng.standard_normal(ell.nrows_pad), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        y0 = np.asarray(K6.spmv_tpu6(kell, x))
        y1 = np.asarray(K6.spmv_tpu6(padded, x))
    np.testing.assert_array_equal(y0, y1)
