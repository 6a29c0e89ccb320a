"""v4 window-aligned layout tests (pure JAX/host; device runs in scripts/).

The v4 kernels' two-stage gather (sublane patch select, then lane gather)
is only correct if every [1,128] tile row reads exactly ONE x patch —
including padding lanes, because a real entry's lane gather may land on a
padding lane's sublane index.  These tests pin that invariant and check the
gather math (`_gather_block`, identical inside the Pallas kernels) against
scipy on a realistic RBF-FD pattern.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

from meshlessmultigridpoisson_tpu.ops.ell import ell_from_csr
from meshlessmultigridpoisson_tpu.ops import kernels4 as K4


@pytest.fixture(scope="module")
def pattern():
    from scipy.spatial import cKDTree
    from meshlessmultigridpoisson_tpu.geometry.ordering import kd_tile_ordering

    n_side, k = 32, 28
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


def test_tile_row_patch_invariant(pattern):
    for split in (False, True):
        k4 = K4.prepare_kernel_ell4(ell_from_csr(pattern, block_rows=128),
                                    split_inblock=split)
        lc = np.asarray(k4.lcols_flat)
        hi = lc >> 7
        assert (hi == hi[:, :1]).all(), "tile row reads more than one patch"
        assert hi.max() < K4.GMAX


def _host_spmv4(k4, x0, n):
    """Row sums via the packed layout, straight numpy."""
    T = k4.tiles_per_block
    x2 = np.zeros(k4.x_rows * 128)
    x2[:n] = x0
    x2 = x2.reshape(k4.x_rows, 128)
    v = np.asarray(k4.vals_flat, np.float64)
    lc = np.asarray(k4.lcols_flat)
    pids = np.asarray(k4.pids).reshape(-1, K4.GMAX)
    perm = np.asarray(k4.perm)
    y = np.zeros((k4.nblocks, 128))
    for b in range(k4.nblocks):
        scratch = x2[pids[b]]
        prod = v[b * T : (b + 1) * T] * scratch[
            lc[b * T : (b + 1) * T] >> 7, lc[b * T : (b + 1) * T] & 127
        ]
        ygrp = np.zeros(128)
        for t in range(T):
            g = t // k4.windows
            np.add.at(ygrp, g * 16 + np.arange(128) // 8, prod[t])
        y[b] = ygrp[perm[b]]
    return y.reshape(-1)[:n]


def test_gather_block_matches_scipy(pattern):
    n = pattern.shape[0]
    ell = ell_from_csr(pattern, block_rows=128)
    k4 = K4.prepare_kernel_ell4(ell, dtype=jnp.float64)
    rng = np.random.default_rng(5)
    x0 = rng.standard_normal(n)
    yref = pattern @ x0

    assert np.allclose(_host_spmv4(k4, x0, n), yref, atol=1e-10)

    T = k4.tiles_per_block
    x2 = np.zeros(k4.x_rows * 128)
    x2[:n] = x0
    x2 = x2.reshape(k4.x_rows, 128)
    pids = np.asarray(k4.pids).reshape(-1, K4.GMAX)
    perm = np.asarray(k4.perm)
    selr2 = jnp.asarray(K4._selr2(np.float64))
    gmask = jnp.asarray(K4._gmask(T, k4.windows, np.float64))
    ones_t = jnp.ones((1, T), jnp.float64)
    for b in range(k4.nblocks):
        yg = K4._gather_block(
            jnp.asarray(x2[pids[b]]),
            k4.lcols_flat[b * T : (b + 1) * T],
            k4.vals_flat[b * T : (b + 1) * T],
            selr2, gmask, ones_t,
        )
        got = np.asarray(yg)[0][perm[b]]
        want = yref[b * 128 : (b + 1) * 128]
        want = np.pad(want, (0, 128 - want.size))
        assert np.allclose(got[: want.size], want, atol=1e-9)


def test_split_inblock_partition(pattern):
    """split=True: abbT + off-block windows exactly partition A (minus diag)."""
    n = pattern.shape[0]
    ell = ell_from_csr(pattern, block_rows=128)
    k4 = K4.prepare_kernel_ell4(ell, split_inblock=True, dtype=jnp.float64)
    rng = np.random.default_rng(6)
    x0 = rng.standard_normal(n)
    y_off = _host_spmv4(k4, x0, n)
    abbT = np.asarray(k4.abbT, np.float64)
    x2 = np.pad(x0, (0, k4.nrows_pad - n)).reshape(k4.nblocks, 128)
    y_in = np.einsum("bj,bij->bi", x2, abbT.transpose(0, 2, 1)).reshape(-1)[:n]
    d = np.asarray(ell.diag)[:n]
    assert np.allclose(y_off + y_in + d * x0, pattern @ x0, atol=1e-10)


def test_oneshot_K_matches_stepwise_gs(pattern):
    """v5: x += K (b - A x) equals the explicit (block, class) GS sweep."""
    n = pattern.shape[0]
    ell = ell_from_csr(pattern, block_rows=128)
    n_pad = ell.nrows_pad
    a = sp.csr_matrix(pattern, copy=True)
    a.resize((n_pad, n_pad))
    ad = a.toarray()
    np.fill_diagonal(ad, np.where(np.diag(ad) == 0, 1.0, np.diag(ad)))
    d = np.diag(ad)

    rng = np.random.default_rng(9)
    w = 1.4 * rng.uniform(0.5, 1.0, n_pad)
    mask = rng.uniform(size=n_pad) > 0.1
    mask[n:] = False
    b = rng.standard_normal(n_pad)
    x0 = rng.standard_normal(n_pad)

    # stepwise (block=128, class=8) GS, reference semantics
    x_ref = x0.copy()
    for blk in range(n_pad // 128):
        for c in range(16):
            rows = np.arange(blk * 128 + c * 8, blk * 128 + (c + 1) * 8)
            y = ad[rows] @ x_ref
            xi = (1 - w[rows]) * x_ref[rows] + (w[rows] / d[rows]) * (
                b[rows] - y + d[rows] * x_ref[rows]
            )
            x_ref[rows] = np.where(mask[rows], xi, x_ref[rows])

    K_T = K4.build_oneshot_K(ell, w, mask.astype(np.float64))
    x_new = x0.copy()
    for blk in range(n_pad // 128):
        rows = slice(blk * 128, (blk + 1) * 128)
        t = b[rows] - ad[rows] @ x_new
        x_new[rows] = x_new[rows] + t @ K_T[blk]

    assert np.allclose(x_new, x_ref, atol=1e-10)
