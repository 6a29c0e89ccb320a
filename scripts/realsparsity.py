"""Build a REAL RBF-FD sparsity pattern (kNN on a jittered-grid cloud,
KD-tile ordered) with random values — the representative operator for
kernel benchmarking (the old synthetic band operator is far more scattered
than a true 70-neighbor stencil)."""

import numpy as np


def real_pattern_csr(n_target: int, k: int = 70, seed: int = 0):
    import scipy.sparse as sp
    from scipy.spatial import cKDTree

    from meshlessmultigridpoisson_tpu.geometry.ordering import kd_tile_ordering

    side = int(round(np.sqrt(n_target)))
    n = side * side
    rng = np.random.default_rng(seed)
    xy = np.stack(
        np.meshgrid(np.arange(side), np.arange(side), indexing="ij"), -1
    ).reshape(-1, 2).astype(np.float64)
    xy += rng.uniform(-0.35, 0.35, xy.shape)
    perm = kd_tile_ordering(xy, leaf=128)
    xy = xy[perm]
    tree = cKDTree(xy)
    _, nbr = tree.query(xy, k=k, workers=-1)
    vals = rng.standard_normal((n, k))
    vals[:, 0] = k + 1.0  # self first (tree returns self at distance 0)
    rows = np.repeat(np.arange(n), k)
    a = sp.coo_matrix((vals.ravel(), (rows, nbr.ravel())), shape=(n, n)).tocsr()
    a.sum_duplicates()
    return a


if __name__ == "__main__":
    import sys

    from meshlessmultigridpoisson_tpu.ops.ell import ell_from_csr, global_cols

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    a = real_pattern_csr(n)
    for br in (128, 256):
        ell = ell_from_csr(a, block_rows=br)
        gc = np.asarray(global_cols(ell))
        w0 = ell.width
        s = 8
        kp = -(-w0 * s // 128) * 128 // s
        n_pad = ell.nrows_pad
        nblocks = n_pad // br
        g2 = np.zeros((n_pad, kp), dtype=np.int64)
        g2[:, :w0] = gc
        g2[:, w0:] = g2[:, :1]
        patches = g2 >> 7
        spans, gmax, rowp = [], 0, []
        for i in range(nblocks):
            blk = patches[i * br : (i + 1) * br]
            u = np.unique(blk)
            gmax = max(gmax, u.size)
            lut = {p: j for j, p in enumerate(u)}
            loc = np.vectorize(lut.get)(blk)
            rowp.append(
                (np.diff(np.sort(blk, axis=1), axis=1) != 0).sum(1).mean() + 1
            )
            loc = np.sort(loc, axis=1)
            nc = br // s
            il = loc.reshape(nc, s, kp).transpose(0, 2, 1).reshape(-1, 128)
            ng = il.shape[0] // 8
            grp = il.reshape(ng, 8 * 128)
            spans.append(grp.max(1) - grp.min(1) + 1)
        spans = np.concatenate(spans)
        print(
            f"br={br} w0={w0} kp={kp} G={gmax} rowpatches={np.mean(rowp):.1f} "
            f"span: mean {spans.mean():.2f} p50 {np.percentile(spans,50):.0f} "
            f"p95 {np.percentile(spans,95):.0f} max {spans.max()}"
        )
