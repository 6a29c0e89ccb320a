"""Chained-iteration timing harness (round 2).

The axon tunnel adds a per-jitted-call cost that scales with input/output
buffer sizes (measured: a single 2048^3 bf16 matmul "takes" 28 ms while 16
chained in one jit take 0.4 ms each).  Solver workloads run many kernel
applications back-to-back inside one jit, so the honest per-op number is

    t_op = (T(K) - T(1)) / (K - 1)

with T(k) the wall time of ONE jitted call that applies the op k times,
dependency-chained, returning a tiny (<=128 floats) output.  Both calls
carry identical input buffers, so upload/readback and dispatch cancel.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def _bump(x):
    """Cheap dependency bump to prevent CSE across chain iterations."""
    if isinstance(x, jnp.ndarray) and x.dtype in (jnp.float32, jnp.bfloat16):
        return x * 1.0000001
    return x


def chain_time(op, x0, *static_args, k: int = 16, reps: int = 5,
               feed=None, shrink=None):
    """Median wall time per op application via chained delta timing.

    op(x, *static_args) -> y ; ``feed`` maps y -> next x (default identity);
    ``shrink`` maps final y -> tiny output (default: flatten + first 128).
    """
    feed = feed or (lambda y: y)
    if shrink is None:
        def shrink(y):
            f = y.reshape(-1) if hasattr(y, "reshape") else y
            return f[:128] * 1.0

    def make(n):
        def f(x, *sa):
            y = op(x, *sa)
            for _ in range(n - 1):
                y = op(feed(y), *sa)
            return shrink(y)
        return jax.jit(f)

    f1, fk = make(1), make(k)
    # warm both
    np.asarray(f1(x0, *static_args))
    np.asarray(fk(x0, *static_args))

    def t(f):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(f(x0, *static_args))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t1, tk = t(f1), t(fk)
    return max(tk - t1, 1e-9) / (k - 1), t1


if __name__ == "__main__":
    import sys
    sys.path.insert(0, "/root/repo")

    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    # --- matmul sanity: true MXU rate ---
    for m in (2048, 4096):
        x = jnp.ones((m, m), jnp.bfloat16)
        w = jnp.eye(m, dtype=jnp.bfloat16)
        dt, t1 = chain_time(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.bfloat16),
                            x, w, k=32)
        print(f"bf16 matmul {m}^3: {dt*1e3:8.3f} ms  {2*m**3/dt/1e12:7.1f} TFLOP/s"
              f"   (single-call {t1*1e3:.1f} ms)", flush=True)

    # --- elementwise stream: y = x * c  (read+write 2x size) ---
    for sz_mb in (64, 256):
        n = sz_mb << 18  # f32 elements
        x = jnp.ones((n,), jnp.float32)
        dt, t1 = chain_time(lambda a: a * 1.000001, x, k=16)
        print(f"xla mul {sz_mb}MB: {dt*1e3:8.3f} ms  {2*n*4/dt/1e9:7.1f} GB/s"
              f"   (single-call {t1*1e3:.1f} ms)", flush=True)

    # --- pallas stream kernel over big tables ---
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    LANES = 128

    def make_stream(total_tiles, tpp, k):
        """One pallas_call whose grid re-streams the tables k times."""
        def kern(v_ref, c_ref, o_ref):
            s = jnp.sum(v_ref[...], axis=0, keepdims=True) + jnp.sum(
                c_ref[...], axis=0, keepdims=True, dtype=jnp.int32
            ).astype(jnp.float32)
            o_ref[...] = jnp.broadcast_to(s, o_ref.shape)
        grid = total_tiles // tpp
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((grid * 8, LANES), jnp.float32),
            grid=(k, grid),
            in_specs=[
                pl.BlockSpec((tpp, LANES), lambda r, i: (i, np.int32(0))),
                pl.BlockSpec((tpp, LANES), lambda r, i: (i, np.int32(0))),
            ],
            out_specs=pl.BlockSpec((8, LANES), lambda r, i: (i, np.int32(0))),
        )

    import time as _t
    tiles = 1 << 18  # 256 MB of f32+i32
    for tpp in (256, 1024, 4096):
        v = jnp.ones((tiles, LANES), jnp.float32)
        c = jnp.ones((tiles, LANES), jnp.int32)
        ts = {}
        for k in (1, 9):
            f = jax.jit(make_stream(tiles, tpp, k))
            np.asarray(f(v, c))
            tt = []
            for _ in range(5):
                t0 = _t.perf_counter()
                np.asarray(f(v, c))
                tt.append(_t.perf_counter() - t0)
            ts[k] = float(np.median(tt))
        dt = (ts[9] - ts[1]) / 8
        gb = tiles * LANES * 8 / dt / 1e9
        print(f"pallas stream tpp={tpp:5d}: {dt*1e3:8.3f} ms/pass  {gb:7.1f} GB/s"
              f"   (single-call {ts[1]*1e3:.1f} ms)", flush=True)
