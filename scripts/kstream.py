"""Stream-ceiling calibration probe (VERDICT r3 weak #2 / next #3).

The round-3 ceiling kernel (bench.py stream_ceiling) measured 591 GB/s
while the production SpMV measured 618 GB/s on the same device — the
"ceiling" was not a ceiling, so every %-of-stream number was uncalibrated.

This probe times a family of pure-stream Pallas kernels to find the
genuinely achievable HBM read bandwidth for the kernels' access pattern
(sequentially streamed multi-hundred-MB tables, tiny compute, tiny
output):

  f32i32_sum   — the old bench.py kernel (f32 + i32 tables, both summed)
  f32f32_sum   — two f32 tables, both summed
  f32_sum      — one f32 table, summed
  f32i16       — f32 vals + i16 cols (the production SpMV's actual mix),
                 i16 table touched via a cheap select
  variants x tile rows per program in {1024, 2048, 4096, 8192}

Run: PYTHONPATH=/root/repo python scripts/kstream.py
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


def make_stream(kind, tpp, tiles, k):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    LANES = 128
    grid = tiles // tpp

    if kind in ("f32i32_sum", "f32f32_sum", "f32i16"):
        nin = 2
    else:
        nin = 1

    def kern(*refs):
        o_ref = refs[-1]
        v = refs[0]
        s = jnp.sum(v[...], axis=0, keepdims=True)
        if kind == "f32i32_sum":
            s = s + jnp.sum(refs[1][...], axis=0, keepdims=True,
                            dtype=jnp.int32).astype(jnp.float32)
        elif kind == "f32f32_sum":
            s = s + jnp.sum(refs[1][...], axis=0, keepdims=True)
        elif kind == "f32i16":
            c = refs[1][...]
            s = s + jnp.sum(
                jnp.where(c[:1, :] > jnp.int16(0), v[:1, :], 0.0),
                axis=0, keepdims=True)
        o_ref[...] = jnp.broadcast_to(s, o_ref.shape)

    in_specs = [pl.BlockSpec((tpp, LANES), lambda r, i: (i, np.int32(0)))
                for _ in range(nin)]
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((grid * 8, LANES), jnp.float32),
        grid=(k, grid),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((8, LANES), lambda r, i: (i, np.int32(0))),
    )
    return jax.jit(f), nin


def run(kind, tpp, tiles=1 << 18, k=9):
    import jax
    import jax.numpy as jnp

    LANES = 128
    v = jnp.ones((tiles, LANES), jnp.float32)
    if kind == "f32i32_sum":
        c = jnp.ones((tiles, LANES), jnp.int32)
        nbytes = tiles * LANES * 8
    elif kind == "f32f32_sum":
        c = jnp.ones((tiles, LANES), jnp.float32)
        nbytes = tiles * LANES * 8
    elif kind == "f32i16":
        c = jnp.ones((tiles, LANES), jnp.int16)
        nbytes = tiles * LANES * 6
    else:
        c = None
        nbytes = tiles * LANES * 4
    f, nin = make_stream(kind, tpp, tiles, 1)
    fk, _ = make_stream(kind, tpp, tiles, k)
    args = (v,) if nin == 1 else (v, c)
    t1 = bench._med_call(f, *args)
    tk = bench._med_call(fk, *args)
    dt = max(tk - t1, 1e-9) / (k - 1)
    gb = nbytes / dt / 1e9
    print(f"{kind:12s} tpp={tpp:5d}  {dt*1e3:7.3f} ms  {gb:6.1f} GB/s",
          flush=True)
    return gb


def main():
    import jax

    print(f"device: {jax.devices()[0]}", flush=True)
    best = 0.0
    for kind in ("f32i32_sum", "f32f32_sum", "f32_sum", "f32i16"):
        # VMEM: 2 double-buffered inputs at tpp=8192 blow the 16 MB core
        # budget, so the 2-input kinds stop at 4096
        tpps = (1024, 2048, 4096) if kind != "f32_sum" else (
            1024, 2048, 4096, 8192)
        for tpp in tpps:
            best = max(best, run(kind, tpp))
    print(f"best: {best:.1f} GB/s  ({100*best/819:.0f}% of 819 GB/s spec)",
          flush=True)


if __name__ == "__main__":
    main()
