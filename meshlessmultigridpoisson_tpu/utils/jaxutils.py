"""Small JAX helpers: CPU-backend setup execution, pytree device moves.

Setup-time numerics (RBF-FD weight solves, condensation) must run in float64;
TPUs lack f64 LU support, so the operator factory executes on the host CPU
backend (under ``on_cpu()``) and only the packed solve-path arrays move to
the accelerator.
"""

from __future__ import annotations

import contextlib

import jax


def cpu_device():
    return jax.devices("cpu")[0]


@contextlib.contextmanager
def on_cpu():
    """Run traced/jitted computation on the host CPU backend.

    Needed because the environment pins ``jax_platforms`` to the TPU plugin;
    ``jax.default_device`` still routes compilation to CPU.
    """
    with jax.default_device(cpu_device()):
        yield


def to_device_tree(tree, device=None, dtype=None, int_dtype=None):
    """Move a pytree of arrays to ``device``, optionally casting floats."""
    import jax.numpy as jnp

    def conv(x):
        if not hasattr(x, "dtype"):
            return x
        arr = jnp.asarray(x)
        if dtype is not None and jnp.issubdtype(arr.dtype, jnp.floating):
            arr = arr.astype(dtype)
        if int_dtype is not None and jnp.issubdtype(arr.dtype, jnp.integer):
            arr = arr.astype(int_dtype)
        if device is not None:
            arr = jax.device_put(arr, device)
        return arr

    return jax.tree_util.tree_map(conv, tree)
