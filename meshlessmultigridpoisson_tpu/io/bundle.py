"""Problem-bundle and solver-state persistence (checkpoint / resume).

The reference has no checkpointing — its only outputs are txt dumps at the
end of a run (writeVectorToTxt, fileReadingFunctions.cpp:70-79;
FractionalStepSim.cpp:181-198).  Here all solver data are pytrees of
statically-shaped arrays, so persistence is one npz per pytree: setup
artifacts (the operator hierarchy — expensive: kNN + weight solves +
condensation) and run state (solution vectors, timestep) save/restore
exactly.

Format: ``<path>.npz`` holds the flattened leaves as arr_0..arr_{n-1}
plus a pickled treedef/aux blob under ``__tree__`` (numpy object array).
"""

from __future__ import annotations

import pickle

import jax
import numpy as np


def _save_pytree(path: str, tree, compress: bool = True) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"arr_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    arrays["__tree__"] = np.frombuffer(pickle.dumps(treedef), dtype=np.uint8)
    # compress=False: setup bundles at 100k+ points are a few hundred MB of
    # f64 — zlib costs minutes on the 2-core host for ~2x size
    (np.savez_compressed if compress else np.savez)(path, **arrays)


def _load_pytree(path: str):
    import jax.numpy as jnp

    with np.load(path, allow_pickle=False) as data:
        treedef = pickle.loads(data["__tree__"].tobytes())
        n = len([k for k in data.files if k.startswith("arr_")])
        leaves = [jnp.asarray(data[f"arr_{i}"]) for i in range(n)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_bundle(path: str, hierarchy, clouds=None) -> None:
    """Persist a Hierarchy (+ optional ordered clouds) as setup artifacts."""
    _save_pytree(path, hierarchy)
    if clouds is not None:
        np.savez_compressed(
            path + ".clouds",
            **{
                f"pts_{i}": c.points for i, c in enumerate(clouds)
            },
            **{f"nrm_{i}": c.normals for i, c in enumerate(clouds)},
            **{
                f"bnd_{i}_{j}": b
                for i, c in enumerate(clouds)
                for j, b in enumerate(c.boundaries)
            },
        )


def load_bundle(path: str):
    return _load_pytree(path)


def save_state(path: str, state) -> None:
    """Checkpoint any solver state pytree (MGState / FracStepState)."""
    _save_pytree(path, state)


def load_state(path: str):
    return _load_pytree(path)


def write_vector_txt(vec, path: str) -> None:
    """One value per line (writeVectorToTxt parity, fileReadingFunctions.cpp:70-79)."""
    np.savetxt(path, np.asarray(vec).reshape(-1))


def read_vector_txt(path: str) -> np.ndarray:
    return np.loadtxt(path).reshape(-1)
