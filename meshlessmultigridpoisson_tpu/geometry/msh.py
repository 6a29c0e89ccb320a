"""Gmsh v2 ``.msh`` and plain-text point ingest.

Replaces fileReadingFunctions.{h,cpp}: pointsFromMshFile parses the $Nodes
section (fileReadingFunctions.cpp:6-32), pointsFromTxts reads one
"x y z"-per-line (":33-57"), boundPtsConnFromMsh recovers boundary chains
from $Elements types 1/2/15 (":80-150").  We parse $Nodes and the line
elements; unlike the reference we validate input instead of crashing on a
bad fopen (fileReadingFunctions.cpp:12).
"""

from __future__ import annotations

import numpy as np


def read_msh_points(path: str) -> np.ndarray:
    """Coordinates [N, 3] from a Gmsh v2 ASCII file's $Nodes section."""
    with open(path) as f:
        lines = f.read().splitlines()
    try:
        start = lines.index("$Nodes")
    except ValueError:
        raise ValueError(f"{path}: no $Nodes section (not a Gmsh v2 ASCII file?)")
    count = int(lines[start + 1])
    pts = np.empty((count, 3), dtype=np.float64)
    for i in range(count):
        parts = lines[start + 2 + i].split()
        # "<id> <x> <y> <z>"
        pts[i] = [float(parts[1]), float(parts[2]), float(parts[3])]
    return pts


def read_msh_boundary_edges(path: str) -> np.ndarray:
    """[E, 2] node-index pairs of 2-node line elements (type 1), 0-based.

    Equivalent to the connectivity recovered by boundPtsConnFromMsh
    (fileReadingFunctions.cpp:80-150); used for mesh-derived boundary
    normals when analytic geometry normals are unavailable.
    """
    with open(path) as f:
        lines = f.read().splitlines()
    try:
        start = lines.index("$Elements")
    except ValueError:
        return np.zeros((0, 2), dtype=np.int64)
    count = int(lines[start + 1])
    edges = []
    for i in range(count):
        parts = lines[start + 2 + i].split()
        etype = int(parts[1])
        if etype == 1:  # 2-node line
            ntags = int(parts[2])
            a, b = parts[3 + ntags : 5 + ntags]
            edges.append((int(a) - 1, int(b) - 1))
    return np.asarray(edges, dtype=np.int64).reshape(-1, 2)


def read_txt_points(path: str) -> np.ndarray:
    """Coordinates from a whitespace-separated text file, one point per line."""
    pts = np.loadtxt(path, dtype=np.float64, ndmin=2)
    if pts.shape[1] == 2:
        pts = np.concatenate([pts, np.zeros((pts.shape[0], 1))], axis=1)
    return pts
