"""Generate real Gmsh v2 .msh fixtures for the ingest tests.

The reference's mesh fixtures are gitignored (named at
testing_functions.cpp:355-364); these recreate equivalent files — true
Gmsh v2.2 ASCII with $Nodes, type-1 boundary line elements around each
boundary loop, and type-2 Delaunay triangles — from the framework's
mesh-grade generated clouds, at the reference's sizes.

Usage:  python scripts/make_msh_fixtures.py [outdir]
"""

import os
import sys

import numpy as np
from scipy.spatial import Delaunay

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from meshlessmultigridpoisson_tpu.geometry.msh import write_msh
from meshlessmultigridpoisson_tpu.geometry.pointclouds import make_cloud


def domain_triangles(pts: np.ndarray, geomtype: str) -> np.ndarray:
    """Delaunay triangles with centroids inside the domain."""
    tri = Delaunay(pts).simplices
    c = pts[tri].mean(axis=1)
    r2 = (c[:, 0] - 0.5) ** 2 + (c[:, 1] - 0.5) ** 2
    if geomtype == "square_with_circle":
        keep = r2 > 0.25**2
    elif geomtype == "concentric_circles":
        keep = (r2 > 0.25**2) & (r2 < 0.5**2)
    else:
        keep = np.ones(len(tri), dtype=bool)
    return tri[keep]


def boundary_loops(cloud) -> list[np.ndarray]:
    """Order each boundary component as a closed loop.

    Generated clouds emit boundary points already in loop order (edges
    walked corner-to-corner; circles by angle), so the component index
    array IS the loop.
    """
    return [np.asarray(b) for b in cloud.boundaries]


def main(outdir: str) -> None:
    os.makedirs(outdir, exist_ok=True)
    jobs = [
        ("square", 170, "square_170.msh"),
        ("square", 600, "square_600.msh"),
        ("square_with_circle", 640, "square_hole_640.msh"),
        ("concentric_circles", 650, "concentric_circles_650.msh"),
    ]
    for geom, n, name in jobs:
        cloud = make_cloud(geom, n, seed=0)
        tris = domain_triangles(cloud.points, geom)
        path = os.path.join(outdir, name)
        write_msh(path, cloud.points, boundary_loops(cloud), tris)
        print(f"{path}: {cloud.n} nodes, {len(tris)} triangles, "
              f"{sum(len(b) for b in cloud.boundaries)} boundary pts")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "tests/fixtures")
