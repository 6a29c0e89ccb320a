"""Host-side geometry: point clouds, neighbor search, ordering, normals.

Replaces reference L0/L1 (general_computation_functions.{h,cpp},
fileReadingFunctions.{h,cpp}) plus the kNN / RCM members of ``Grid``
(grid.cpp:216-260, 713-776).  Everything here runs offline on host in numpy;
outputs are packed, statically-shaped arrays consumed by the TPU solve path.
"""

from meshlessmultigridpoisson_tpu.geometry.pointclouds import (
    PointCloud,
    square_cloud,
    square_with_circle_cloud,
    concentric_circles_cloud,
    box3d_cloud,
    make_cloud,
)
from meshlessmultigridpoisson_tpu.geometry.neighbors import knn, knn_queries
from meshlessmultigridpoisson_tpu.geometry.ordering import (
    rcm_ordering,
    sfc_ordering,
    tile_window_ordering,
)
from meshlessmultigridpoisson_tpu.geometry.msh import read_msh_points, read_txt_points

__all__ = [
    "PointCloud",
    "square_cloud",
    "square_with_circle_cloud",
    "concentric_circles_cloud",
    "box3d_cloud",
    "make_cloud",
    "knn",
    "knn_queries",
    "rcm_ordering",
    "sfc_ordering",
    "tile_window_ordering",
    "read_msh_points",
    "read_txt_points",
]
