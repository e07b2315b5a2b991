"""Low-level TPU kernels (pure JAX/XLA; Pallas variants where profiling wins)."""

from .correlation import (
    all_pairs_correlation_pyramid,
    corr_lookup_2d,
    correlation2d,
    padded_pyramid_from_features,
)
from .geometry import (
    backwarp_3d,
    build_pc_pyramid,
    furthest_point_sampling,
    gather_points,
    k_nearest_neighbor,
    knn_interpolation,
    squared_distance,
)
from .gridsample import (
    grid_sample_pixel,
    grid_sample_points,
    resize_bilinear_align_corners,
)
from .ids import (
    make_parallel_camera_info,
    paral2persp,
    persp2paral,
    project_pc2image,
)
from .image import (
    InputPadder,
    backwarp_2d,
    convex_upsample,
    mesh_grid,
    resize_flow2d,
    resize_to_multiple,
)

__all__ = [
    "all_pairs_correlation_pyramid",
    "backwarp_2d",
    "backwarp_3d",
    "build_pc_pyramid",
    "convex_upsample",
    "corr_lookup_2d",
    "correlation2d",
    "furthest_point_sampling",
    "gather_points",
    "grid_sample_pixel",
    "grid_sample_points",
    "InputPadder",
    "k_nearest_neighbor",
    "knn_interpolation",
    "make_parallel_camera_info",
    "mesh_grid",
    "padded_pyramid_from_features",
    "paral2persp",
    "persp2paral",
    "project_pc2image",
    "resize_bilinear_align_corners",
    "resize_flow2d",
    "resize_to_multiple",
    "squared_distance",
]
