from .projection import (
    get_fov,
    get_world_rays,
    homogenize_points,
    homogenize_vectors,
    project,
    sample_image_grid,
    transform_cam2world,
    transform_world2cam,
    unproject,
)
from .camera_utils import absolute_to_relative_camera

__all__ = [
    "absolute_to_relative_camera",
    "get_fov",
    "get_world_rays",
    "homogenize_points",
    "homogenize_vectors",
    "project",
    "sample_image_grid",
    "transform_cam2world",
    "transform_world2cam",
    "unproject",
]
