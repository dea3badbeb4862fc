"""Pure jitted kernels: every op mirrors a reference code path exactly.

See each module's docstring for the reference ``file:line`` it reproduces.
"""

from image_to_pointcloud_tpu.ops.colormap import PLASMA_RGB, apply_colormap
from image_to_pointcloud_tpu.ops.depthnorm import normalize_depth
from image_to_pointcloud_tpu.ops.gaussian import gaussian_blur, gaussian_kernel1d
from image_to_pointcloud_tpu.ops.outlier import (
    knn_mean_distances,
    statistical_outlier_mask,
)
from image_to_pointcloud_tpu.ops.resize import (
    resize2d,
    resize_area,
    resize_batched,
    resize_bicubic_pil,
    resize_linear,
)
from image_to_pointcloud_tpu.ops.unproject import (
    DENSITY_STRIDES,
    focal_length,
    num_points,
    unproject,
    unproject_pallas,
)
from image_to_pointcloud_tpu.ops.voxel import voxel_downsample

__all__ = [
    "PLASMA_RGB",
    "apply_colormap",
    "normalize_depth",
    "gaussian_blur",
    "gaussian_kernel1d",
    "knn_mean_distances",
    "statistical_outlier_mask",
    "resize2d",
    "resize_batched",
    "resize_area",
    "resize_bicubic_pil",
    "resize_linear",
    "DENSITY_STRIDES",
    "focal_length",
    "num_points",
    "unproject",
    "unproject_pallas",
    "voxel_downsample",
]
