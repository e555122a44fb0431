from ess_tpu.ops.voxel import (
    EventWindow,
    event_histogram,
    normalize_nonzero,
    voxel_grid_temporal,
    voxel_grid_trilinear,
)
from ess_tpu.ops.batch_voxel import voxelize_window_soa, voxelize_windows
from ess_tpu.ops.pad import CropGeometry, reflect_pad, crop_output
from ess_tpu.ops.resize import resize_bilinear, resize_nearest

__all__ = [
    "EventWindow",
    "event_histogram",
    "normalize_nonzero",
    "voxel_grid_temporal",
    "voxel_grid_trilinear",
    "voxelize_window_soa",
    "voxelize_windows",
    "CropGeometry",
    "reflect_pad",
    "crop_output",
    "resize_bilinear",
    "resize_nearest",
]
