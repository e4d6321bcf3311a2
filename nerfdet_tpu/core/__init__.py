from .boxes import (
    DepthBoxes3D,
    boxes_iou_3d,
    corners_from_boxes,
    gravity_center,
    rotation_3d_in_axis,
    volume_of_boxes,
)
from .nms import aligned_3d_nms, aligned_3d_nms_fixed
from .eval import indoor_eval, average_precision
from .points import (
    BasePoints,
    CameraPoints,
    DepthPoints,
    LiDARPoints,
    get_points_type,
)

__all__ = [
    "BasePoints",
    "CameraPoints",
    "DepthPoints",
    "LiDARPoints",
    "get_points_type",
    "DepthBoxes3D",
    "boxes_iou_3d",
    "corners_from_boxes",
    "gravity_center",
    "rotation_3d_in_axis",
    "volume_of_boxes",
    "aligned_3d_nms",
    "aligned_3d_nms_fixed",
    "indoor_eval",
    "average_precision",
]
