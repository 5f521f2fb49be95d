from .camera_table import (
    Cameras, CameraTable, CameraRigTable, Label, MultiCameraTable,
    camera_json, camera_scene_extents, camera_similarity,
)
from .pose_table import PoseTable, RigPoseTable

__all__ = [
    "Cameras", "CameraTable", "CameraRigTable", "MultiCameraTable", "Label",
    "camera_json", "camera_scene_extents", "camera_similarity",
    "PoseTable", "RigPoseTable",
]
