"""Pipeline models: frame pytrees, tracker, mapper, odometry drivers, BA."""

from dvo_tpu.models.frame import Scene, Frame, build_frame, build_frame_with_depth
from dvo_tpu.models.tracker import track, TrackResult

__all__ = [
    "Scene",
    "Frame",
    "build_frame",
    "build_frame_with_depth",
    "track",
    "TrackResult",
]
