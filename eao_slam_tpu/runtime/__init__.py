"""SLAM runtime: SoA map state + host-orchestrated jitted pipeline stages."""

from eao_slam_tpu.runtime.frame import Frame, frame_from_arrays, frame_from_image
from eao_slam_tpu.runtime.map_state import MapState, empty_map_state
from eao_slam_tpu.runtime.tracker import MonoTracker

__all__ = [
    "Frame",
    "frame_from_arrays",
    "frame_from_image",
    "MapState",
    "empty_map_state",
    "MonoTracker",
]
