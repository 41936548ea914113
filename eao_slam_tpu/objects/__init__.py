"""EAO object layer: 2D detections -> ensemble association -> cuboid landmarks.

TPU-native rebuild of the reference's object machinery (src/Object.cc,
include/Object.h — SURVEY.md §2.1 Object_2D / Object_Map rows): the
Object_Map pointer list becomes a fixed-capacity SoA ObjectTable; the
4-stage ensemble association cascade becomes masked [B, J] score tensors
computed in one jitted program with a tiny host resolution step; iForest
becomes a vectorized forest over (trees x points).
"""

from eao_slam_tpu.objects.state import ObjectTable, empty_object_table
from eao_slam_tpu.objects.association import ObjectUpdater

__all__ = ["ObjectTable", "empty_object_table", "ObjectUpdater"]
