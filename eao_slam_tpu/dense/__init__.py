"""Dense/semi-dense reconstruction: probabilistic depth, 3D lines, meshes.

TPU-native rebuild of the reference's offline mapping stack (SURVEY.md
§2.1): ProbabilityMapping (semi-dense inverse-depth estimation),
LineDetector (2D segments + 3D line fitting) and the surface model.
"""

from eao_slam_tpu.dense.semidense import SemiDenseResult, semidense_reconstruct

__all__ = ["SemiDenseResult", "semidense_reconstruct"]
