"""eao_slam_tpu — a TPU-native monocular object-SLAM engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of EAO-SLAM
(reference: yanmin-wu/EAO-SLAM): ORB-SLAM2-style tracking / local mapping /
loop closing, ensemble object-level data association with cuboid landmarks,
iForest outlier rejection, line-alignment yaw estimation, and semi-dense
probabilistic mapping — expressed as batched, fixed-shape device programs
over struct-of-arrays map state, sharded across TPU meshes with pjit /
shard_map instead of the reference's pthread + mutex pipeline.
"""

__version__ = "0.1.0"
