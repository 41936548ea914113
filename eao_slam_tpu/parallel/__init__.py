"""Device-mesh parallel layer: sharded BA and multi-sequence batch tracking.

The reference has no distributed layer at all (SURVEY.md §2.3 — its whole
parallelism story is 5 pthreads + OpenMP in one process). This package is
the TPU-native replacement: `jax.sharding.Mesh` + shard_map with XLA
collectives over ICI, per the scaling recipe in SURVEY.md §7.1.
"""

from eao_slam_tpu.parallel.dist_ba import distributed_bundle_adjust, make_ba_mesh

__all__ = ["distributed_bundle_adjust", "make_ba_mesh"]
