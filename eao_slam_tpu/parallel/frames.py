"""Data-parallel ORB extraction over the device mesh.

The front end is embarrassingly parallel across frames (SURVEY.md §2.3
"data parallelism"): a chunk of images shards along its frame axis, every
device extracts its shard with the full pyramid/FAST/BRIEF pipeline
(ops/orb.py), and the fixed-shape feature arrays gather back to feed the
sequential tracking scan (which is inherently serial in time and stays on
one chip). Extraction is a significant, measurable fraction of the fused
chunk program (run profile_bench.py on the target chip for the split), so
sharding it is the natural first multi-chip split of the production
tracker.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from eao_slam_tpu.ops.orb import Features, extract_orb

FRAME_AXIS = "frames"


def make_frame_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (FRAME_AXIS,))


@partial(jax.jit, static_argnames=("mesh", "n_features", "n_levels"))
def extract_batch_sharded(
    images: jnp.ndarray,        # [C, H, W] uint8/float32
    mesh: Mesh,
    n_features: int = 1024,
    n_levels: int = 8,
) -> Features:
    """Extract ORB features for a frame batch sharded over the mesh.
    C must be a multiple of the mesh size; output arrays are resharded to
    the frame axis as well (the consumer's gather is XLA's problem)."""
    sharding = NamedSharding(mesh, P(FRAME_AXIS))
    images = jax.lax.with_sharding_constraint(images, sharding)

    def one(im):
        return extract_orb(im.astype(jnp.float32), n_features=n_features,
                           n_levels=n_levels)

    return jax.vmap(one)(images)
