"""Data-parallel frame extraction over the device mesh
(parallel/frames.py): sharded results must equal single-device results."""

import jax
import jax.numpy as jnp
import numpy as np

from eao_slam_tpu.ops.orb import extract_orb
from eao_slam_tpu.parallel.frames import extract_batch_sharded, make_frame_mesh


def test_sharded_extraction_matches_single_device(rng):
    C, H, W = 8, 96, 128
    imgs = rng.uniform(0, 255, (C, H, W)).astype(np.float32)
    mesh = make_frame_mesh(jax.devices()[:8])
    feats = extract_batch_sharded(jnp.asarray(imgs), mesh,
                                  n_features=128, n_levels=3)
    for c in range(C):
        ref = extract_orb(jnp.asarray(imgs[c]), n_features=128, n_levels=3)
        np.testing.assert_array_equal(np.asarray(feats.desc[c]),
                                      np.asarray(ref.desc))
        np.testing.assert_array_equal(np.asarray(feats.valid[c]),
                                      np.asarray(ref.valid))
        np.testing.assert_allclose(np.asarray(feats.kp[c]),
                                   np.asarray(ref.kp), atol=1e-5)
