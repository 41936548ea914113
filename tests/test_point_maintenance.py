"""MapPoint maintenance: distinctive-descriptor refresh + Replace-style
duplicate merging (src/MapPoint.cc ComputeDistinctiveDescriptors/Replace,
src/LocalMapping.cc:459-539 bidirectional fusion)."""

import jax.numpy as jnp
import numpy as np

from eao_slam_tpu.config import CapacityConfig, tum3_config
from eao_slam_tpu.geometry.camera import TUM3
from eao_slam_tpu.runtime.local_mapping import (
    merge_duplicate_points,
    refresh_point_descriptors,
)


def _desc(rng, n):
    return jnp.asarray(rng.integers(0, 2**32, (n, 8), dtype=np.uint32))


def test_descriptor_refresh_picks_min_median():
    """The refreshed descriptor is the observation with the smallest median
    hamming distance to the others — an outlier observation never wins."""
    rng = np.random.default_rng(0)
    K, F, P, W = 4, 8, 16, 4
    base = np.asarray(_desc(rng, 1))[0]

    kf_desc = np.zeros((K, F, 8), np.uint32)
    kf_pt = np.full((K, F), -1, np.int32)
    kf_valid = np.ones((K, F), bool)

    # point 3 observed in all 4 KFs at feature 0: three near-identical
    # descriptors (flip 1 word slightly) and one wild outlier
    for k in range(3):
        d = base.copy()
        d[0] ^= np.uint32(1 << k)  # 1-bit variations
        kf_desc[k, 0] = d
        kf_pt[k, 0] = 3
    kf_desc[3, 0] = np.asarray(_desc(rng, 1))[0]  # outlier observation
    kf_pt[3, 0] = 3

    pt_desc = np.zeros((P, 8), np.uint32)  # stale descriptor
    win = jnp.arange(W, dtype=jnp.int32)
    wv = jnp.ones((W,), bool)
    out = np.asarray(refresh_point_descriptors(
        jnp.asarray(kf_pt), jnp.asarray(kf_desc), jnp.asarray(kf_valid),
        jnp.asarray(pt_desc), win, wv, n_win=W,
    ))

    def ham(a, b):
        return bin(int.from_bytes(a.tobytes(), "little")
                   ^ int.from_bytes(b.tobytes(), "little")).count("1")

    # winner is one of the three consistent observations, not the outlier
    assert ham(out[3], base) <= 1, "outlier observation won the refresh"
    # untouched points keep their descriptor
    assert (out[5] == pt_desc[5]).all()


def test_duplicate_points_merge():
    """Two map points landing on the same physical feature merge: the
    better-observed one absorbs the other across the observation table."""
    cfg = tum3_config().replace(capacity=CapacityConfig(
        max_keyframes=8, max_points=64, max_features=32, local_ba_points=64))
    cam = cfg.camera
    rng = np.random.default_rng(1)
    P, K, F = 64, 8, 32

    # one physical 3D point, duplicated as map points 2 (3 observations)
    # and 9 (1 observation); identical descriptors
    X = np.array([0.3, -0.2, 3.0], np.float32)
    d = np.asarray(_desc(rng, 1))[0]
    pt_pos = np.zeros((P, 3), np.float32)
    pt_pos[2] = X
    pt_pos[9] = X + 0.002   # numerically distinct duplicate
    pt_valid = np.zeros((P,), bool)
    pt_valid[[2, 9]] = True
    pt_desc = np.zeros((P, 8), np.uint32)
    pt_desc[2] = d
    pt_desc[9] = d

    kf_pt = np.full((K, F), -1, np.int32)
    kf_pt[0, 0] = 2
    kf_pt[1, 0] = 2
    kf_pt[2, 0] = 2
    kf_pt[3, 0] = 9   # the duplicate's lone observation

    # keyframe 3 sees the point at feature 0; identity pose
    T = jnp.eye(3, 4)
    z = X[2]
    kp = np.zeros((F, 2), np.float32)
    kp[0] = [cam.fx * X[0] / z + cam.cx, cam.fy * X[1] / z + cam.cy]
    desc = np.zeros((F, 8), np.uint32)
    desc[0] = d
    octv = np.zeros((F,), np.int32)
    valid = np.zeros((F,), bool)
    valid[0] = True
    cur_pt = kf_pt[3]

    from eao_slam_tpu.ops.orb import scale_sigma2

    new_kf_pt, new_valid = merge_duplicate_points(
        cam, jnp.asarray(pt_pos), jnp.asarray(pt_valid), jnp.asarray(pt_desc),
        # realistic scale range: max_dist ~ viewing distance => predicted
        # octave 0, matching the feature's octave (PredictScale gate)
        jnp.full((P,), 1.5), jnp.full((P,), 3.0),
        jnp.asarray(kf_pt), T,
        jnp.asarray(kp), jnp.asarray(desc), jnp.asarray(octv),
        jnp.asarray(valid), jnp.asarray(cur_pt),
        scale_sigma2(),
    )
    new_kf_pt = np.asarray(new_kf_pt)
    new_valid = np.asarray(new_valid)
    # point 2 (3 obs) absorbs point 9 (1 obs): every row now references 2
    assert new_kf_pt[3, 0] == 2, new_kf_pt[3, 0]
    assert not new_valid[9], "absorbed duplicate must be invalidated"
    assert new_valid[2]
    assert (new_kf_pt[:3, 0] == 2).all()
