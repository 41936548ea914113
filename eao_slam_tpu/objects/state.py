"""Fixed-capacity SoA object landmark table.

Replaces Object_Map heap objects + Map::mvObjectMap (include/Object.h:160-219,
include/Map.h:71) with one pytree of [J]-shaped arrays. Point membership
lives on the map points (MapState.pt_object_id / pt_obj_votes), mirroring
MapPoint::object_id / object_id_vector (include/MapPoint.h:82-91).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class ObjectTable(NamedTuple):
    valid: jnp.ndarray            # [J] slot in use
    bad: jnp.ndarray              # [J] bBadErase
    cls: jnp.ndarray              # [J] i32 class id (-1 empty)
    n_obs: jnp.ndarray            # [J] i32 frames observed (mnConfidence/df)
    last_frame: jnp.ndarray       # [J] i32 mnLastAddID
    last_last_frame: jnp.ndarray  # [J] i32 mnLastLastAddID
    last_rect: jnp.ndarray        # [J, 4] mLastRect (x, y, w, h)
    last_last_rect: jnp.ndarray   # [J, 4]
    proj_rect: jnp.ndarray        # [J, 4] mRectProject
    center: jnp.ndarray           # [J, 3] mCenter3D (mean of member points)
    std: jnp.ndarray              # [J, 3] mStandar_{x,y,z}
    cent_sum: jnp.ndarray         # [J, 3] running sum of per-frame centroids
    cent_sumsq: jnp.ndarray       # [J, 3] running sum of squares
    center_std: jnp.ndarray       # [J, 3] mCenterStandar_{x,y,z}
    r_max: jnp.ndarray            # [J] mfRMax
    cub_min: jnp.ndarray          # [J, 3] object-frame AABB min
    cub_max: jnp.ndarray          # [J, 3]
    yaw: jnp.ndarray              # [J] rotY of the cuboid (0 until line alignment)
    yaw_hist: jnp.ndarray         # [J, S, 3] (count, score-sum, err-sum) per yaw sample
    co_occur: jnp.ndarray         # [J, J] i32 mmAppearSametime
    re_obj: jnp.ndarray           # [J, J] i32 mReObj potential-association votes

    @property
    def capacity(self) -> int:
        return self.valid.shape[0]


def empty_object_table(max_objects: int, yaw_samples: int = 30) -> ObjectTable:
    J, S = max_objects, yaw_samples
    return ObjectTable(
        valid=jnp.zeros((J,), bool),
        bad=jnp.zeros((J,), bool),
        cls=jnp.full((J,), -1, jnp.int32),
        n_obs=jnp.zeros((J,), jnp.int32),
        last_frame=jnp.full((J,), -1, jnp.int32),
        last_last_frame=jnp.full((J,), -1, jnp.int32),
        last_rect=jnp.zeros((J, 4), jnp.float32),
        last_last_rect=jnp.zeros((J, 4), jnp.float32),
        proj_rect=jnp.zeros((J, 4), jnp.float32),
        center=jnp.zeros((J, 3), jnp.float32),
        std=jnp.zeros((J, 3), jnp.float32),
        cent_sum=jnp.zeros((J, 3), jnp.float32),
        cent_sumsq=jnp.zeros((J, 3), jnp.float32),
        center_std=jnp.zeros((J, 3), jnp.float32),
        r_max=jnp.zeros((J,), jnp.float32),
        cub_min=jnp.zeros((J, 3), jnp.float32),
        cub_max=jnp.zeros((J, 3), jnp.float32),
        yaw=jnp.zeros((J,), jnp.float32),
        yaw_hist=jnp.zeros((J, S, 3), jnp.float32),
        co_occur=jnp.zeros((J, J), jnp.int32),
        re_obj=jnp.zeros((J, J), jnp.int32),
    )


def yaw_rotation(yaw: jnp.ndarray) -> jnp.ndarray:
    """[...] -> [..., 3, 3] rotation about the (downward) y axis — the
    reference's rotY in Cuboid3D pose (UpdateObjPose, src/Object.cc:2193)."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    return jnp.stack([
        jnp.stack([c, zero, s], -1),
        jnp.stack([zero, one, zero], -1),
        jnp.stack([-s, zero, c], -1),
    ], axis=-2)


def cuboid_corners(table: ObjectTable) -> jnp.ndarray:
    """[J, 8, 3] world-frame cuboid corners (Cuboid3D corner_1..8 semantics,
    include/Object.h:105-158): the AABB lives in the yaw-rotated object
    frame anchored at the member-point centroid; corners map to world via
    x_w = center + R_y(yaw) @ x_obj."""
    lo, hi = table.cub_min, table.cub_max       # object frame, relative to center
    # corners 0-3 = bottom ring (y=lo, walking the xz rectangle), 4-7 = top
    # ring — the reference's corner_1..8 layout (include/Object.h:105-158).
    # The ring edges (i, i+1 mod 4) are then ALL horizontal (alternating
    # x- and z-direction), which the yaw sampler's H_EDGES relies on; the
    # previous front/back-face ordering silently made half of them
    # vertical and dropped every z-direction edge.
    xs = jnp.stack([lo[:, 0], hi[:, 0], hi[:, 0], lo[:, 0],
                    lo[:, 0], hi[:, 0], hi[:, 0], lo[:, 0]], axis=1)
    ys = jnp.stack([lo[:, 1], lo[:, 1], lo[:, 1], lo[:, 1],
                    hi[:, 1], hi[:, 1], hi[:, 1], hi[:, 1]], axis=1)
    zs = jnp.stack([lo[:, 2], lo[:, 2], hi[:, 2], hi[:, 2],
                    lo[:, 2], lo[:, 2], hi[:, 2], hi[:, 2]], axis=1)
    corners_obj = jnp.stack([xs, ys, zs], axis=-1)          # [J, 8, 3]
    R = yaw_rotation(table.yaw)                             # [J, 3, 3]
    return table.center[:, None, :] + jnp.einsum("jab,jkb->jka", R, corners_obj)
