"""Single-view cuboid proposal sampler (objects/cuboid_proposal.py) vs a
synthetic ground-truth cuboid — parity check for the detect_3d_cuboid
layer (src/detect_3d_cuboid/box_proposal_detail.cpp)."""

import jax.numpy as jnp
import numpy as np

from eao_slam_tpu.geometry import se3
from eao_slam_tpu.geometry.camera import TUM3, project
from eao_slam_tpu.objects.cuboid_proposal import detect_cuboid
from eao_slam_tpu.objects.state import yaw_rotation


def _gt_cuboid_scene(yaw=0.25, pos=(0.0, 1.1, 4.0), half=(0.6, 0.4, 0.45)):
    """A cuboid resting on the ground plane y=+1.5 (y down, so the ground is
    1.5 m below the camera), viewed by a camera at the world origin looking
    +z — the camera is above the object, so the top face is visible (the
    three-face CubeSLAM configuration)."""
    pos = np.asarray(pos, np.float32)
    half = np.asarray(half, np.float32)
    signs = np.array([[sx, sy, sz] for sz in (-1, 1) for sy in (-1, 1)
                      for sx in (-1, 1)], np.float32)
    corners_obj = signs * half
    R = np.asarray(yaw_rotation(jnp.asarray(yaw)))
    corners_w = corners_obj @ R.T + pos
    T_cw = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    uv = np.asarray(project(TUM3, jnp.asarray(corners_w)))
    return corners_w, uv, T_cw, pos, half


def _edges_as_lines(uv):
    pairs = [(0, 1), (2, 3), (4, 5), (6, 7),          # x-direction edges
             (0, 2), (1, 3), (4, 6), (5, 7),          # y (vertical)
             (0, 4), (1, 5), (2, 6), (3, 7)]          # z
    lines = np.array([[*uv[a], *uv[b]] for a, b in pairs], np.float32)
    return lines


def test_detect_cuboid_recovers_pose():
    corners_w, uv, T_cw, gt_pos, gt_half = _gt_cuboid_scene()
    lines = _edges_as_lines(uv)
    L = 32
    lines_pad = np.zeros((L, 4), np.float32)
    lines_pad[: len(lines)] = lines
    lvalid = np.zeros((L,), bool)
    lvalid[: len(lines)] = True

    x0, y0 = uv.min(0) - 2
    x1, y1 = uv.max(0) + 2
    boxes = jnp.asarray([[x0, y0, x1 - x0, y1 - y0]], jnp.float32)

    prop = detect_cuboid(TUM3, T_cw, boxes, jnp.asarray([True]),
                         jnp.asarray(lines_pad), jnp.asarray(lvalid),
                         ground_y=1.5)
    assert bool(prop.ok[0])
    assert np.isfinite(float(prop.error[0]))
    # recovered position within ~40cm, height within ~40%
    assert np.linalg.norm(np.asarray(prop.pos[0]) - gt_pos) < 0.5
    assert abs(float(prop.scale[0][1]) - gt_half[1]) < 0.4 * gt_half[1] + 0.1
    # yaw mod 90° ambiguity of a cuboid
    dy = abs(float(prop.yaw[0]) - 0.25) % (np.pi / 2)
    assert min(dy, np.pi / 2 - dy) < 0.12
    # winner's projected corners stay inside the (expanded) detection box
    c2 = np.asarray(prop.corners_2d[0])
    assert c2[:, 0].min() > x0 - 40 and c2[:, 0].max() < x1 + 40


def test_detect_cuboid_invalid_box():
    corners_w, uv, T_cw, *_ = _gt_cuboid_scene()
    lines = np.zeros((8, 4), np.float32)
    boxes = jnp.zeros((2, 4), jnp.float32)
    prop = detect_cuboid(TUM3, T_cw, boxes, jnp.asarray([False, False]),
                         jnp.asarray(lines), jnp.zeros((8,), bool))
    assert not bool(prop.ok.any())
