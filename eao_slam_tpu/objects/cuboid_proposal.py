"""Single-view cuboid proposal generation + scoring (CubeSLAM layer).

TPU-native rebuild of the imported detect_3d_cuboid module
(src/detect_3d_cuboid/box_proposal_detail.cpp, include/detect_3d_cuboid/
detect_3d_cuboid.h:22-43 — SURVEY.md §2.2): from one 2D detection box, a
ground-aligned camera pose and the frame's 2D line segments, propose 3D
cuboids (pos, scale, rotY) sitting on the ground plane and score them by
how well their projected edges agree with the image lines.

The reference enumerates proposals in nested loops (object yaw sample ×
top-corner sample) and rasterizes a distance transform to score edges.
Here the whole proposal set is one [S, P] tensor program: vanishing
points from the sampled yaws, corner generation as closed-form line-line
intersections, and edge scoring as a broadcast [S, P, E, L]
segment-to-edge distance + angle comparison — no rasterization, no
data-dependent shapes. Matches the reference's disabled-by-default status
(bCubeslam=false, src/Tracking.cc:1211-1238) as an optional detector that
can seed Object_Map cuboids.

Conventions follow objects/state.py: ground-aligned world with y the
vertical (gravity) axis, cuboid yaw = rotation about y (yaw_rotation).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from eao_slam_tpu.geometry import se3
from eao_slam_tpu.geometry.camera import Camera
from eao_slam_tpu.objects.state import yaw_rotation

N_YAW = 18          # object-yaw samples over ±90° about the camera yaw
N_POS = 10          # top-corner samples along the top edge of the box
ANGLE_W = 0.8       # weight of the angle error vs the distance error
SKEW_W = 1.5        # weight of the shape-skew penalty
ANGLE_GATE = jnp.deg2rad(30.0)   # line→VP assignment gate


class CuboidProposal(NamedTuple):
    """Best-scoring cuboid per detection box (cuboid struct parity,
    include/detect_3d_cuboid/detect_3d_cuboid.h:22-43)."""
    pos: jnp.ndarray        # [B, 3] world-frame cuboid center
    scale: jnp.ndarray      # [B, 3] half-extents (x, y, z in object frame)
    yaw: jnp.ndarray        # [B] rotY
    corners_2d: jnp.ndarray  # [B, 8, 2] projected corners of the winner
    error: jnp.ndarray      # [B] normalized_error of the winner
    ok: jnp.ndarray         # [B] proposal is geometrically valid


def _vanishing_points(cam: Camera, R_cw: jnp.ndarray, yaws: jnp.ndarray):
    """VPs of the three cuboid axis directions for each yaw sample.

    [S] yaws -> three [S, 3] homogeneous pixel VPs; the reference builds
    these from KinvR (box_proposal_detail.cpp, cam_pose.KinvR).  A VP may
    be behind the camera — callers only ever use it through 2-point line
    forms, so the sign of the homogeneous z just flips the direction.
    """
    R_obj = yaw_rotation(yaws)                       # [S, 3, 3]
    # object-frame axis directions in world coords = columns of R_obj
    d1 = R_obj[..., :, 0]                            # length axis
    d2 = R_obj[..., :, 2]                            # width axis
    d3 = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), d1.shape)  # vertical
    K = cam.K

    def vp(d):
        v = jnp.einsum("ab,sb->sa", K @ R_cw, d)     # [S, 3] homogeneous
        # normalize scale only (keep sign/w): VPs of horizontal axes with a
        # level camera sit at infinity (w == 0) — all downstream geometry
        # is homogeneous cross products, so that is exact, not a corner case
        return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-12)

    return vp(d1), vp(d2), vp(d3)


def _to_h(p: jnp.ndarray) -> jnp.ndarray:
    """[..., 2] pixel point -> [..., 3] homogeneous."""
    return jnp.concatenate([p, jnp.ones(p.shape[:-1] + (1,), p.dtype)], -1)


def _join(a_h: jnp.ndarray, b_h: jnp.ndarray) -> jnp.ndarray:
    """Line through two homogeneous points (projective join)."""
    l = jnp.cross(a_h, b_h)
    n = jnp.linalg.norm(l[..., :2], axis=-1, keepdims=True)
    return l / jnp.maximum(n, 1e-12)


def _meet(l1: jnp.ndarray, l2: jnp.ndarray):
    """Intersection of two lines -> ([..., 2] pixel point, [...] valid)."""
    p = jnp.cross(l1, l2)
    ok = jnp.abs(p[..., 2]) > 1e-6
    w = jnp.where(ok, p[..., 2], 1.0)
    return p[..., :2] / w[..., None], ok


def _vline(x: jnp.ndarray) -> jnp.ndarray:
    """Homogeneous vertical line u = x."""
    one = jnp.ones_like(x)
    return jnp.stack([one, jnp.zeros_like(x), -x], -1)


def _hline(y: jnp.ndarray) -> jnp.ndarray:
    """Homogeneous horizontal line v = y."""
    one = jnp.ones_like(y)
    return jnp.stack([jnp.zeros_like(y), one, -y], -1)


# visible-edge index pairs into the 2D corner order below (top ring 1-4 =
# indices 0-3, bottom ring 5-8 = indices 4-7); 9 scored edges: 4 top, 2
# bottom front, 3 verticals — the reference scores the visible subset too.
_EDGES_2D = jnp.asarray(
    [[0, 1], [1, 2], [2, 3], [3, 0],
     [4, 5], [4, 7],
     [0, 4], [1, 5], [3, 7]], jnp.int32)
# VP assignment of each scored edge: 0 -> vp1, 1 -> vp2, 2 -> vp3
_EDGE_VP = jnp.asarray([0, 1, 0, 1, 0, 1, 2, 2, 2], jnp.int32)


def _generate_corners(vp1, vp2, vp3, box, u_top):
    """Closed-form corner generation for the three-face configuration
    (box_proposal_detail.cpp 'config 1').

    vp*: [S, 2]; u_top: [P] sample abscissae along the top edge.
    Returns (corners [S, P, 8, 2], ok [S, P]).
    """
    x0, y0, w, h = box[0], box[1], box[2], box[3]
    x1, y1 = x0 + w, y0 + h
    S, P = vp1.shape[0], u_top.shape[0]

    p1 = jnp.stack([jnp.broadcast_to(u_top, (S, P)),
                    jnp.full((S, P), y0)], -1)                 # [S, P, 2]
    p1h = _to_h(p1)
    v1 = jnp.broadcast_to(vp1[:, None, :], (S, P, 3))
    v2 = jnp.broadcast_to(vp2[:, None, :], (S, P, 3))
    v3 = jnp.broadcast_to(vp3[:, None, :], (S, P, 3))

    # p2/p4 land on the box edge OPPOSITE their VP: the edge p1->p2 runs
    # away from vp1 (toward the camera), so if vp1 is left of p1, p2 is on
    # the right edge (the reference's box_config_type vp1-left/right).
    def vp_right_of(v, p):
        # homogeneous "x/w > p.x" robust to w<=0; at infinity pick +x side
        sx = v[..., 0] - p[..., 0] * v[..., 2]
        return jnp.where(jnp.abs(v[..., 2]) > 1e-6,
                         sx * v[..., 2] > 0, v[..., 0] >= 0)

    r1 = vp_right_of(v1, p1)
    e2 = jnp.where(r1, x0, x1)        # opposite side of vp1
    e4 = jnp.where(r1, x1, x0)        # p4 across from p2
    l_v1p1 = _join(v1, p1h)
    l_v2p1 = _join(v2, p1h)
    p2, ok2 = _meet(l_v1p1, _vline(e2))
    p4, ok4 = _meet(l_v2p1, _vline(e4))
    p3, ok3 = _meet(_join(v1, _to_h(p4)), _join(v2, _to_h(p2)))
    # bottom ring: the corner below p3 lands on the bottom edge of the box
    p7, ok7 = _meet(_join(v3, _to_h(p3)), _hline(jnp.broadcast_to(y1, p3[..., 0].shape)))
    # p8-p7 parallels p4-p3 (vp1); p6-p7 parallels p2-p3 (vp2); p5-p6
    # parallels p1-p2 (vp1)
    p8, ok8 = _meet(_join(v3, _to_h(p4)), _join(v1, _to_h(p7)))
    p6, ok6 = _meet(_join(v3, _to_h(p2)), _join(v2, _to_h(p7)))
    p5, ok5 = _meet(_join(v3, p1h), _join(v1, _to_h(p6)))

    corners = jnp.stack([p1, p2, p3, p4, p5, p6, p7, p8], axis=-2)
    ok = ok2 & ok3 & ok4 & ok5 & ok6 & ok7 & ok8
    # all corners inside a slightly expanded box, top ring above bottom ring
    ex = 0.15 * w + 10.0
    ey = 0.15 * h + 10.0
    inside = ((corners[..., 0] >= x0 - ex) & (corners[..., 0] <= x1 + ex)
              & (corners[..., 1] >= y0 - ey) & (corners[..., 1] <= y1 + ey))
    ok &= jnp.all(inside, axis=-1)
    ok &= jnp.all(corners[..., 4:, 1] >= corners[..., :4, 1] - 1.0, axis=-1)
    return corners, ok


def _edge_errors(corners, lines, line_valid, vps):
    """Distance + angle error of detected segments vs projected edges.

    corners: [S, P, 8, 2]; lines: [L, 4]; vps: [S, 3, 3] homogeneous.
    Returns (dist_err [S, P], angle_err [S, P]) — both already averaged
    over the contributing lines (large constant when no line matches, as
    the reference penalizes unexplained proposals).
    """
    ea = corners[..., _EDGES_2D[:, 0], :]             # [S, P, E, 2]
    eb = corners[..., _EDGES_2D[:, 1], :]

    mid = 0.5 * (lines[:, :2] + lines[:, 2:])         # [L, 2]
    ldir = lines[:, 2:] - lines[:, :2]
    llen = jnp.linalg.norm(ldir, axis=-1) + 1e-8
    lang = jnp.arctan2(ldir[:, 1], ldir[:, 0])

    ed = eb - ea                                      # [S, P, E, 2]
    elen = jnp.linalg.norm(ed, axis=-1) + 1e-8
    eang = jnp.arctan2(ed[..., 1], ed[..., 0])

    # point-to-segment distance of each line midpoint to each edge
    rel = mid[None, None, None, :, :] - ea[..., None, :]        # [S,P,E,L,2]
    t = jnp.clip(jnp.einsum("...la,...a->...l", rel, ed) / (elen**2)[..., None],
                 0.0, 1.0)
    foot = ea[..., None, :] + t[..., None] * ed[..., None, :]
    dist = jnp.linalg.norm(mid[None, None, None] - foot, axis=-1)  # [S,P,E,L]

    dang = jnp.abs(eang[..., None] - lang[None, None, None, :])
    dang = jnp.minimum(jnp.mod(dang, jnp.pi), jnp.pi - jnp.mod(dang, jnp.pi))
    aligned = (dang < ANGLE_GATE) & line_valid[None, None, None, :]

    dist = jnp.where(aligned, dist, 1e6)
    best = jnp.min(dist, axis=-2)                     # [S, P, L] best edge per line
    matched = (best < 1e5) & line_valid[None, None, :]
    n = jnp.sum(matched, -1)
    dist_err = jnp.sum(jnp.where(matched, best, 0.0), -1) / jnp.maximum(n, 1)
    dist_err = jnp.where(n > 0, dist_err, 60.0)

    # angle error: each line against the direction to its best-aligned VP
    # (the reference's vp-edge angle scoring); vps are homogeneous [S, 3, 3]
    # so the midpoint->VP direction is vp.xy - mid * vp.w (exact at infinity)
    to_vp = (vps[:, None, :, None, :2]
             - mid[None, None, None, :, :] * vps[:, None, :, None, 2:3])
    vang = jnp.arctan2(to_vp[..., 1], to_vp[..., 0])
    dva = jnp.abs(vang - lang[None, None, None, :])
    dva = jnp.minimum(jnp.mod(dva, jnp.pi), jnp.pi - jnp.mod(dva, jnp.pi))
    best_vp = jnp.min(dva, axis=2)                    # [S, 1, L]
    ang_ok = (best_vp < ANGLE_GATE) & line_valid[None, None, :]
    na = jnp.sum(ang_ok, -1)
    angle_err = jnp.sum(jnp.where(ang_ok, best_vp, 0.0), -1) / jnp.maximum(na, 1)
    angle_err = jnp.where(na > 0, angle_err, ANGLE_GATE)
    return dist_err, jnp.broadcast_to(angle_err, dist_err.shape)


def _lift_to_ground(cam: Camera, T_cw: jnp.ndarray, corners: jnp.ndarray,
                    ground_y: jnp.ndarray):
    """3D cuboid from winning 2D corners: bottom ring rays intersect the
    ground plane y = ground_y; height from the top ring over corner 5.

    corners: [8, 2]. Returns (pos [3], scale [3], ok).
    """
    T_wc = se3.inverse(T_cw)
    R_wc, t_wc = se3.rot(T_wc), se3.trans(T_wc)      # camera center = t_wc

    uv1 = jnp.concatenate([corners, jnp.ones((8, 1))], -1)       # [8, 3]
    rays_c = jnp.einsum("ab,kb->ka", jnp.linalg.inv(cam.K), uv1)
    rays_w = jnp.einsum("ab,kb->ka", R_wc, rays_c)               # [8, 3]

    # bottom ring (indices 4..7) onto the ground plane
    denom = rays_w[4:, 1]
    okb = jnp.abs(denom) > 1e-8
    s = (ground_y - t_wc[1]) / jnp.where(okb, denom, 1.0)
    bot = t_wc[None] + s[:, None] * rays_w[4:]                   # [4, 3]
    ok = jnp.all(okb & (s > 0.1), axis=0)

    # height: top corner 1 back-projected at the depth of bottom corner 5
    z5 = se3.apply(T_cw, bot[0])[2]
    top1 = se3.apply(T_wc, rays_c[0] * (z5 / jnp.maximum(rays_c[0][2], 1e-8)))
    height = jnp.maximum(ground_y - top1[1], 0.05)   # y is down: top above ground

    center_b = jnp.mean(bot, axis=0)
    # object-frame half extents from the bottom rectangle edge lengths
    lx = 0.5 * (jnp.linalg.norm(bot[1] - bot[0]) + jnp.linalg.norm(bot[2] - bot[3]))
    lz = 0.5 * (jnp.linalg.norm(bot[3] - bot[0]) + jnp.linalg.norm(bot[2] - bot[1]))
    scale = jnp.stack([0.5 * lx, 0.5 * height, 0.5 * lz])
    pos = center_b - jnp.asarray([0.0, 1.0, 0.0]) * (0.5 * height)
    ok &= jnp.all(jnp.isfinite(pos)) & jnp.all(scale > 1e-3)
    return pos, scale, ok


@partial(jax.jit, static_argnames=("cam",))
def detect_cuboid(
    cam: Camera,
    T_cw: jnp.ndarray,        # [3, 4] world->camera, ground-aligned world
    boxes: jnp.ndarray,       # [B, 4] (x, y, w, h)
    box_valid: jnp.ndarray,   # [B]
    lines: jnp.ndarray,       # [L, 4] frame line segments
    line_valid: jnp.ndarray,  # [L]
    ground_y: jnp.ndarray | float = 0.0,
) -> CuboidProposal:
    """detect_3d_cuboid::detect_cuboid parity entry point: all boxes, all
    proposals, one program. Scores = dist + 0.8·angle + skew (the
    reference's normalized_error weighting)."""
    R_cw = se3.rot(T_cw)
    # camera yaw about the world vertical: direction of the optical axis
    fwd = se3.rot(se3.inverse(T_cw))[:, 2]
    cam_yaw = jnp.arctan2(fwd[0], fwd[2])
    yaws = cam_yaw + jnp.linspace(-jnp.pi / 2, jnp.pi / 2, N_YAW)
    vp1, vp2, vp3 = _vanishing_points(cam, R_cw, yaws)
    vps = jnp.stack([vp1, vp2, vp3], axis=1)          # [S, 3, 2]
    ground_y = jnp.asarray(ground_y, jnp.float32)

    def per_box(box, bvalid):
        u = box[0] + box[2] * jnp.linspace(0.15, 0.85, N_POS)
        corners, ok = _generate_corners(vp1, vp2, vp3, box, u)   # [S, P, 8, 2]
        dist_err, angle_err = _edge_errors(corners, lines, line_valid, vps)
        # skew: projected top-edge length ratio penalty (skew_ratio field)
        l12 = jnp.linalg.norm(corners[..., 1, :] - corners[..., 0, :], axis=-1)
        l14 = jnp.linalg.norm(corners[..., 3, :] - corners[..., 0, :], axis=-1)
        ratio = jnp.maximum(l12, l14) / jnp.maximum(jnp.minimum(l12, l14), 1.0)
        skew = jnp.maximum(ratio - 3.0, 0.0)
        err = dist_err / jnp.maximum(box[2], 1.0) * 100.0 \
            + ANGLE_W * angle_err / ANGLE_GATE * 10.0 + SKEW_W * skew
        err = jnp.where(ok, err, jnp.inf)
        flat = jnp.argmin(err.reshape(-1))
        best_err = err.reshape(-1)[flat]
        bc = corners.reshape(-1, 8, 2)[flat]
        byaw = yaws[flat // N_POS]
        pos, scale, okl = _lift_to_ground(cam, T_cw, bc, ground_y)
        good = bvalid & jnp.isfinite(best_err) & okl
        return CuboidProposal(
            pos=jnp.where(good, pos, 0.0),
            scale=jnp.where(good, scale, 0.0),
            yaw=jnp.where(good, byaw, 0.0),
            corners_2d=bc,
            error=jnp.where(good, best_err, jnp.inf),
            ok=good,
        )

    return jax.vmap(per_box)(boxes, box_valid)
