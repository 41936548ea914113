"""Synthetic dataset generation: rendered image sequences + feature-level sim.

The environment has no TUM images on disk (zero egress), so integration tests
and benches run on synthetic sequences with exact ground truth:

  * image level — a textured 3D room (quads: walls/floor + object cuboids)
    rendered by ray-quad intersection, driving the real ORB front end.
  * feature level — ideal landmark projections + noisy binary descriptors,
    driving the estimator stack (matching, init, BA, objects) in isolation.

Both generators follow the reference's dataset contract (timestamps, GT in
TUM order, YOLO-style boxes per frame — src/Tracking.cc:426-555) so the
runtime consumes synthetic and real data through the same interface.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np


# ---------------------------------------------------------------------------
# scene definition
# ---------------------------------------------------------------------------

class Quad(NamedTuple):
    origin: np.ndarray   # [3]
    eu: np.ndarray       # [3] edge u
    ev: np.ndarray       # [3] edge v
    texture: np.ndarray  # [T, T] float32 in [0, 255]


class Scene(NamedTuple):
    quads: list                   # list[Quad]
    obj_centers: np.ndarray       # [J, 3]
    obj_sizes: np.ndarray         # [J, 3] full extents
    obj_classes: np.ndarray       # [J] int
    landmarks: np.ndarray         # [M, 3] feature-level 3D points
    landmark_obj: np.ndarray      # [M] object id or -1 (background)
    descriptors: np.ndarray       # [M, 32] uint8 per-landmark ORB-like descriptor


def _smooth_texture(rng: np.random.Generator, size: int = 512, octaves: int = 4) -> np.ndarray:
    """Multi-octave value noise — high-contrast, corner-rich texture."""
    tex = np.zeros((size, size), np.float32)
    for o in range(octaves):
        s = 8 << o
        coarse = rng.uniform(0, 1, (s, s)).astype(np.float32)
        # bilinear upsample to full size
        idx = np.linspace(0, s - 1, size)
        xi = np.clip(idx.astype(int), 0, s - 2)
        fx = (idx - xi).astype(np.float32)
        row = coarse[xi][:, xi] * (1 - fx)[None, :] + coarse[xi][:, xi + 1] * fx[None, :]
        row2 = coarse[xi + 1][:, xi] * (1 - fx)[None, :] + coarse[xi + 1][:, xi + 1] * fx[None, :]
        tex += (row * (1 - fx)[:, None] + row2 * fx[:, None]) / (o + 1)
    # sprinkle high-frequency speckle so FAST has corners everywhere
    tex += rng.uniform(-0.15, 0.15, (size, size)).astype(np.float32)
    tex -= tex.min()
    tex /= tex.max() + 1e-9
    return (tex * 235.0 + 10.0).astype(np.float32)


# per-face brightness multipliers for line-detection fixtures: real objects
# present strong intensity steps across their silhouette/face edges (what
# EDLines detects in the reference's Frame ctor, src/Frame.cc:324-335);
# flat value-noise faces render cuboids whose edges no line detector can
# see. Shaded faces also weaken/perturb the FAST corners on and around the
# object (measured +16 cm bench ATE on the 60° arc), so shading is an
# explicit OPT-IN for the line/yaw test scenes — the tracking/throughput
# benchmark keeps uniform faces.
FACE_SHADE_LINES = (0.85, 0.45, 1.0, 0.60)


def _cuboid_quads(rng, center, size, tex_size=256, face_shade=None):
    cx, cy, cz = center
    sx, sy, sz = np.asarray(size) / 2.0
    quads = []
    # front (-z), top (-y), right (+x) — the faces typically visible from
    # the orbit trajectory; others add no test value.
    faces = [
        ([cx - sx, cy - sy, cz - sz], [2 * sx, 0, 0], [0, 2 * sy, 0]),   # front
        ([cx - sx, cy - sy, cz - sz], [2 * sx, 0, 0], [0, 0, 2 * sz]),   # top (y-)
        ([cx + sx, cy - sy, cz - sz], [0, 2 * sy, 0], [0, 0, 2 * sz]),   # right
        ([cx - sx, cy - sy, cz - sz], [0, 2 * sy, 0], [0, 0, 2 * sz]),   # left
    ]
    shade = face_shade if face_shade is not None else (1.0, 1.0, 1.0, 1.0)
    for (o, eu, ev), s in zip(faces, shade):
        quads.append(
            Quad(np.asarray(o, np.float64), np.asarray(eu, np.float64),
                 np.asarray(ev, np.float64),
                 _smooth_texture(rng, tex_size) * s))
    return quads


def make_room_scene(
    seed: int = 0,
    n_landmarks: int = 2000,
    n_objects: int = 3,
    obj_size_range: tuple = (0.4, 0.9),
    obj_z_range: tuple = (3.2, 4.8),
    face_shade: Optional[tuple] = None,
    closed_room: bool = False,
) -> Scene:
    """A 6x4x6 m room (y down, camera starts near origin looking at +z) with
    textured walls, floor, and a few cuboid 'objects' standing in it.
    closed_room adds the front wall (z=0) so 360-degree orbit trajectories
    (make_orbit_trajectory — the loop-closure benchmark) always face
    texture; the default keeps the open room so existing fixtures render
    byte-identically."""
    rng = np.random.default_rng(seed)
    quads = []
    # back wall at z=6, x in [-3,3], y in [-2,2]
    quads.append(Quad(np.array([-3.0, -2.0, 6.0]), np.array([6.0, 0, 0]),
                      np.array([0, 4.0, 0]), _smooth_texture(rng, 1024)))
    # floor at y=2
    quads.append(Quad(np.array([-3.0, 2.0, 0.0]), np.array([6.0, 0, 0]),
                      np.array([0, 0, 6.0]), _smooth_texture(rng, 1024)))
    # left wall x=-3
    quads.append(Quad(np.array([-3.0, -2.0, 0.0]), np.array([0, 4.0, 0]),
                      np.array([0, 0, 6.0]), _smooth_texture(rng, 1024)))
    # right wall x=3
    quads.append(Quad(np.array([3.0, -2.0, 0.0]), np.array([0, 4.0, 0]),
                      np.array([0, 0, 6.0]), _smooth_texture(rng, 1024)))
    if closed_room:
        # front wall z=0 (behind the default camera start)
        quads.append(Quad(np.array([-3.0, -2.0, 0.0]), np.array([6.0, 0, 0]),
                          np.array([0, 4.0, 0]), _smooth_texture(rng, 1024)))

    # objects: cuboids at table height (lifted off the floor so their
    # boxes project inside the image instead of hugging the bottom edge)
    classes = np.array([56, 62, 73, 66, 41][:n_objects], np.int32)  # chair, tv, book, keyboard...
    centers, sizes = [], []
    xs = np.linspace(-1.6, 1.6, max(n_objects, 2))
    for j in range(n_objects):
        size = rng.uniform(*obj_size_range, 3)
        lift = rng.uniform(0.5, 1.1)
        c = np.array([xs[j], 2.0 - size[1] / 2.0 - lift,
                      rng.uniform(*obj_z_range)])
        centers.append(c)
        sizes.append(size)
        quads.extend(_cuboid_quads(rng, c, size, face_shade=face_shade))
    centers = np.asarray(centers).reshape(-1, 3)
    sizes = np.asarray(sizes).reshape(-1, 3)

    # feature-level landmarks: most on walls, clusters inside each object
    # (closed rooms sample the front wall too, so the feature-level sim
    # covers every orbit heading)
    lm, lm_obj = [], []
    n_bg = max(n_landmarks - 60 * n_objects, 16)
    wall_pick = rng.integers(0, 5 if closed_room else 4, n_bg)
    u = rng.uniform(0.02, 0.98, n_bg)
    v = rng.uniform(0.02, 0.98, n_bg)
    for i in range(n_bg):
        q = quads[wall_pick[i]]
        lm.append(q.origin + u[i] * q.eu + v[i] * q.ev)
        lm_obj.append(-1)
    for j in range(n_objects):
        pts = centers[j] + rng.uniform(-0.5, 0.5, (60, 3)) * sizes[j][None, :] * 0.95
        lm.extend(pts)
        lm_obj.extend([j] * 60)
    lm = np.asarray(lm, np.float64)
    lm_obj = np.asarray(lm_obj, np.int32)
    desc = rng.integers(0, 256, (len(lm), 32), dtype=np.uint8)
    return Scene(quads, centers, sizes, classes, lm, lm_obj, desc)


# ---------------------------------------------------------------------------
# trajectory
# ---------------------------------------------------------------------------

def look_at(eye: np.ndarray, target: np.ndarray, up=(0.0, -1.0, 0.0)) -> np.ndarray:
    """Camera-from-world pose with +z forward, y down (OpenCV convention)."""
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    up = np.asarray(up, np.float64)
    right = np.cross(-up, fwd)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    R_wc = np.stack([right, down, fwd], axis=1)  # world-from-camera columns
    R_cw = R_wc.T
    t_cw = -R_cw @ eye
    return np.concatenate([R_cw, t_cw[:, None]], axis=1)


def make_arc_trajectory(
    n_frames: int,
    radius: float = 1.2,
    target=(0.0, 0.0, 4.5),
    sweep_deg: float = 50.0,
    bob: float = 0.15,
    fps: float = 30.0,
    closed_loop: bool = False,
):
    """Smooth lateral arc with slight vertical bob, always fixating the scene
    center — the classic handheld-SLAM motion. Returns (timestamps [N],
    T_cw [N, 3, 4])."""
    target = np.asarray(target, np.float64)
    ts = np.arange(n_frames, dtype=np.float64) / fps
    phase = np.linspace(0, 2 * np.pi if closed_loop else np.pi, n_frames)
    ang = np.deg2rad(sweep_deg) * np.sin(phase)
    poses = np.zeros((n_frames, 3, 4))
    for i in range(n_frames):
        eye = np.array(
            [radius * np.sin(ang[i]),
             bob * np.sin(3.0 * phase[i]),
             radius * (1.0 - np.cos(ang[i])) * 0.3]
        )
        poses[i] = look_at(eye, target)
    return ts, poses


def make_orbit_trajectory(
    n_frames: int,
    radius: float = 2.2,
    center=(0.0, 0.0, 3.0),
    orbits: float = 1.0,
    bob: float = 0.12,
    fps: float = 30.0,
):
    """Camera on a horizontal circle about the room center, always
    fixating it — the loop-closure benchmark trajectory (use with
    make_room_scene(closed_room=True) so the background is textured from
    every heading). This is make_arc_trajectory's proven fixating motion
    extended to a full revolution: the camera starts near the front wall
    looking at +z and sweeps the whole room.

    After a revolution the camera re-observes its starting view with a
    revolution's worth of accumulated mono drift; through the middle of
    the orbit it views the scene from the opposite side against the
    opposite wall, so the early keyframes drop out of the covisibility
    graph — the precondition DetectLoop's covisible-exclusion gate needs
    before it may propose a loop candidate (src/LoopClosing.cc:103-229).
    (An outward-looking orbit variant was measured and rejected: with the
    view tangent to the new-scene frontier, matchable map support falls
    below the OK threshold ~40 degrees in at every tested profile.)
    Returns (timestamps [N], T_cw [N, 3, 4])."""
    center = np.asarray(center, np.float64)
    ts = np.arange(n_frames, dtype=np.float64) / fps
    th = np.linspace(0.0, 2.0 * np.pi * orbits, n_frames)
    poses = np.zeros((n_frames, 3, 4))
    for i in range(n_frames):
        eye = center + np.array([radius * np.sin(th[i]),
                                 bob * np.sin(5.0 * th[i]),
                                 -radius * np.cos(th[i])])
        poses[i] = look_at(eye, center)
    return ts, poses


# ---------------------------------------------------------------------------
# image rendering (ray casting against quads)
# ---------------------------------------------------------------------------

def render_image(scene: Scene, cam, T_cw: np.ndarray, supersample: int = 1,
                 return_depth: bool = False):
    """Render a grayscale uint8 image by intersecting pixel rays with every
    quad and shading from its texture (bilinear). Pure numpy; used offline to
    build test sequences, not on the hot path. With return_depth, also
    returns the z-depth map (camera-frame z, inf where no hit)."""
    H = int(cam.height) * supersample
    W = int(cam.width) * supersample
    R_cw = T_cw[:3, :3]
    t_cw = T_cw[:3, 3]
    R_wc = R_cw.T
    eye = -R_wc @ t_cw

    u = (np.arange(W) + 0.5) / supersample - 0.5
    v = (np.arange(H) + 0.5) / supersample - 0.5
    uu, vv = np.meshgrid(u, v)
    dirs_cam = np.stack(
        [(uu - cam.cx) / cam.fx, (vv - cam.cy) / cam.fy, np.ones_like(uu)], axis=-1
    )
    dirs = dirs_cam @ R_wc.T  # world-frame ray directions, [H, W, 3]

    best_t = np.full((H, W), np.inf)
    img = np.zeros((H, W), np.float32)
    for q in scene.quads:
        n = np.cross(q.eu, q.ev)
        denom = dirs @ n
        d = (q.origin - eye) @ n
        tt = np.where(np.abs(denom) > 1e-12, d / np.where(denom == 0, 1e-12, denom), np.inf)
        hit = eye[None, None, :] + tt[..., None] * dirs
        rel = hit - q.origin
        e_uu = q.eu @ q.eu
        e_vv = q.ev @ q.ev
        e_uv = q.eu @ q.ev
        ru = rel @ q.eu
        rv = rel @ q.ev
        det = e_uu * e_vv - e_uv * e_uv
        a = (ru * e_vv - rv * e_uv) / det
        b = (rv * e_uu - ru * e_uv) / det
        ok = (tt > 1e-6) & (tt < best_t) & (a >= 0) & (a <= 1) & (b >= 0) & (b <= 1)
        if not ok.any():
            continue
        # rays parallel to the quad produce inf/nan barycentrics; they are
        # ok-masked out of the shading but must not poison the gather below
        a = np.where(np.isfinite(a), a, 0.0)
        b = np.where(np.isfinite(b), b, 0.0)
        T = q.texture.shape[0]
        ta = np.clip(a * (T - 1), 0, T - 1.001)
        tb = np.clip(b * (T - 1), 0, T - 1.001)
        ia, ib = ta.astype(int), tb.astype(int)
        fa, fb = ta - ia, tb - ib
        tex = q.texture
        val = (
            tex[ib, ia] * (1 - fa) * (1 - fb)
            + tex[ib, ia + 1] * fa * (1 - fb)
            + tex[ib + 1, ia] * (1 - fa) * fb
            + tex[ib + 1, ia + 1] * fa * fb
        )
        img = np.where(ok, val, img)
        best_t = np.where(ok, tt, best_t)
    if supersample > 1:
        img = img.reshape(cam.height, supersample, cam.width, supersample).mean((1, 3))
    out = np.clip(img, 0, 255).astype(np.uint8)
    if return_depth:
        # ray dirs have unit z in the camera frame, so the ray parameter t
        # IS the camera-frame z-depth
        z = best_t
        if supersample > 1:
            z = z.reshape(cam.height, supersample, cam.width, supersample).mean((1, 3))
        return out, z
    return out


def project_boxes(scene: Scene, cam, T_cw: np.ndarray, max_boxes: int, pad: float = 4.0):
    """Synthetic 'offline YOLO' detections: project each cuboid's corners and
    take the clipped bounding rect. Returns fixed-size arrays in the
    reference txt contract order (class x y w h score)."""
    J = len(scene.obj_centers)
    boxes = np.zeros((max_boxes, 4), np.float32)
    cls = np.full((max_boxes,), -1, np.int32)
    score = np.zeros((max_boxes,), np.float32)
    valid = np.zeros((max_boxes,), bool)
    R, t = T_cw[:3, :3], T_cw[:3, 3]
    n = 0
    for j in range(J):
        c, s = scene.obj_centers[j], scene.obj_sizes[j] / 2
        corners = c[None, :] + np.array(
            [[sx, sy, sz] for sx in (-s[0], s[0]) for sy in (-s[1], s[1]) for sz in (-s[2], s[2])]
        )
        pc = corners @ R.T + t
        if (pc[:, 2] <= 0.1).any():
            continue
        uvs = np.stack(
            [cam.fx * pc[:, 0] / pc[:, 2] + cam.cx, cam.fy * pc[:, 1] / pc[:, 2] + cam.cy], -1
        )
        x0, y0 = uvs.min(0) - pad
        x1, y1 = uvs.max(0) + pad
        x0, y0 = max(x0, 0), max(y0, 0)
        x1, y1 = min(x1, cam.width - 1), min(y1, cam.height - 1)
        if x1 - x0 < 10 or y1 - y0 < 10 or n >= max_boxes:
            continue
        boxes[n] = (x0, y0, x1 - x0, y1 - y0)
        cls[n] = scene.obj_classes[j]
        score[n] = 0.95
        valid[n] = True
        n += 1
    return boxes, cls, score, valid


# ---------------------------------------------------------------------------
# feature-level simulation
# ---------------------------------------------------------------------------

def simulate_observations(
    scene: Scene,
    cam,
    T_cw: np.ndarray,
    max_features: int,
    rng: np.random.Generator,
    pixel_noise: float = 0.5,
    bit_flips: int = 8,
    dropout: float = 0.05,
):
    """Ideal front-end output for one frame: padded keypoints, descriptors,
    octaves, and the true landmark index per slot (for oracle checks).

    Returns dict with kp [F,2] f32, desc [F,32] u8, octave [F] i32,
    lm_idx [F] i32 (-1 pad), valid [F] bool.
    """
    R, t = T_cw[:3, :3], T_cw[:3, 3]
    pc = scene.landmarks @ R.T + t
    z = pc[:, 2]
    uv = np.stack([cam.fx * pc[:, 0] / np.maximum(z, 1e-6) + cam.cx,
                   cam.fy * pc[:, 1] / np.maximum(z, 1e-6) + cam.cy], -1)
    vis = (z > 0.2) & (uv[:, 0] >= 8) & (uv[:, 0] < cam.width - 8) \
        & (uv[:, 1] >= 8) & (uv[:, 1] < cam.height - 8)
    vis &= rng.uniform(size=len(vis)) > dropout
    idx = np.nonzero(vis)[0]
    rng.shuffle(idx)
    idx = idx[:max_features]

    F = max_features
    kp = np.zeros((F, 2), np.float32)
    desc = np.zeros((F, 32), np.uint8)
    octv = np.zeros((F,), np.int32)
    lm_idx = np.full((F,), -1, np.int32)
    valid = np.zeros((F,), bool)
    n = len(idx)
    kp[:n] = uv[idx] + rng.normal(0, pixel_noise, (n, 2))
    d = scene.descriptors[idx].copy()
    # flip a few random bits to emulate descriptor noise
    for _ in range(bit_flips):
        byte = rng.integers(0, 32, n)
        bit = rng.integers(0, 8, n)
        d[np.arange(n), byte] ^= (1 << bit).astype(np.uint8)
    desc[:n] = d
    # octave from depth: nearer -> finer (roughly what scale invariance does)
    octv[:n] = np.clip((np.log(np.maximum(z[idx], 0.3) / 0.3) / np.log(1.2)).astype(int), 0, 7) % 8
    lm_idx[:n] = idx
    valid[:n] = True
    return dict(kp=kp, desc=desc, octave=octv, lm_idx=lm_idx, valid=valid)
