"""Stage-level timing of the bench chunk program: extraction vs tracking
vs keyframe branch. Not part of the test suite — a perf scratch tool."""

import os
import time

import numpy as np

CHUNK = 32
CACHE = os.path.join(os.path.dirname(__file__), ".bench_frames.npz")


def timeit(fn, *args, n=10, name=""):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:40s} {dt*1e3:8.2f} ms/chunk  {dt*1e3/CHUNK:7.3f} ms/frame")
    return out, dt


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(__file__), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    import jax.numpy as jnp

    from eao_slam_tpu.config import CapacityConfig, tum3_config
    from eao_slam_tpu.ops.orb import extract_orb
    from eao_slam_tpu.runtime.frame import frame_from_arrays
    from eao_slam_tpu.runtime.scan_tracker import ChunkedTracker, FrameBatch

    cfg = tum3_config().replace(
        capacity=CapacityConfig(max_keyframes=128, max_points=8192,
                                max_features=1024, local_ba_points=2048)
    )
    F = cfg.capacity.max_features

    d = np.load(CACHE)
    images, ts, gt = d["images"], d["ts"], d["gt"]

    tracker = ChunkedTracker(cfg, chunk=CHUNK)
    inner_chunk = tracker._track_chunk

    def extract(im_u8):
        return extract_orb(im_u8.astype(jnp.float32), n_features=F,
                           n_levels=cfg.orb.n_levels)

    extract_chunk = jax.jit(jax.vmap(extract))

    @jax.jit
    def extract_and_track(carry, images_u8, timestamps):
        feats = jax.vmap(extract)(images_u8)
        batch = FrameBatch(kp=feats.kp, desc=feats.desc, octave=feats.octave,
                           angle=feats.angle, valid=feats.valid,
                           timestamp=timestamps)
        return inner_chunk(carry, batch)

    ex1 = jax.jit(extract)
    i = 0
    while i < len(images) and tracker.carry is None:
        f = ex1(jnp.asarray(images[i]))
        fr = frame_from_arrays(cfg, kp=f.kp, desc=f.desc, octave=f.octave,
                               valid=f.valid, angle=f.angle)
        tracker.bootstrap(fr, float(ts[i]))
        i += 1
    assert tracker.carry is not None

    ims = jnp.asarray(images[i:i + CHUNK])
    tss = jnp.asarray(ts[i:i + CHUNK], jnp.float32)

    # warm up / advance one chunk so the carry is mid-sequence
    carry, _ = extract_and_track(tracker.carry, ims, tss)
    jax.block_until_ready(carry)
    ims2 = jnp.asarray(images[i + CHUNK:i + 2 * CHUNK])
    tss2 = jnp.asarray(ts[i + CHUNK:i + 2 * CHUNK], jnp.float32)

    feats, t_ex = timeit(extract_chunk, ims2, n=20, name="extraction only (vmap x32)")
    batch = FrameBatch(kp=feats.kp, desc=feats.desc, octave=feats.octave,
                       angle=feats.angle, valid=feats.valid, timestamp=tss2)
    jax.block_until_ready(batch)
    _, t_tr = timeit(inner_chunk, carry, batch, n=20, name="tracking only (scan x32)")
    _, t_all = timeit(extract_and_track, carry, ims2, tss2, n=20,
                      name="fused extract+track")
    print(f"sum of parts: {(t_ex + t_tr)*1e3:.2f} ms; fused: {t_all*1e3:.2f} ms")
    print(f"fps fused: {CHUNK / t_all:.1f}")

    # ---- sub-stage scans: isolate motion-model, local-map, KF branch ----
    from eao_slam_tpu.geometry import se3
    from eao_slam_tpu.runtime import tracking_kernels as tk
    from eao_slam_tpu.ops.orb import scale_sigma2

    scale2 = jnp.asarray(scale_sigma2(cfg.orb.n_levels, cfg.orb.scale_factor))
    cam = cfg.camera
    m = carry.m

    @jax.jit
    def scan_motion_only(carry, batch):
        def step(c, xs):
            kp, desc, octave, angle, valid = xs
            r = tk.track_motion_model(
                cam, c.m.pt_pos, c.m.pt_valid, c.T_last,
                c.last_kp, c.last_desc, c.last_octave,
                c.last_angle, c.last_valid, c.last_pt,
                kp, desc, octave, angle, valid, scale2,
                radius=cfg.matcher.search_radius_motion,
            )
            c = c._replace(T_last=r.T, last_kp=kp, last_desc=desc,
                           last_octave=octave, last_angle=angle,
                           last_valid=valid, last_pt=r.cur_pt)
            return c, r.n_inliers
        xs = (batch.kp, batch.desc, batch.octave, batch.angle, batch.valid)
        return jax.lax.scan(step, carry, xs)

    @jax.jit
    def scan_localmap_only(carry, batch):
        def step(c, xs):
            kp, desc, octave, angle, valid = xs
            r = tk.track_local_map_step(
                cam, c.m.pt_pos, c.m.pt_valid, c.m.pt_desc, c.m.pt_normal,
                c.m.pt_min_dist, c.m.pt_max_dist, c.T_last, c.last_pt,
                kp, desc, octave, valid, scale2, n_levels=cfg.orb.n_levels,
            )
            c = c._replace(T_last=r.T, last_pt=r.cur_pt)
            return c, r.n_inliers
        xs = (batch.kp, batch.desc, batch.octave, batch.angle, batch.valid)
        return jax.lax.scan(step, carry, xs)

    timeit(scan_motion_only, carry, batch, n=20, name="scan: motion-model only")
    timeit(scan_localmap_only, carry, batch, n=20, name="scan: local-map only")

    # pose LM alone at frame shapes
    from eao_slam_tpu.solvers.pose_lm import optimize_pose
    F = cfg.capacity.max_features
    Xw = jnp.asarray(np.random.default_rng(0).uniform(-2, 2, (F, 3)), jnp.float32)
    uv = jnp.asarray(np.random.default_rng(1).uniform(0, 480, (F, 2)), jnp.float32)
    iv = jnp.ones((F,), jnp.float32)
    msk = jnp.ones((F,), bool)
    T0 = jnp.eye(3, 4)

    @jax.jit
    def scan_pose(T0):
        def step(c, _):
            r = optimize_pose(cam, c, Xw, uv, iv, msk)
            return r.T, r.n_inliers
        return jax.lax.scan(step, T0, None, length=3 * CHUNK)

    timeit(scan_pose, T0, n=20, name="scan: 96x optimize_pose")


if __name__ == "__main__":
    main()
