"""Decompose the keyframe-branch cost at bench shapes (scratch tool)."""
import os
import time

import numpy as np

CHUNK = 32
CACHE = os.path.join(os.path.dirname(__file__), ".bench_frames.npz")


def timeit(fn, *args, n=20, name=""):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:44s} {dt*1e3:8.3f} ms")
    return out


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
    from eao_slam_tpu.ops.orb import extract_orb, scale_sigma2
    from eao_slam_tpu.runtime.frame import frame_from_arrays
    from eao_slam_tpu.runtime.scan_tracker import (
        ChunkedTracker, FrameBatch, _cull_points, _window_ba,
    )
    from eao_slam_tpu.runtime.local_mapping import (
        fuse_into_keyframe, triangulate_with_neighbor,
    )

    cfg = tum3_config().replace(
        capacity=CapacityConfig(max_keyframes=128, max_points=8192,
                                max_features=1024, local_ba_points=2048)
    )
    F = cfg.capacity.max_features
    cam = cfg.camera
    d = np.load(CACHE)
    images, ts, gt = d["images"], d["ts"], d["gt"]

    tracker = ChunkedTracker(cfg, chunk=CHUNK)

    def extract(im_u8):
        return extract_orb(im_u8.astype(jnp.float32), n_features=F,
                           n_levels=cfg.orb.n_levels)

    ex1 = jax.jit(extract)
    i = 0
    while i < len(images) and tracker.carry is None:
        f = ex1(jnp.asarray(images[i]))
        fr = frame_from_arrays(cfg, kp=f.kp, desc=f.desc, octave=f.octave,
                               valid=f.valid, angle=f.angle)
        tracker.bootstrap(fr, float(ts[i]))
        i += 1

    # advance several chunks so the map is populated
    feats_fn = jax.jit(jax.vmap(extract))
    for _ in range(1):
        ims = jnp.asarray(images[i:i + CHUNK])
        tss = jnp.asarray(ts[i:i + CHUNK], jnp.float32)
        fe = feats_fn(ims)
        batch = FrameBatch(kp=fe.kp, desc=fe.desc, octave=fe.octave,
                           angle=fe.angle, valid=fe.valid, timestamp=tss)
        tracker.carry, outs = tracker._track_chunk(tracker.carry, batch)
    outs = jax.device_get(outs)
    print("kf per chunk:", outs.is_kf.sum(), "kf_count:",
          int(jax.device_get(tracker.carry.kf_count)))

    carry = tracker.carry
    m = carry.m
    scale2 = jnp.asarray(scale_sigma2(cfg.orb.n_levels, cfg.orb.scale_factor))
    slot = jnp.asarray(int(jax.device_get(carry.kf_count)) - 1, jnp.int32)
    nb = slot - 1

    tri_fn = jax.jit(lambda m, slot, nb: triangulate_with_neighbor(
        cam, m.kf_pose[slot], m.kf_kp[slot], m.kf_desc[slot],
        m.kf_octave[slot], m.kf_kp_valid[slot], m.kf_pt_idx[slot],
        m.kf_pose[nb], m.kf_kp[nb], m.kf_desc[nb],
        m.kf_octave[nb], m.kf_kp_valid[nb], m.kf_pt_idx[nb], scale2,
    ))
    timeit(tri_fn, m, slot, nb, name="triangulate_with_neighbor")

    fuse_fn = jax.jit(lambda m, slot: fuse_into_keyframe(
        cam, m.pt_pos, m.pt_valid, m.pt_desc, m.pt_min_dist, m.pt_max_dist,
        m.kf_pose[slot], m.kf_kp[slot], m.kf_desc[slot],
        m.kf_octave[slot], m.kf_kp_valid[slot], m.kf_pt_idx[slot], scale2,
    ))
    timeit(fuse_fn, m, slot, name="fuse_into_keyframe")

    W = cfg.mapping.local_ba_kf_window
    Pl = cfg.capacity.local_ba_points
    ba_fn = jax.jit(lambda m, kfc: _window_ba(cam, m, kfc, W, Pl, scale2))
    timeit(ba_fn, m, carry.kf_count, n=10, name=f"_window_ba W={W} Pl={Pl}")

    cull_fn = jax.jit(lambda m, slot: _cull_points(m, slot))
    timeit(cull_fn, m, slot, name="_cull_points")


if __name__ == "__main__":
    main()
