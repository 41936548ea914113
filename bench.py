"""Headline benchmark: tracked frames per second of the REAL per-frame path.

Honest pipeline per frame (no synthetic-feature substitution): a distinct
rendered VGA image goes through the full ORB front end (8-level pyramid +
dense FAST + per-tile selection + IC-angle + steered BRIEF) and THOSE
features drive motion-model matching + robust pose LM, local-map matching +
pose LM, the keyframe state machine, and — on keyframe frames —
triangulation, fusion and windowed Schur BA. Extraction and tracking are
fused into one jitted chunk program (lax.scan over C frames), one device
round trip per chunk.

The reference's comparable number is the mean per-frame tracking time
printed by mono_tum (Examples/Monocular/mono_tum.cc:114-123), which covers
exactly this span: image in -> pose out. The repo publishes no value
(BASELINE.md); the conventional figure for this C++ stack on TUM (1000
features, desktop CPU) is ~30 ms/frame => ~33 fps — used as the baseline
divisor. BASELINE.json target: >=5x per chip.

Rendering the input sequence is dataset *creation* (the reference reads
PNGs from disk); it happens once on the host and is cached in
.bench_frames.npz, exactly like a dataset directory.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np

BASELINE_FPS = 33.3  # ~30 ms/frame mean tracking time of the C++ reference
CHUNK = 32
N_CHUNKS = 4          # timed chunks
CACHE = os.path.join(os.path.dirname(__file__), ".bench_frames.npz")


def _dataset(n_frames: int):
    """Rendered image sequence + GT (host-side, cached like a dataset dir)."""
    from eao_slam_tpu.geometry.camera import TUM3
    from eao_slam_tpu.io.synthetic import (
        make_arc_trajectory,
        make_room_scene,
        render_image,
    )

    if os.path.exists(CACHE):
        d = np.load(CACHE)
        if d["images"].shape[0] >= n_frames:
            return d["images"][:n_frames], d["ts"][:n_frames], d["gt"][:n_frames]

    scene = make_room_scene(seed=5, n_landmarks=200, n_objects=3)
    ts, gt = make_arc_trajectory(n_frames=n_frames, sweep_deg=60.0)
    images = np.stack(
        [render_image(scene, TUM3, T) for T in gt]
    )  # [N, H, W] uint8
    np.savez_compressed(CACHE, images=images, ts=ts, gt=gt)
    return images, ts, gt


def main():
    import jax

    try:  # persistent compile cache: repeat runs skip the big chunk compile
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

    n_frames = 8 + CHUNK * (1 + N_CHUNKS)  # bootstrap + warmup + timed
    images, ts, gt = _dataset(n_frames)

    tracker = ChunkedTracker(cfg, chunk=CHUNK)
    inner_chunk = tracker._track_chunk

    def extract(im_u8):
        return extract_orb(im_u8.astype(jnp.float32), n_features=F,
                           n_levels=cfg.orb.n_levels)

    @jax.jit
    def extract_and_track(carry, images_u8, timestamps):
        """THE measured program: images in -> poses/states out."""
        feats = jax.vmap(extract)(images_u8)
        batch = FrameBatch(kp=feats.kp, desc=feats.desc, octave=feats.octave,
                           angle=feats.angle, valid=feats.valid,
                           timestamp=timestamps)
        return inner_chunk(carry, batch)

    # --- bootstrap on the interactive path (same front end, per-frame)
    ex1 = jax.jit(extract)
    i = 0
    while i < len(images) and tracker.carry is None:
        f = ex1(jnp.asarray(images[i]))
        fr = frame_from_arrays(cfg, kp=f.kp, desc=f.desc, octave=f.octave,
                               valid=f.valid, angle=f.angle)
        tracker.bootstrap(fr, float(ts[i]))
        i += 1
    assert tracker.carry is not None, "initialization failed"

    def run_chunk(lo):
        ims = jnp.asarray(images[lo:lo + CHUNK])
        tss = jnp.asarray(ts[lo:lo + CHUNK], jnp.float32)
        carry, outs = extract_and_track(tracker.carry, ims, tss)
        tracker.carry = carry
        return outs

    # warmup chunk (compiles the whole program)
    outs = jax.device_get(run_chunk(i))
    i += CHUNK

    t0 = time.perf_counter()
    done = 0
    while done < N_CHUNKS and i + CHUNK <= len(images):
        outs = run_chunk(i)
        i += CHUNK
        done += 1
    outs = jax.device_get(outs)  # one sync at the end of the timed region
    dt = time.perf_counter() - t0

    fps = done * CHUNK / dt
    tracked = int(np.sum(outs.state == 2))
    assert tracked >= CHUNK // 2, f"tracking collapsed: {tracked}/{CHUNK} OK"
    result = {
        "metric": "tracked_frames_per_s",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
