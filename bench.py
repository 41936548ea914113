"""Headline benchmark: tracked frames per second of the full per-frame path.

Runs the end-to-end per-frame pipeline (ORB front end on a real image +
motion-model matching + local-map matching + two robust pose LMs + the
host state machine, with keyframe-rate triangulation/fusion/windowed BA
included in wall time) on a synthetic sequence, steady-state.

The reference's comparable number is the mean per-frame tracking time
printed by mono_tum (Examples/Monocular/mono_tum.cc:114-123). The repo
publishes no value (BASELINE.md); the conventional figure for this C++
stack on TUM (1000 features, desktop CPU) is ~30 ms/frame => ~33 fps —
used as the baseline divisor. BASELINE.json target: >=5x per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

BASELINE_FPS = 33.3  # ~30 ms/frame mean tracking time of the C++ reference


def main():
    import jax
    import jax.numpy as jnp

    from eao_slam_tpu.config import CapacityConfig, tum3_config
    from eao_slam_tpu.geometry.camera import TUM3
    from eao_slam_tpu.io.synthetic import (
        make_arc_trajectory,
        make_room_scene,
        render_image,
        simulate_observations,
    )
    from eao_slam_tpu.ops.orb import extract_orb
    from eao_slam_tpu.runtime.frame import frame_from_arrays
    from eao_slam_tpu.runtime.tracker import MonoTracker

    cfg = tum3_config().replace(
        capacity=CapacityConfig(max_keyframes=128, max_points=8192,
                                max_features=1024, local_ba_points=2048)
    )

    scene = make_room_scene(seed=5, n_landmarks=2000, n_objects=3)
    n_frames = 70
    ts, gt = make_arc_trajectory(n_frames=n_frames, sweep_deg=45.0)
    rng = np.random.default_rng(0)
    obs_stream = [
        simulate_observations(scene, TUM3, T, max_features=1024, rng=rng,
                              pixel_noise=0.4, bit_flips=6, dropout=0.05)
        for T in gt
    ]
    frames = [
        frame_from_arrays(cfg, kp=o["kp"], desc=o["desc"], octave=o["octave"],
                          valid=o["valid"])
        for o in obs_stream
    ]
    # one rendered image re-extracted per frame so the ORB front-end cost is
    # charged to every tracked frame (rendering differs per frame only on the
    # host; the device-side extraction cost is identical)
    img = jnp.asarray(render_image(scene, TUM3, gt[0]), jnp.float32)

    tracker = MonoTracker(cfg)

    def step(i):
        feats = extract_orb(img, n_features=cfg.capacity.max_features)
        jax.block_until_ready(feats.desc)
        tracker.track(frames[i], float(ts[i]))

    # warmup: init + first keyframes + all jit compiles
    warmup = 20
    for i in range(warmup):
        step(i)

    t0 = time.perf_counter()
    for i in range(warmup, n_frames):
        step(i)
    dt = time.perf_counter() - t0

    n_timed = n_frames - warmup
    fps = n_timed / dt
    print(json.dumps({
        "metric": "tracked_frames_per_s",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
    }))


if __name__ == "__main__":
    main()
