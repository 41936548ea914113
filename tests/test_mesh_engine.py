"""Mesh-parallel ENGINE integration (not just the solver library): the same
ChunkedTracker/System that the bench times runs over a jax.sharding.Mesh —
chunk extraction shards along the frame axis inside the fused extract+track
program, and the between-chunk global BA after loop correction dispatches
the distributed dense-clique Schur solver (parallel/dist_ba2.py).

The reference fronts its entire engine behind one facade
(src/System.cc:41-154); the mesh-parallel engine must front the same
product. Correctness bar: per-frame extraction is wholly per-device, so a
mesh run must reproduce the single-device trajectory bit-for-bit."""

import jax
import numpy as np
import pytest

from eao_slam_tpu.config import CapacityConfig, tum3_config
from eao_slam_tpu.geometry.camera import TUM3
from eao_slam_tpu.io.synthetic import (
    make_arc_trajectory,
    make_room_scene,
    render_image,
)
from eao_slam_tpu.parallel.frames import make_frame_mesh
from eao_slam_tpu.system import System

OK = 2


def small_cfg():
    return tum3_config().replace(
        capacity=CapacityConfig(
            max_keyframes=64, max_points=4096, max_features=256,
            local_ba_points=1024,
        )
    )


@pytest.fixture(scope="module")
def seq():
    scene = make_room_scene(seed=5, n_landmarks=200, n_objects=3)
    ts, gt = make_arc_trajectory(n_frames=24, sweep_deg=45.0)
    images = np.stack([render_image(scene, TUM3, T) for T in gt])
    return ts, gt, images


def _drive(sysm, ts, images):
    for i in range(len(images)):
        sysm.track_monocular(images[i], float(ts[i]))
    sysm.flush()
    return sysm.tracker.frame_trajectory()


@pytest.mark.slow
def test_mesh_engine_matches_single_device(seq):
    """System(mesh=8 devices) must emit the same trajectory as System():
    the frame-axis sharding splits work, never math."""
    ts, gt, images = seq
    assert jax.device_count() >= 8

    t1, T1 = _drive(System(small_cfg(), chunk=8), ts, images)
    mesh = make_frame_mesh(jax.devices()[:8])
    sys_m = System(small_cfg(), chunk=8, mesh=mesh)
    t2, T2 = _drive(sys_m, ts, images)

    assert sys_m.tracker.mesh is not None
    assert sys_m.tracker.state == OK
    np.testing.assert_array_equal(t1, t2)
    np.testing.assert_array_equal(T1, T2)


def test_mesh_auto_and_ba_solver_dispatch():
    """mesh="auto" arms the mesh on a multi-device host, and the engine's
    global-BA hook resolves to the distributed solver whose solution
    matches the single-chip 5+10 LM schedule."""
    from eao_slam_tpu.runtime.scan_tracker import ChunkedTracker
    from eao_slam_tpu.solvers.ba import local_ba

    from test_ba import make_ba_problem

    sysm = System(small_cfg(), mesh="auto")
    tr = sysm.tracker
    assert tr.mesh is not None and tr._ba_mesh is not None
    assert ChunkedTracker(small_cfg()).ba_solver is None  # single-chip: default

    rng = np.random.default_rng(3)
    prob, poses_true, _ = make_ba_problem(rng, K=5, P=256)
    res_d = tr.ba_solver(TUM3, prob)
    res_1 = local_ba(TUM3, prob)
    t_err = np.linalg.norm(
        np.asarray(res_d.poses)[:, :, 3] - np.asarray(res_1.poses)[:, :, 3],
        axis=1,
    )
    assert t_err.max() < 5e-3, f"distributed vs single-chip drift: {t_err}"
    gt_err = np.linalg.norm(
        np.asarray(res_d.poses)[:, :, 3] - poses_true[:, :, 3], axis=1)
    assert gt_err.max() < 0.01


def test_loop_closer_uses_engine_ba_solver():
    """The between-chunk LoopCloser must route its global BA through the
    tracker's ba_solver hook (the mesh engine's distributed dispatch)."""
    from eao_slam_tpu.runtime import local_mapping

    from test_ba import make_ba_problem

    calls = []
    rng = np.random.default_rng(4)
    prob, _, _ = make_ba_problem(rng, K=4, P=128)

    def spy(cam, p):
        calls.append(p)
        from eao_slam_tpu.solvers.ba import local_ba

        return local_ba(cam, p)

    # run_local_ba must honor the injected solver
    from eao_slam_tpu.ops.orb import scale_sigma2
    from eao_slam_tpu.runtime.map_state import empty_map_state

    cfg = small_cfg()
    m = empty_map_state(cfg.capacity)
    # place two keyframes + a handful of points so assembly is non-trivial
    import jax.numpy as jnp

    m = m._replace(
        kf_pose=m.kf_pose.at[:2].set(jnp.eye(3, 4)),
        kf_valid=m.kf_valid.at[:2].set(True),
    )
    res = local_mapping.run_local_ba(
        cfg.camera, m, [0, 1], [0],
        np.asarray(scale_sigma2(cfg.orb.n_levels, cfg.orb.scale_factor)),
        64, solver=spy,
    )
    assert len(calls) == 1, "injected BA solver was not dispatched"
    assert res.poses.shape == (2, 3, 4)
