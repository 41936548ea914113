"""Loop closing: place-recognition signatures + full Sim3 verify/correct on
a fabricated drifted circular trajectory with duplicated loop landmarks."""

import jax
import jax.numpy as jnp
import numpy as np

from eao_slam_tpu.config import CapacityConfig, tum3_config
from eao_slam_tpu.geometry import se3, sim3, so3
from eao_slam_tpu.geometry.camera import TUM3, project
from eao_slam_tpu.runtime.frame import pack_descriptors
from eao_slam_tpu.runtime.loop_closing import kf_signature
from eao_slam_tpu.runtime.tracker import MonoTracker


def small_cfg():
    return tum3_config().replace(
        capacity=CapacityConfig(
            max_keyframes=16, max_points=1024, max_features=128,
            local_ba_points=1024,
        )
    )


class TestSignatures:
    def test_same_place_scores_high(self, rng):
        base = rng.integers(0, 256, (100, 32), dtype=np.uint8)

        def noisy(d):
            out = d.copy()
            for _ in range(4):
                b = rng.integers(0, 32, len(out))
                out[np.arange(len(out)), b] ^= (1 << rng.integers(0, 8, len(out))).astype(np.uint8)
            return out

        F = 128
        def sig(d):
            desc = np.zeros((F, 8), np.uint32)
            desc[: len(d)] = pack_descriptors(d)
            valid = np.arange(F) < len(d)
            return np.asarray(kf_signature(jnp.asarray(desc), jnp.asarray(valid)))

        s1 = sig(noisy(base))
        s2 = sig(noisy(base))
        other = rng.integers(0, 256, (100, 32), dtype=np.uint8)
        s3 = sig(other)
        assert s1 @ s2 > 0.8
        assert s1 @ s3 < 0.5
        assert s1 @ s2 > 2.0 * (s1 @ s3)


def build_drifted_loop_tracker(rng, n_kf=12, per_group=25, drift_mag=0.15):
    """Circle of keyframes looking outward at landmark groups; later
    keyframes drift (translation + scale). Group 0 exists twice: the true
    copy (anchored at KF0) and a drifted duplicate re-triangulated by the
    last keyframe — the classic pre-loop-closure state."""
    cfg = small_cfg()
    tracker = MonoTracker(cfg)
    cam = TUM3
    F = cfg.capacity.max_features

    # true poses: on a circle radius 1, looking radially outward; the last
    # keyframe returns to the start angle (closed loop)
    T_true, S_drift = [], []
    for k in range(n_kf):
        ang = 2 * np.pi * k / (n_kf - 1)
        fwd = np.array([np.cos(ang), 0.0, np.sin(ang)])
        eye = fwd * 1.0
        # camera frame: z = fwd (outward), y = down, x = y × z (right-handed)
        y_axis = np.array([0.0, 1.0, 0.0])
        x_axis = np.cross(y_axis, fwd)
        R_wc = np.stack([x_axis, y_axis, fwd], axis=1)
        R_cw = R_wc.T
        t_cw = -R_cw @ eye
        T_true.append(np.concatenate([R_cw, t_cw[:, None]], 1).astype(np.float32))
        # drift grows with k then this is the accumulated error
        a = 0.0 if k < 2 else drift_mag * (k - 1) / (n_kf - 2)
        D = sim3.make(
            jnp.asarray(so3.exp(jnp.asarray([0.0, a * 0.3, 0.0], jnp.float32))),
            jnp.asarray([a, 0.0, a * 0.5], jnp.float32),
            jnp.asarray(1.0 + a * 0.3, jnp.float32),
        )
        S_drift.append(D)
    T_true = np.stack(T_true)

    # drifted poses: S_k_est = D_k * S_k_true
    T_est = []
    for k in range(n_kf):
        S = sim3.compose(S_drift[k], sim3.from_se3(jnp.asarray(T_true[k])))
        T_est.append(np.asarray(sim3.to_se3(S)))
    T_est = np.stack(T_est).astype(np.float32)

    # landmark groups: ring at radius 3 in front of each camera (the last
    # keyframe shares the first group's place, so it owns no group)
    groups_true = []
    for g in range(n_kf):
        ang = 2 * np.pi * g / (n_kf - 1)
        fwd = np.array([np.cos(ang), 0.0, np.sin(ang)])
        side = np.array([-np.sin(ang), 0.0, np.cos(ang)])
        base = fwd * 3.0
        pts = base[None] + rng.uniform(-0.8, 0.8, (per_group, 1)) * side[None] \
            + np.stack([np.zeros(per_group), rng.uniform(-0.8, 0.8, per_group),
                        np.zeros(per_group)], -1)
        groups_true.append(pts.astype(np.float32))
    descs = rng.integers(0, 256, (n_kf, per_group, 32), dtype=np.uint8)

    def drifted_pos(g_owner, X):
        """Where the drifted map believes owner g's landmarks are:
        X_est = S_est_g^-1 (S_true_g (X_true))."""
        S_t = sim3.from_se3(jnp.asarray(T_true[g_owner]))
        S_e = sim3.compose(S_drift[g_owner], S_t)
        return np.asarray(sim3.apply(sim3.inverse(S_e), sim3.apply(S_t, jnp.asarray(X))))

    m = tracker.map
    pt_cursor = 0
    group_pt_ids = {}          # (owner) -> point ids
    for g in range(n_kf):
        X_est = drifted_pos(g, groups_true[g])
        ids = np.arange(pt_cursor, pt_cursor + per_group, dtype=np.int32)
        pt_cursor += per_group
        group_pt_ids[g] = ids
        m = m._replace(
            pt_pos=m.pt_pos.at[ids].set(jnp.asarray(X_est)),
            pt_valid=m.pt_valid.at[ids].set(True),
            pt_desc=m.pt_desc.at[ids].set(jnp.asarray(pack_descriptors(descs[g].reshape(-1, 32)))),
            pt_first_kf=m.pt_first_kf.at[ids].set(g),
        )
    # duplicate of group 0 owned by the last keyframe (the loop duplicate)
    dup_ids = np.arange(pt_cursor, pt_cursor + per_group, dtype=np.int32)
    pt_cursor += per_group
    X_dup = drifted_pos(n_kf - 1, groups_true[0])
    m = m._replace(
        pt_pos=m.pt_pos.at[dup_ids].set(jnp.asarray(X_dup)),
        pt_valid=m.pt_valid.at[dup_ids].set(True),
        pt_desc=m.pt_desc.at[dup_ids].set(jnp.asarray(pack_descriptors(descs[0].reshape(-1, 32)))),
        pt_first_kf=m.pt_first_kf.at[dup_ids].set(n_kf - 1),
    )

    # keyframes: observe own group + previous group; last KF also sees the
    # duplicate of group 0
    for k in range(n_kf):
        obs_groups = []
        if k < n_kf - 1:
            obs_groups.append((k, group_pt_ids[k]))
        if k > 0:
            obs_groups.append((k - 1, group_pt_ids[k - 1]))
        if k == n_kf - 1:
            obs_groups.append((0, dup_ids))      # loop duplicate
        kp = np.zeros((F, 2), np.float32)
        desc = np.zeros((F, 8), np.uint32)
        octv = np.zeros((F,), np.int32)
        valid = np.zeros((F,), bool)
        ptid = np.full((F,), -1, np.int32)
        cur = 0
        Tk = jnp.asarray(T_est[k])
        for g_owner, ids in obs_groups:
            X = np.asarray(m.pt_pos)[ids]
            uv = np.asarray(project(TUM3, se3.apply(Tk, jnp.asarray(X))))
            xc = X @ np.asarray(T_est[k])[:3, :3].T + np.asarray(T_est[k])[:3, 3]
            vis = (xc[:, 2] > 0.2) & (uv[:, 0] > 5) & (uv[:, 0] < 635) \
                & (uv[:, 1] > 5) & (uv[:, 1] < 475)
            n = vis.sum()
            sel = np.nonzero(vis)[0]
            kp[cur:cur + n] = uv[sel]
            desc[cur:cur + n] = pack_descriptors(
                descs[g_owner % n_kf][sel].reshape(-1, 32)
            )
            valid[cur:cur + n] = True
            ptid[cur:cur + n] = ids[sel]
            cur += n
        m = m._replace(
            kf_pose=m.kf_pose.at[k].set(jnp.asarray(T_est[k])),
            kf_valid=m.kf_valid.at[k].set(True),
            kf_timestamp=m.kf_timestamp.at[k].set(float(k)),
            kf_kp=m.kf_kp.at[k].set(jnp.asarray(kp)),
            kf_desc=m.kf_desc.at[k].set(jnp.asarray(desc)),
            kf_octave=m.kf_octave.at[k].set(jnp.asarray(octv)),
            kf_kp_valid=m.kf_kp_valid.at[k].set(jnp.asarray(valid)),
            kf_pt_idx=m.kf_pt_idx.at[k].set(jnp.asarray(ptid)),
        )
        tracker.kf_valid_host[k] = True
        tracker.kf_pt_host[k] = ptid
        tracker.kf_slots.append(k)
        tracker.pt_valid_host[: pt_cursor] = True

    tracker.map = m
    tracker.last_T = T_est[-1]
    tracker.last_pt = jnp.asarray(tracker.kf_pt_host[n_kf - 1])
    # minimal last_frame so _apply_ba & co. work
    return tracker, T_true, T_est


def kf_ate(tracker, T_true):
    est = np.asarray(tracker.map.kf_pose)[tracker.kf_slots]
    est_c = np.stack([-T[:3, :3].T @ T[:3, 3] for T in est])
    true_c = np.stack([-T[:3, :3].T @ T[:3, 3] for T in T_true])
    return float(np.sqrt(((est_c - true_c) ** 2).sum(1).mean()))


class TestLoopCorrection:
    def test_verify_and_correct_reduces_drift(self, rng):
        tracker, T_true, T_est = build_drifted_loop_tracker(rng)
        lc = tracker.loop_closer
        ate_before = kf_ate(tracker, T_true)
        assert ate_before > 0.05, "scenario should start drifted"

        n = len(T_true)
        est_before = np.asarray(tracker.map.kf_pose)[tracker.kf_slots]
        end_err_before = np.linalg.norm(
            -est_before[n - 1][:3, :3].T @ est_before[n - 1][:3, 3]
            - (-T_true[n - 1][:3, :3].T @ T_true[n - 1][:3, 3])
        )

        ok = lc._verify_and_correct(tracker, slot=n - 1, cand=0)
        assert ok, "loop verification should succeed"

        ate_after = kf_ate(tracker, T_true)
        est_after = np.asarray(tracker.map.kf_pose)[tracker.kf_slots]
        end_err_after = np.linalg.norm(
            -est_after[n - 1][:3, :3].T @ est_after[n - 1][:3, 3]
            - (-T_true[n - 1][:3, :3].T @ T_true[n - 1][:3, 3])
        )
        # the loop endpoint snaps back to the anchor (this fabricated map's
        # bowed interior is itself a reprojection optimum, so mid-chain
        # correction is bounded — the endpoint collapse is the loop's work)
        assert end_err_after < 0.1 * end_err_before, (end_err_before, end_err_after)
        assert ate_after < ate_before

        # duplicated loop landmarks were fused away
        assert tracker.pt_valid_host.sum() < 12 * 25 + 25

    def test_detection_finds_loop_candidate(self, rng):
        tracker, T_true, T_est = build_drifted_loop_tracker(rng)
        lc = tracker.loop_closer
        n = len(tracker.kf_slots)
        for s in tracker.kf_slots:
            lc.signatures[s] = np.asarray(
                kf_signature(
                    tracker.map.kf_desc[s], tracker.map.kf_kp_valid[s]
                )
            )
        # prime the consistency streak as if the two previous keyframes had
        # already seen this candidate group
        lc.consistent_streak = {(0, 1): 2}
        cands = lc._detect(tracker, slot=n - 1, order=n - 1)
        assert 0 in cands, cands


def test_verify_succeeds_under_large_scale_drift(rng):
    """The r5 two-stage verification (seed Sim3 RANSAC + SearchBySim3
    growth, src/ORBmatcher.cc:1155 role) must still close when the loop
    ends differ by ~2x scale — the regime where the r4 single-shot
    20-match gate starved (large mono scale drift thins direct descriptor
    matches; measured on the orbit circuit)."""
    tracker, T_true, T_est = build_drifted_loop_tracker(rng, drift_mag=3.0)
    lc = tracker.loop_closer
    n = len(T_true)
    est0 = np.asarray(tracker.map.kf_pose)[tracker.kf_slots]
    end_before = np.linalg.norm(
        -est0[n - 1][:3, :3].T @ est0[n - 1][:3, 3]
        - (-T_true[n - 1][:3, :3].T @ T_true[n - 1][:3, 3]))

    ok = lc._verify_and_correct(tracker, slot=n - 1, cand=0)
    assert ok, "verification must survive ~1.9x scale drift"

    est1 = np.asarray(tracker.map.kf_pose)[tracker.kf_slots]
    end_after = np.linalg.norm(
        -est1[n - 1][:3, :3].T @ est1[n - 1][:3, 3]
        - (-T_true[n - 1][:3, :3].T @ T_true[n - 1][:3, 3]))
    assert end_after < 0.15 * end_before, (end_before, end_after)
