"""Device cascade resolver == host cascade resolver on randomized stats."""

import numpy as np
import jax.numpy as jnp

from eao_slam_tpu.config import DemoFlag, tum3_config
from eao_slam_tpu.objects.association import FrameDetections, ObjectUpdater
from eao_slam_tpu.objects.resolve import resolve_cascade
from eao_slam_tpu.objects.state import empty_object_table


def random_inputs(rng, B=6, J=12):
    """Plausible random stage tensors + object table."""
    det = FrameDetections(
        det_valid=jnp.asarray(rng.uniform(size=B) < 0.8),
        det_center=jnp.asarray(rng.normal(size=(B, 3)), jnp.float32),
        det_npts=jnp.asarray(rng.integers(0, 40, B), jnp.int32),
        det_pt_mask=jnp.zeros((B, 64), bool),
        feat_rect=jnp.asarray(rng.uniform(0, 400, (B, 4)), jnp.float32),
        iou_pred=jnp.asarray(rng.uniform(0, 1, (B, J)), jnp.float32),
        iou_thresh=jnp.asarray(rng.choice([0.5, 0.6], J), jnp.float32),
        np_pass=jnp.asarray(rng.uniform(size=(B, J)) < 0.4),
        np_m_ok=jnp.asarray(rng.uniform(size=B) < 0.7),
        np_n_ok=jnp.asarray(rng.uniform(size=J) < 0.7),
        proj_iou=jnp.asarray(rng.uniform(0, 0.8, (B, J)), jnp.float32),
        t_vals=jnp.asarray(rng.uniform(0, 20, (B, J, 3)), jnp.float32),
        sanity_iou=jnp.asarray(rng.uniform(0, 1, (B, J)), jnp.float32),
        sanity_former=jnp.asarray(rng.uniform(0, 1, (B, J)), jnp.float32),
        class_ok=jnp.asarray(rng.uniform(size=(B, J)) < 0.6),
        obj_sub_idx=jnp.zeros((J, 4), jnp.int32),
        obj_sub_mask=jnp.zeros((J, 4), bool),
    )
    table = empty_object_table(J)
    valid = rng.uniform(size=J) < 0.7
    table = table._replace(
        valid=jnp.asarray(valid),
        bad=jnp.asarray(rng.uniform(size=J) < 0.1),
        n_obs=jnp.asarray(rng.integers(1, 40, J), jnp.int32),
        cls=jnp.asarray(rng.integers(0, 3, J), jnp.int32),
    )
    bxs = jnp.asarray(
        np.stack([rng.uniform(0, 500, B), rng.uniform(0, 380, B),
                  rng.uniform(10, 120, B), rng.uniform(10, 90, B)], axis=1),
        jnp.float32,
    )
    return det, table, bxs


def test_device_matches_host_resolver():
    cfg = tum3_config(DemoFlag.EAO)
    upd = ObjectUpdater(cfg)
    rng = np.random.default_rng(42)
    for trial in range(12):
        det, table, bxs = random_inputs(rng)
        J = table.capacity
        cls_det = jnp.zeros((det.det_valid.shape[0],), jnp.int32)

        assoc_h, new_mask_h, re_pairs_h = upd._resolve(det, table, cls_det,
                                                       bxs, frame_id=10)
        slots_h = upd._allocate_slots(table, new_mask_h)
        re_h = np.zeros((J, J), np.int64)
        for s, d2 in re_pairs_h:
            re_h[s, d2] += 1

        res = resolve_cascade(
            det, table, jnp.asarray(upd.t_table), bxs,
            cfg.objects.proj_iou_threshold,
            use_iou=cfg.flag.use_iou,
            use_nonparam=cfg.flag.use_nonparam,
            use_ttest=cfg.flag.use_ttest,
            img_w=cfg.camera.width, img_h=cfg.camera.height,
            min_points=cfg.objects.min_points_per_object,
        )
        np.testing.assert_array_equal(np.asarray(res.assoc), assoc_h,
                                      err_msg=f"assoc trial {trial}")
        np.testing.assert_array_equal(np.asarray(res.new_slots), slots_h,
                                      err_msg=f"new slots trial {trial}")
        np.testing.assert_array_equal(np.asarray(res.re_inc), re_h,
                                      err_msg=f"re_obj trial {trial}")


def test_device_resolver_ablation_flags():
    """IoU-only and NP-only ablations also match (the flag harness,
    Examples/Monocular/mono_tum.cc:35-48)."""
    rng = np.random.default_rng(7)
    for flag in (DemoFlag.IOU, DemoFlag.NP):
        cfg = tum3_config(flag)
        upd = ObjectUpdater(cfg)
        for _ in range(4):
            det, table, bxs = random_inputs(rng)
            cls_det = jnp.zeros((det.det_valid.shape[0],), jnp.int32)
            assoc_h, new_mask_h, _ = upd._resolve(det, table, cls_det, bxs, 10)
            slots_h = upd._allocate_slots(table, new_mask_h)
            res = resolve_cascade(
                det, table, jnp.asarray(upd.t_table), bxs,
                cfg.objects.proj_iou_threshold,
                use_iou=cfg.flag.use_iou,
                use_nonparam=cfg.flag.use_nonparam,
                use_ttest=cfg.flag.use_ttest,
                img_w=cfg.camera.width, img_h=cfg.camera.height,
                min_points=cfg.objects.min_points_per_object,
            )
            np.testing.assert_array_equal(np.asarray(res.assoc), assoc_h)
            np.testing.assert_array_equal(np.asarray(res.new_slots), slots_h)
