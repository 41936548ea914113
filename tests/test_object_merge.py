"""Merge/overlap pass: potential-association merges and the 5-case overlap
resolution (src/Object.cc:1607-2178, src/LocalMapping.cc:799-882)."""

import jax.numpy as jnp
import numpy as np

from eao_slam_tpu.config import CapacityConfig, tum3_config
from eao_slam_tpu.objects import empty_object_table
from eao_slam_tpu.objects.merge import pair_stats, run_merge_pass
from eao_slam_tpu.runtime.map_state import empty_map_state


def make_two_object_map(rng, c1, c2, n1=40, n2=40):
    cfg = tum3_config().replace(
        capacity=CapacityConfig(max_keyframes=8, max_points=512,
                                max_features=64, max_objects=8)
    )
    m = empty_map_state(cfg.capacity)
    pts1 = (c1 + rng.normal(0, 0.15, (n1, 3))).astype(np.float32)
    pts2 = (c2 + rng.normal(0, 0.15, (n2, 3))).astype(np.float32)
    allp = np.concatenate([pts1, pts2])
    owner = np.concatenate([np.zeros(n1), np.ones(n2)]).astype(np.int32)
    P = len(allp)
    m = m._replace(
        pt_pos=m.pt_pos.at[:P].set(jnp.asarray(allp)),
        pt_valid=m.pt_valid.at[:P].set(True),
        pt_object_id=m.pt_object_id.at[:P].set(jnp.asarray(owner)),
        pt_obj_votes=m.pt_obj_votes.at[:P].set(3),
    )
    table = empty_object_table(8)
    for j, (c, n) in enumerate(((c1, n1), (c2, n2))):
        table = table._replace(
            valid=table.valid.at[j].set(True),
            cls=table.cls.at[j].set(56),
            n_obs=table.n_obs.at[j].set(12),
            last_frame=table.last_frame.at[j].set(20),
            center=table.center.at[j].set(jnp.asarray(c, jnp.float32)),
            center_std=table.center_std.at[j].set(0.1),
            cent_sum=table.cent_sum.at[j].set(jnp.asarray(c) * 12.0),
            cent_sumsq=table.cent_sumsq.at[j].set((jnp.asarray(c) ** 2 + 0.01) * 12.0),
            cub_min=table.cub_min.at[j].set(-0.4),
            cub_max=table.cub_max.at[j].set(0.4),
            r_max=table.r_max.at[j].set(0.7),
        )
    return m, table


def test_potential_association_merge(rng):
    c = np.array([0.0, 0.0, 4.0])
    m, table = make_two_object_map(rng, c, c + 0.05)
    # flagged as potential associates repeatedly, never co-occurring
    table = table._replace(re_obj=table.re_obj.at[0, 1].set(5))
    m2, t2 = run_merge_pass(m, table)
    valid = np.asarray(t2.valid) & ~np.asarray(t2.bad)
    assert valid.sum() == 1
    # survivor holds (almost) all points
    owner = np.asarray(m2.pt_object_id)
    j = int(np.nonzero(valid)[0][0])
    assert (owner == j).sum() > 60


def test_overlap_case1_merges_same_class(rng):
    c = np.array([0.0, 0.0, 4.0])
    m, table = make_two_object_map(rng, c, c + 0.1)
    # no re_obj votes; rely on the overlap case analysis (IoU large,
    # volumes similar, never co-occurred, same class)
    m2, t2 = run_merge_pass(m, table)
    valid = np.asarray(t2.valid) & ~np.asarray(t2.bad)
    assert valid.sum() == 1


def test_cooccurring_objects_not_merged(rng):
    c = np.array([0.0, 0.0, 4.0])
    m, table = make_two_object_map(rng, c, c + 0.1)
    table = table._replace(
        co_occur=table.co_occur.at[0, 1].set(10).at[1, 0].set(10)
    )
    m2, t2 = run_merge_pass(m, table)
    valid = np.asarray(t2.valid) & ~np.asarray(t2.bad)
    # case 3 (divide) may prune points, but both objects survive
    assert valid.sum() == 2


def test_distant_objects_untouched(rng):
    m, table = make_two_object_map(
        rng, np.array([-1.5, 0.0, 4.0]), np.array([1.5, 0.0, 4.0])
    )
    m2, t2 = run_merge_pass(m, table)
    valid = np.asarray(t2.valid) & ~np.asarray(t2.bad)
    assert valid.sum() == 2
    np.testing.assert_array_equal(
        np.asarray(m2.pt_object_id), np.asarray(m.pt_object_id)
    )


def test_pair_stats_overlap_geometry(rng):
    m, table = make_two_object_map(
        rng, np.array([0.0, 0.0, 4.0]), np.array([0.5, 0.0, 4.0])
    )
    overlaps, overlap, iou3d, vol, nmem = pair_stats(m, table)
    assert bool(overlaps[0, 1])
    assert float(iou3d[0, 1]) > 0.1
    assert int(nmem[0]) == 40
