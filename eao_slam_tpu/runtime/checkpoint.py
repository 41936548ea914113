"""Map checkpoint / resume.

The reference never implemented persistence — System::SaveMap/LoadMap are
TODO stubs (include/System.h:115-117, SURVEY.md §5). With the map as one
SoA pytree this is trivial: every MapState / ObjectTable field serializes
as an array, plus a small JSON blob of host-side bookkeeping. A restored
tracker relocalizes into the loaded map (the standard localization-mode
workflow the reference's viewer toggle hints at).
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from eao_slam_tpu.objects.state import ObjectTable, empty_object_table
from eao_slam_tpu.runtime.map_state import MapState

FORMAT_VERSION = 1


def save_checkpoint(path: str, tracker) -> None:
    """Serialize the tracker's map + object table + host mirrors."""
    arrays = {f"map_{k}": np.asarray(v) for k, v in tracker.map._asdict().items()}
    if tracker.obj_table is not None:
        arrays.update(
            {f"obj_{k}": np.asarray(v) for k, v in tracker.obj_table._asdict().items()}
        )
    arrays["kf_pt_host"] = tracker.kf_pt_host
    arrays["kf_valid_host"] = tracker.kf_valid_host
    arrays["pt_valid_host"] = tracker.pt_valid_host
    arrays["pt_first_kf_host"] = tracker.pt_first_kf_host
    meta = {
        "version": FORMAT_VERSION,
        "kf_slots": [int(s) for s in tracker.kf_slots],
        "frame_id": int(tracker.frame_id),
        "n_points": int(tracker.n_points),
        "state": int(tracker.state),
        "flag": tracker.cfg.flag.value,
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, meta=json.dumps(meta), **arrays)
    os.replace(tmp, path)


def load_checkpoint(path: str, tracker) -> dict:
    """Restore a checkpoint into an existing tracker (same capacities).
    Returns the metadata dict. The tracker resumes in LOST state and
    relocalizes against the restored map."""
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["meta"]))
    if meta["version"] != FORMAT_VERSION:
        raise ValueError(f"checkpoint version {meta['version']} unsupported")

    map_kw = {}
    for k in MapState._fields:
        arr = data[f"map_{k}"]
        cur = getattr(tracker.map, k)
        if tuple(arr.shape) != tuple(cur.shape):
            raise ValueError(
                f"checkpoint field {k} shape {arr.shape} != capacity {cur.shape}"
            )
        map_kw[k] = jnp.asarray(arr)
    tracker.map = MapState(**map_kw)

    if tracker.obj_table is not None and "obj_valid" in data:
        obj_kw = {k: jnp.asarray(data[f"obj_{k}"]) for k in ObjectTable._fields}
        tracker.obj_table = ObjectTable(**obj_kw)

    tracker.kf_pt_host = data["kf_pt_host"].copy()
    tracker.kf_valid_host = data["kf_valid_host"].copy()
    tracker.pt_valid_host = data["pt_valid_host"].copy()
    tracker.pt_first_kf_host = data["pt_first_kf_host"].copy()
    tracker.kf_slots = list(meta["kf_slots"])
    tracker.frame_id = meta["frame_id"]
    tracker.n_points = meta["n_points"]

    # resume by relocalizing into the restored map
    from eao_slam_tpu.runtime.tracker import LOST

    tracker.state = LOST
    tracker.velocity = None
    tracker.last_T = (
        np.asarray(tracker.map.kf_pose)[tracker.kf_slots[-1]]
        if tracker.kf_slots else None
    )
    if tracker.loop_closer is not None and tracker.kf_slots:
        from eao_slam_tpu.runtime.loop_closing import kf_signature

        for s in tracker.kf_slots:
            tracker.loop_closer.signatures[s] = np.asarray(
                kf_signature(tracker.map.kf_desc[s], tracker.map.kf_kp_valid[s])
            )
    return meta
