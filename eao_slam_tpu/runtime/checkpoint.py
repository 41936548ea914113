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


# ---------------------------------------------------------------------------
# production (chunked) engine checkpoint: the full ChunkCarry + host state
# ---------------------------------------------------------------------------

CHUNKED_VERSION = 2


def save_chunked_checkpoint(path: str, tracker, kf_images: dict = None) -> None:
    """Serialize a ChunkedTracker mid-sequence: the whole device ChunkCarry
    (map, object table, motion model, last-frame block, allocator counters),
    the host trajectory records, and the loop-closer's signatures /
    consistency streaks — everything needed to resume tracking exactly
    where it stopped. Optionally embeds the System's retained keyframe
    images so the offline semi-dense phase survives the round trip.

    The reference's System::SaveMap/LoadMap are TODO stubs
    (include/System.h:115-117); SoA state makes real persistence one
    np.savez of the pytree."""
    import json as _json

    c = tracker.carry
    assert c is not None, "nothing to checkpoint: tracker not armed"
    arrays = {}
    for k, v in c._asdict().items():
        if k == "m":
            arrays.update({f"m_{f}": np.asarray(x)
                           for f, x in v._asdict().items()})
        elif k == "table":
            arrays.update({f"t_{f}": np.asarray(x)
                           for f, x in v._asdict().items()})
        else:
            arrays[f"c_{k}"] = np.asarray(v)
    if kf_images:
        arrays["kf_image_slots"] = np.asarray(sorted(kf_images), np.int32)
        arrays["kf_images"] = np.stack(
            [np.asarray(kf_images[s], np.float32)
             for s in sorted(kf_images)])

    lc = tracker.loop_closer
    if lc is not None:
        arrays["lc_signatures"] = lc.signatures
    meta = {
        "version": CHUNKED_VERSION,
        "flag": tracker.cfg.flag.value,
        "chunk": tracker.chunk,
        "records": [
            [float(t), None if T is None else np.asarray(T).tolist(), int(s)]
            for t, T, s in tracker.records
        ],
        "last_kf_slots": [[int(i), int(s)] for i, s in tracker.last_kf_slots],
        "n_maintenance": int(tracker.n_maintenance),
        "loop_checked": int(tracker._loop_checked),
        "localization_only": bool(tracker._localization_only),
        "loop_rng": np.asarray(tracker._loop_rng).tolist(),
        "lc_streaks": (
            [[list(g), int(n)] for g, n in lc.consistent_streak.items()]
            if lc is not None else []
        ),
        "lc_last_loop_order": int(lc.last_loop_order) if lc is not None else -999,
        "lc_closed_loops": int(lc.closed_loops) if lc is not None else 0,
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, chunked_meta=_json.dumps(meta), **arrays)
    os.replace(tmp, path)


def load_chunked_checkpoint(path: str, tracker) -> dict:
    """Restore a chunked checkpoint into an armed-or-fresh ChunkedTracker
    of the SAME config capacities. Tracking resumes exactly (state, motion
    model and last-frame block restored) — not via relocalization.
    Returns (meta dict, kf_images dict)."""
    import json as _json

    import jax

    from eao_slam_tpu.runtime.scan_tracker import ChunkCarry

    data = np.load(path, allow_pickle=False)
    if "chunked_meta" not in data:
        raise ValueError("not a chunked checkpoint (see load_checkpoint)")
    meta = _json.loads(str(data["chunked_meta"]))
    if meta["version"] != CHUNKED_VERSION:
        raise ValueError(f"chunked checkpoint v{meta['version']} unsupported")
    if meta["flag"] != tracker.cfg.flag.value:
        raise ValueError(
            f"checkpoint flag {meta['flag']} != config {tracker.cfg.flag.value}")
    # capacity check before any assignment (the v1 loader's contract): a
    # wrong-shaped carry would desync from the K/P/F constants baked into
    # the compiled chunk program and fail later as an obscure XLA error
    cap = tracker.cfg.capacity
    expect = {
        "m_kf_pose": (cap.max_keyframes, 3, 4),
        "m_pt_pos": (cap.max_points, 3),
        "c_last_kp": (cap.max_features, 2),
    }
    for k, shape in expect.items():
        if tuple(data[k].shape) != shape:
            raise ValueError(
                f"checkpoint field {k} shape {data[k].shape} != capacity "
                f"{shape}")

    from eao_slam_tpu.objects.state import ObjectTable

    m = MapState(**{f: jnp.asarray(data[f"m_{f}"]) for f in MapState._fields})
    table = ObjectTable(
        **{f: jnp.asarray(data[f"t_{f}"]) for f in ObjectTable._fields})
    kw = {}
    for k in ChunkCarry._fields:
        if k == "m":
            kw[k] = m
        elif k == "table":
            kw[k] = table
        else:
            kw[k] = jnp.asarray(data[f"c_{k}"])
    tracker.carry = ChunkCarry(**kw)
    tracker.kf_count_host = int(data["c_kf_count"])
    tracker.pt_count_host = int(data["c_pt_count"])
    tracker.state_host = int(data["c_state"])
    tracker.records = [
        (t, None if T is None else np.asarray(T, np.float32), s)
        for t, T, s in meta["records"]
    ]
    tracker.last_kf_slots = [tuple(x) for x in meta["last_kf_slots"]]
    tracker.n_maintenance = meta["n_maintenance"]
    tracker._loop_checked = meta["loop_checked"]
    tracker._localization_only = meta["localization_only"]
    tracker._loop_rng = jnp.asarray(
        np.asarray(meta["loop_rng"], np.uint32))
    if tracker.loop_closer is not None and "lc_signatures" in data:
        lc = tracker.loop_closer
        lc.signatures = data["lc_signatures"].copy()
        lc.consistent_streak = {
            tuple(g): n for g, n in meta["lc_streaks"]
        }
        lc.last_loop_order = meta["lc_last_loop_order"]
        lc.closed_loops = meta["lc_closed_loops"]
    kf_images = {}
    if "kf_image_slots" in data:
        for j, s in enumerate(data["kf_image_slots"]):
            kf_images[int(s)] = data["kf_images"][j]
    return meta, kf_images
