"""Multi-sequence batch processing over the device mesh.

BASELINE.md's distributed target processes many sequences at once with
keyframe/object blocks sharded across hosts. The reference has no analogue
(single process, one sequence). Here the natural TPU shape is: stack S
per-sequence BA problems along a leading axis, shard that axis over the
mesh, and run the whole LM solve as ONE jitted program — each device
optimizes its shard of sequences in lockstep, no cross-device traffic
except the implicit batch dispatch (sequences are independent; the
intra-sequence sharded solver lives in parallel/dist_ba.py).

Two granularities:
  * `MultiSeqEngine` — FULL SLAM: S independent `ChunkedTracker`
    sequences advanced by one vmapped fused extract+track chunk program
    (the production program of runtime/scan_tracker.py), the ChunkCarry
    pytree stacked along a sequence axis that shards across the mesh.
    Between-chunk host passes (merge/maintenance/loop/reloc) run
    per-sequence, exactly as each solo tracker would.
  * `batch_bundle_adjust` — just the BA solves, for offline refinement
    batches (the original shape).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from eao_slam_tpu.geometry.camera import Camera
from eao_slam_tpu.solvers.ba import BAProblem, BAResult, bundle_adjust


def stack_problems(problems: Sequence[BAProblem]) -> BAProblem:
    """Stack same-shape BAProblems along a leading sequence axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *problems)


def pad_problems(problems: Sequence[BAProblem], n: int) -> Sequence[BAProblem]:
    """Pad the list to length n with inert copies of the first problem
    (cam_valid all False so they solve to identity work)."""
    out = list(problems)
    if out and len(out) < n:
        dummy = out[0]._replace(
            obs_valid=jnp.zeros_like(out[0].obs_valid),
            cam_fixed=jnp.ones_like(out[0].cam_fixed),
        )
        out = out + [dummy] * (n - len(out))
    return out


@partial(jax.jit, static_argnames=("cam", "iters", "mesh"))
def _batched_ba(cam: Camera, stacked: BAProblem, mesh: Mesh, iters: int):
    spec = jax.tree.map(lambda _: P("dev"), stacked)
    stacked = jax.lax.with_sharding_constraint(
        stacked, jax.tree.map(lambda s: NamedSharding(mesh, s), spec)
    )
    return jax.vmap(lambda p: bundle_adjust(cam, p, iters=iters))(stacked)


def batch_bundle_adjust(
    cam: Camera,
    problems: Sequence[BAProblem],
    mesh: Mesh,
    iters: int = 10,
) -> list:
    """Solve S independent BA problems sharded over the mesh. Problems must
    share shapes (pad keyframe/point/obs capacities to a common bucket).
    Returns a list of BAResult."""
    S = len(problems)
    n_dev = mesh.devices.size
    S_pad = -(-S // n_dev) * n_dev
    stacked = stack_problems(pad_problems(problems, S_pad))
    res = _batched_ba(cam, stacked, mesh, iters)
    out = []
    for i in range(S):
        out.append(jax.tree.map(lambda x: x[i], res))
    return out


# ---------------------------------------------------------------------------
# full-SLAM multi-sequence batch (BASELINE.json configs[4])
# ---------------------------------------------------------------------------

SEQ_AXIS = "seq"


def make_seq_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (SEQ_AXIS,))


class MultiSeqEngine:
    """Track S independent monocular sequences with ONE device program.

    Each sequence is a normal `ChunkedTracker` (bootstrap per sequence on
    the host path); once all are armed, `track_images` stacks the S
    ChunkCarry pytrees along a leading sequence axis, constrains that axis
    onto the mesh, and advances every sequence one chunk inside a single
    jitted vmap of the production fused extract+track program. The
    between-chunk host passes then run per sequence, so trajectories,
    object tables, loop closing and relocalization behave exactly as S
    solo trackers — the batch changes scheduling, not math.

    This is the flagship multi-chip configuration of BASELINE.json
    (configs[4]: several sequences at once, distributed across the mesh);
    the reference processes one sequence per process
    (Examples/Monocular/mono_tum.cc:52-133)."""

    def __init__(self, cfg, n_seq: int, chunk: int = 32, mesh=None):
        from eao_slam_tpu.runtime.scan_tracker import (
            ChunkedTracker,
            make_extract_track,
        )

        self.cfg = cfg
        self.chunk = chunk
        self.n_seq = n_seq
        self.mesh = mesh if (mesh is not None
                             and int(mesh.devices.size) > 1) else None
        self.trackers = [ChunkedTracker(cfg, chunk=chunk)
                         for _ in range(n_seq)]
        inner = make_extract_track(cfg, self.trackers[0]._track_chunk)
        self._objects_on = cfg.flag.objects_enabled

        if self.mesh is not None:
            # shard_map, not vmap+sharding-constraint: each device runs the
            # WHOLE chunk program for its own block of sequences, with zero
            # cross-device communication (sequences are independent). A
            # plain constrained vmap leaves the partitioner free to
            # replicate the sequential scan on every device, which it does
            # — measured 60x slower than solo on the CPU mesh.
            from jax.sharding import PartitionSpec

            spec = PartitionSpec(self.mesh.axis_names[0])
            n_dev = int(self.mesh.devices.size)
            assert n_seq % n_dev == 0, (
                f"{n_seq} sequences not divisible over {n_dev} devices")

            body = jax.shard_map(
                lambda carries, *args: jax.vmap(inner)(carries, *args),
                mesh=self.mesh, in_specs=spec, out_specs=spec,
                check_vma=False,
            )
        else:
            def body(carries, *args):
                return jax.vmap(inner)(carries, *args)

        self._vstep = jax.jit(body)
        # steady-state residency: the stacked carry stays on device across
        # chunks (sync=False defers the per-sequence host passes; drain()
        # folds them back) — re-stacking S whole maps every chunk costs
        # more host traffic than the chunk program itself
        self._carries = None
        self._deferred = []      # [(outs, timestamps)] awaiting drain()
        self._kf_base = None     # per-seq kf_count at seal time

    # -- per-sequence bootstrap (host path, like any solo tracker) --------

    def bootstrap(self, s: int, image, timestamp: float, boxes=None) -> bool:
        from eao_slam_tpu.runtime.frame import frame_from_image

        kw = {}
        if boxes is not None:
            b, c, sc, v = boxes
            kw = dict(boxes=b, box_class=c, box_score=sc, box_valid=v)
        fr = frame_from_image(self.cfg, np.asarray(image, np.float32), **kw)
        return self.trackers[s].bootstrap(fr, timestamp)

    @property
    def armed(self) -> bool:
        return all(t.carry is not None for t in self.trackers)

    # -- batched steady state --------------------------------------------

    def _stack_carries(self):
        return jax.tree.map(lambda *xs: jnp.stack(xs),
                            *[t.carry for t in self.trackers])

    def track_images(self, images_u8, timestamps, boxes=None, box_class=None,
                     box_score=None, box_valid=None, sync=True):
        """Advance every sequence one FULL chunk: images_u8 [S, C, H, W],
        timestamps [S, C] (+ box arrays [S, C, B, ...] in object modes).
        One dispatch; the between-chunk host passes run per-sequence after
        it (skipped when sync=False — the bench's timed span defers them
        exactly like the solo bench does)."""
        assert self.armed, "bootstrap every sequence first"
        S, C = np.asarray(timestamps).shape
        assert S == self.n_seq and C == self.chunk, (
            f"batch [{S},{C}] vs n_seq={self.n_seq}, chunk={self.chunk}")
        if self._carries is None:
            self._kf_base = [t.kf_count_host for t in self.trackers]
            self._carries = self._stack_carries()
        carries = self._carries
        args = (jnp.asarray(images_u8),
                jnp.asarray(np.asarray(timestamps, np.float32)))
        if self._objects_on:
            B = self.cfg.capacity.max_boxes
            if boxes is None:
                boxes = np.zeros((S, C, B, 4), np.float32)
                box_class = np.full((S, C, B), -1, np.int32)
                box_score = np.zeros((S, C, B), np.float32)
                box_valid = np.zeros((S, C, B), bool)
            args += (jnp.asarray(boxes), jnp.asarray(box_class),
                     jnp.asarray(box_score), jnp.asarray(box_valid))
        self._carries, outs = self._vstep(carries, *args)
        self._deferred.append((outs, np.asarray(timestamps)))
        if sync:
            self.drain()
        return outs

    def drain(self):
        """Fold the device state back into the per-sequence trackers: replay
        the per-chunk record/slot bookkeeping for every deferred chunk
        (slot ids are the monotonic device allocator, so replay must happen
        BEFORE any compaction renumbers slots), then run the between-chunk
        passes (merge, maintenance, loop closing, relocalization) once per
        sequence over the accumulated state — the same deferral the solo
        bench documents for its timed span."""
        if self._carries is None:
            return
        self._scatter(self._carries)
        self._carries = None
        deferred, self._deferred = self._deferred, []
        kf_at = list(self._kf_base)
        for outs, tstamps in deferred:
            host = jax.device_get(outs)
            for s, t in enumerate(self.trackers):
                out_s = jax.tree.map(lambda x: x[s], host)
                t._record_chunk(out_s, tstamps[s], kf_at[s])
                kf_at[s] += int(np.asarray(out_s.is_kf).sum())
        for t in self.trackers:
            t._between_chunk_passes()
        # host passes (maintenance/loop) may have rewritten carries; any
        # subsequent track_images re-seals from the trackers
        self._kf_base = None

    def _scatter(self, carries):
        for s, t in enumerate(self.trackers):
            t.carry = jax.tree.map(lambda x: x[s], carries)

    # -- per-sequence views ----------------------------------------------

    def frame_trajectory(self, s: int):
        return self.trackers[s].frame_trajectory()

    def keyframe_trajectory(self, s: int):
        return self.trackers[s].keyframe_trajectory()
