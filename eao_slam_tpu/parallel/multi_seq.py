"""Multi-sequence batch processing over the device mesh.

BASELINE.md's distributed target processes many sequences at once with
keyframe/object blocks sharded across hosts. The reference has no analogue
(single process, one sequence). Here the natural TPU shape is: stack S
per-sequence BA problems along a leading axis, shard that axis over the
mesh, and run the whole LM solve as ONE jitted program — each device
optimizes its shard of sequences in lockstep, no cross-device traffic
except the implicit batch dispatch (sequences are independent; the
intra-sequence sharded solver lives in parallel/dist_ba.py).
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
