"""BA scaling-efficiency harness (BASELINE.md: >=70% 1->N on BA iters/s).

Measures the observation-sharded distributed LM BA (parallel/dist_ba2.py).

Methodology
-----------
Multi-chip hardware is not available in this environment, and the forced-CPU
"8-device" mesh multiplexes onto the physical cores of ONE machine (this box
has 2), so end-to-end wall clock cannot show parallel speedup beyond the
core count — any wall-only number would be meaningless in both directions.
The harness therefore measures the two quantities that actually determine
pod-scale efficiency, both on real executions:

1. per-shard compute time t_shard(N): the full sharded LM program (same
   shard_map body, same collective ops) executed for ONE shard of the N-way
   partitioned problem on a single-device mesh — i.e. exactly the work one
   chip of an N-chip pod would do, including the replicated (non-scaling)
   reduced-camera solve;
2. collective overhead: psum/all_gather latency measured on the multi-device
   CPU mesh, multiplied by the program's collective count per solve
   (payloads are O(K*6) and O(K*36) — KBs — so latency dominates).

   efficiency(N) = t_shard(1) / (N * (t_shard(N) + t_coll(N)))

This is standard strong-scaling accounting; it is what wall clock converges
to when shards run on distinct chips. Correctness of the N-way program
(identical results vs the single-chip solver on the real 8-device mesh) is
covered by tests/test_dist_ba2.py.

Writes SCALING_r02.json and prints it.

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scaling_bench.py
"""

import json
import os
import time

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

jax.config.update("jax_platforms", "cpu")

from eao_slam_tpu.geometry.camera import TUM3
from eao_slam_tpu.parallel import dist_ba2
from eao_slam_tpu.parallel.dist_ba2 import (
    distributed_bundle_adjust_v2,
    make_hd_mesh,
    shard_problem,
)
from eao_slam_tpu.solvers.ba import BAProblem

ITERS = 6
N_CG = 24
K, PTS, OBS_PER_PT = 48, 16384, 12
# collectives per solve: per LM iter 5 psums (Hcc, bc, cost, new_cost,
# finite) + 1 all_gather (Minv) + (N_CG + 1) matvec psums; +1 final cost
N_COLLECTIVES = ITERS * (6 + N_CG + 1) + 1


def make_problem(rng):
    X = np.stack(
        [rng.uniform(-3, 3, PTS), rng.uniform(-2, 2, PTS), rng.uniform(4, 12, PTS)],
        -1,
    ).astype(np.float32)
    poses = np.tile(
        np.concatenate([np.eye(3), np.zeros((3, 1))], 1), (K, 1, 1)
    ).astype(np.float32)
    poses[:, 0, 3] = 0.05 * np.arange(K)
    kf_idx = rng.integers(0, K, PTS * OBS_PER_PT).astype(np.int32)
    pt_idx = np.repeat(np.arange(PTS), OBS_PER_PT).astype(np.int32)
    pc = (
        np.einsum("oij,oj->oi", poses[kf_idx, :, :3], X[pt_idx])
        + poses[kf_idx, :, 3]
    )
    uv = np.stack(
        [
            TUM3.fx * pc[:, 0] / pc[:, 2] + TUM3.cx,
            TUM3.fy * pc[:, 1] / pc[:, 2] + TUM3.cy,
        ],
        -1,
    ).astype(np.float32) + rng.normal(0, 0.5, (len(kf_idx), 2)).astype(np.float32)
    O = len(kf_idx)
    return BAProblem(
        poses=poses,
        points=(X + rng.normal(0, 0.05, X.shape)).astype(np.float32),
        kf_idx=kf_idx,
        pt_idx=pt_idx,
        uv=uv,
        inv_sigma2=np.ones(O, np.float32),
        obs_valid=np.ones(O, bool),
        cam_fixed=np.asarray([True] + [False] * (K - 1)),
        cam_valid=np.ones(K, bool),
        pt_valid=np.ones(PTS, bool),
    )


def measure_collective_latency():
    """Round-trip latency of a small psum on the full 8-device mesh."""
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("d",))

    def f(x):
        for _ in range(100):
            x = jax.lax.psum(x, "d") * 0.125
        return x

    g = jax.jit(
        jax.shard_map(f, mesh=mesh, in_specs=P(), out_specs=P(), check_vma=False)
    )
    x = jnp.ones((K, 6))
    jax.block_until_ready(g(x))
    t0 = time.perf_counter()
    for _ in range(5):
        r = g(x)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / 500


def time_one_shard(prob, n_shards, reps=3):
    """Wall time of ONE shard's full LM program: the N-way-partitioned
    problem's shard 0 executed on a single-device (1,1) mesh — the exact
    per-chip work of an N-chip run (collectives degenerate to copies)."""
    sh, rep, _, _ = shard_problem(prob, n_shards, k_pad=1)
    sh0 = jax.tree.map(lambda a: a[:1], sh)
    mesh = make_hd_mesh(1, jax.devices()[:1])
    res = dist_ba2._run_sharded(TUM3, rep, sh0, mesh, ITERS, N_CG)
    jax.block_until_ready(res)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        res = dist_ba2._run_sharded(TUM3, rep, sh0, mesh, ITERS, N_CG)
        jax.block_until_ready(res)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(0)
    prob = make_problem(rng)

    # correctness + the real multi-device execution (collectives included)
    mesh8 = make_hd_mesh(2, jax.devices()[:8])
    res8 = distributed_bundle_adjust_v2(TUM3, prob, mesh8, iters=ITERS, n_cg=N_CG)
    jax.block_until_ready(res8.poses)
    t0 = time.perf_counter()
    res8 = distributed_bundle_adjust_v2(TUM3, prob, mesh8, iters=ITERS, n_cg=N_CG)
    jax.block_until_ready(res8.poses)
    wall8 = time.perf_counter() - t0

    coll_lat = measure_collective_latency()
    t_coll = N_COLLECTIVES * coll_lat

    rows = []
    t1 = None
    for n in (1, 2, 4, 8):
        ts = time_one_shard(prob, n)
        if t1 is None:
            t1 = ts
        per_chip = ts + (t_coll if n > 1 else 0.0)
        eff = t1 / (n * per_chip)
        rows.append(
            {
                "devices": n,
                "t_shard_s": round(ts, 4),
                "t_collectives_s": round(t_coll if n > 1 else 0.0, 5),
                "ba_iters_per_s_per_pod": round(ITERS / per_chip, 3),
                "efficiency_vs_1": round(eff, 3),
            }
        )
        print(f"  {n} dev: shard {ts*1e3:.1f} ms  eff={eff:.2f}")

    out = {
        "metric": "ba_iters_per_s_strong_scaling",
        "method": "per-shard compute time of the real sharded program on a "
        "1-device mesh + measured collective latency x count (this host has "
        f"{os.cpu_count()} cores; see module docstring)",
        "problem": {"K": K, "P": PTS, "O": PTS * OBS_PER_PT,
                    "lm_iters": ITERS, "cg_iters": N_CG},
        "collective_latency_us": round(coll_lat * 1e6, 2),
        "collectives_per_solve": N_COLLECTIVES,
        "mesh8_wall_s_2x4": round(wall8, 3),
        "mesh8_final_cost": round(float(res8.cost), 1),
        "rows": rows,
        "efficiency_1_to_8": rows[-1]["efficiency_vs_1"],
    }
    with open(os.path.join(os.path.dirname(__file__), "SCALING_r02.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
