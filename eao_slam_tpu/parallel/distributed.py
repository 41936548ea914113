"""Multi-host bring-up: `jax.distributed` initialization + the global
('host', 'device') mesh.

The reference is a single process with std::thread pipelines
(src/System.cc:109-131) and has no cross-machine layer at all (SURVEY.md
§2.3) — this module is the TPU-native story: one JAX process per host,
`jax.distributed.initialize` over the coordinator, and a 2-axis mesh where
the 'host' axis is the process grid (collectives ride DCN) and the
'device' axis is the local chips (collectives ride ICI). Keyframe/object
blocks shard on 'host'; points/residuals/pixels shard on 'device'
(parallel/dist_ba2.py, parallel/multi_seq.py).

Single-process fallback: when no coordinator is configured, the same mesh
shape is produced by *folding* the local devices into a virtual host axis —
identical program, identical collectives, no pod required. That is what the
tests and the driver's dryrun use (SURVEY.md §4 multi-host test strategy).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

HOST_AXIS = "host"
DEV_AXIS = "device"

_initialized = False


def initialize_from_env() -> bool:
    """Bring up `jax.distributed` when a coordinator is configured.

    Reads the conventional variables (compatible with both manual launches
    and TPU pod metadata): EAO_COORDINATOR (host:port), EAO_NUM_PROCESSES,
    EAO_PROCESS_ID. Returns True if a multi-process runtime was started.
    Safe to call more than once.
    """
    global _initialized
    if _initialized:
        return True
    coord = os.environ.get("EAO_COORDINATOR")
    if not coord:
        return False
    n_proc = int(os.environ.get("EAO_NUM_PROCESSES", "1"))
    pid = int(os.environ.get("EAO_PROCESS_ID", "0"))
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=n_proc, process_id=pid
    )
    _initialized = True
    return True


def global_mesh(n_virtual_hosts: Optional[int] = None) -> Mesh:
    """The framework's global 2-axis mesh.

    Multi-process (after `initialize_from_env`): host axis = process grid,
    device axis = chips per process, using all addressable+global devices.
    Single-process: fold local devices into `n_virtual_hosts` (default:
    2 when >=4 devices are present, else 1).
    """
    devs = jax.devices()
    if jax.process_count() > 1:
        # group devices explicitly by owning process: a raw reshape assumes
        # jax.devices() is process-contiguous, which PJRT does not guarantee —
        # if it isn't, the 'host' axis stops aligning with the process grid
        # and host-axis collectives ride DCN rows that straddle processes
        n_hosts = jax.process_count()
        by_proc = {}
        for d in devs:
            by_proc.setdefault(d.process_index, []).append(d)
        rows = [by_proc[p] for p in sorted(by_proc)]
        per_host = min(len(r) for r in rows)
        grid = np.asarray([r[:per_host] for r in rows])
        assert grid.shape == (n_hosts, per_host)
        return Mesh(grid, (HOST_AXIS, DEV_AXIS))
    if n_virtual_hosts is None:
        n_virtual_hosts = 2 if len(devs) >= 4 else 1
    per = len(devs) // n_virtual_hosts
    grid = np.asarray(devs[: n_virtual_hosts * per]).reshape(n_virtual_hosts, per)
    return Mesh(grid, (HOST_AXIS, DEV_AXIS))
