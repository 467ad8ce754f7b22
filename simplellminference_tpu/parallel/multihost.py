"""Multi-host runtime bootstrap (pod slices over ICI + DCN).

The reference has no distributed backend at all (SURVEY.md §2.9 — its only
cross-device transport is a blocking cudaMemcpy). The TPU-native stack:
``jax.distributed.initialize`` wires the hosts into one JAX runtime, every
host sees the global device set, and a hybrid mesh lays tensor-parallel
axes over ICI (intra-slice) and data-parallel axes over DCN (inter-slice)
so per-layer all-reduces never leave the slice.

On Cloud TPU pods the coordinator/process env vars are auto-detected;
explicit args cover manual launches (e.g. GKE jobs).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh

from simplellminference_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join the multi-host JAX runtime (idempotent).

    No-ops when the process is already initialized or is the only process
    (single-host dev loop, tests, CI).
    """
    global _initialized
    if _initialized:
        return
    if coordinator_address is None and num_processes is None:
        # Auto-detected environments (TPU pods, GKE with JobSet env).
        try:
            jax.distributed.initialize()
        except (ValueError, RuntimeError):
            # Single-process fallback: nothing to join.
            _initialized = True
            return
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    _initialized = True


def pod_mesh(tp: Optional[int] = None, dp: Optional[int] = None) -> Mesh:
    """Build a (data, model) mesh across all processes' devices.

    The model axis is laid over ICI (contiguous device dims within a
    slice), the data axis over the remaining ICI dims and DCN — per-layer
    TP all-reduces stay on ICI, only DP batch exchange (none at inference)
    would ride DCN. Defaults: tp = devices per host (ICI-local), dp = rest.
    """
    n = jax.device_count()
    local = jax.local_device_count()
    tp = tp or min(local, n)
    if n % tp != 0:
        raise ValueError(f"tp={tp} must divide device count {n}")
    dp = dp or n // tp
    if tp * dp != n:
        raise ValueError(f"tp*dp = {tp}*{dp} != {n} devices")

    num_slices = max(jax.process_count() // max(local and 1, 1), 1)
    try:
        if num_slices > 1 and dp % num_slices == 0:
            devices = mesh_utils.create_hybrid_device_mesh(
                (dp // num_slices, tp), (num_slices, 1),
                devices=jax.devices())
        else:
            devices = mesh_utils.create_device_mesh((dp, tp),
                                                    devices=jax.devices())
    except (ValueError, NotImplementedError, AssertionError):
        devices = np.asarray(jax.devices()).reshape(dp, tp)
    return Mesh(devices, (DATA_AXIS, MODEL_AXIS))


@dataclasses.dataclass(frozen=True)
class HostInfo:
    process_id: int
    process_count: int
    local_devices: int
    global_devices: int

    @property
    def is_coordinator(self) -> bool:
        return self.process_id == 0


def host_info() -> HostInfo:
    return HostInfo(process_id=jax.process_index(),
                    process_count=jax.process_count(),
                    local_devices=jax.local_device_count(),
                    global_devices=jax.device_count())
