"""Multi-host initialization and mesh construction.

The reference is strictly single-process (SURVEY.md §2 "no distributed
communication backend"); this module is the new framework's entry point for
pod-scale runs: ``jax.distributed`` bring-up, a (kf, tile) mesh over the
global device set laid out so the ``tile`` axis (the per-iteration psum of
the tracking normal system — latency-critical) stays within a host's ICI
domain while ``kf`` (the once-per-BA-window reduction) may cross hosts/DCN.

On a single host (or under XLA_FLAGS=--xla_force_host_platform_device_count)
``initialize`` is a no-op and the same code paths run on the local/virtual
devices, which is how the CPU-mesh tests and the driver's dryrun exercise
multi-chip semantics without a pod.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up jax.distributed when running multi-process.

    No-ops when single-process (the common local/dev case).  Arguments
    default to the standard env vars (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID) or the TPU pod's built-in
    auto-detection when all are absent on Cloud TPU."""
    n = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if n <= 1 and coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def pod_mesh(
    kf: Optional[int] = None,
    tile: Optional[int] = None,
    devices=None,
) -> Mesh:
    """(kf, tile) mesh over all global devices.

    Layout policy: ``tile`` is the fast axis — contiguous device ids (same
    host / same ICI ring) so the per-GN-iteration 6x6 psum rides ICI;
    ``kf`` strides across hosts, carrying only the per-BA-window reduced
    camera system (a few KB) over DCN.  Defaults: tile = devices per host
    (or all devices single-host), kf = the rest."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if tile is None:
        if kf is not None:
            tile = n // max(kf, 1)
        else:
            local = jax.local_device_count() if jax.process_count() > 1 else n
            tile = min(local, n)
    if kf is None:
        kf = n // tile
    assert kf * tile == n, (kf, tile, n)
    arr = np.array(devices).reshape(kf, tile)
    return Mesh(arr, ("kf", "tile"))
