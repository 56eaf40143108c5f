"""Multi-host runtime initialization + pod-scale mesh construction.

Single-host multi-chip sharding lives in distributed.py (mesh + shard_map +
halo exchange + key-range ownership).  This module adds the multi-host
layer: `jax.distributed` bring-up and meshes whose collectives ride ICI
within a slice and DCN across slices.

This environment exposes one chip, so pod-scale paths are validated
structurally (mesh construction + sharding compile via
``xla_force_host_platform_device_count``) rather than by wall-clock scaling;
see BASELINE.md for the measurement plan on real slices.
"""

from __future__ import annotations

import logging
import os

import numpy as np

import jax
from jax.sharding import Mesh

logger = logging.getLogger("krisp_tpu")

#: environment markers that mean a distributed bring-up was EXPLICITLY
#: configured — a failure with any of these present is a real pod fault
#: (bad coordinator, version skew), not "single-process environment".
#: TPU autodetect variables (TPU_WORKER_HOSTNAMES etc.) are deliberately
#: NOT markers: single-chip tunnel hosts carry them too.
_DIST_ENV_VARS = (
    "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
    "JAX_NUM_PROCESSES", "JAX_PROCESS_ID",
    "MEGASCALE_COORDINATOR_ADDRESS",
)


def init_runtime(coordinator_address=None, num_processes=None,
                 process_id=None):
    """Initialize the multi-host JAX runtime (no-op on a single process).

    On TPU pods the arguments are discovered from the environment; on CPU
    fleets pass them explicitly (coordinator host:port, world size, rank).

    Failure semantics: on the implicit path, "nothing configured" is the
    expected single-process case and returns False; but when the
    environment says a cluster WAS configured (coordinator/world-size
    variables present), a bring-up failure re-raises — silently degrading
    a pod job to single-process would run N disconnected copies.
    """
    if num_processes is None and coordinator_address is None:
        configured = [v for v in _DIST_ENV_VARS if os.environ.get(v)]
        try:
            jax.distributed.initialize()
        except Exception as exc:
            if configured:
                logger.error(
                    "multi-host bring-up failed with distributed "
                    "environment configured (%s): %s",
                    ", ".join(configured), exc)
                raise
            logger.debug("no distributed environment: %s", exc)
            return False  # single-process environment
        return True
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def pod_mesh(ici_axis: str = "chip", dcn_axis: str = "host") -> Mesh:
    """2-D (host, chip) mesh: shard genomes across hosts (DCN-friendly data
    parallelism — whole per-genome tables move at most once) and sequence
    ranges across a host's chips (halo exchange + key-range collectives stay
    on ICI)."""
    devices = np.array(jax.devices())
    n_hosts = max(jax.process_count(), 1)
    per_host = devices.size // n_hosts
    grid = devices.reshape(n_hosts, per_host)
    return Mesh(grid, (dcn_axis, ici_axis))
