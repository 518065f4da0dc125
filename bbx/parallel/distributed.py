"""Multi-host process groups and host-local sharding helpers.

The reference is strictly single-process (SURVEY.md §2.8).  The TPU-native
equivalent: `jax.distributed.initialize()` forms the process group; each host
owns a contiguous shard of the env batch (no env data ever crosses hosts);
gradients ride ICI within a slice and DCN across slices via the mesh in
`bbx.parallel.mesh`.
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize `jax.distributed` when running multi-host.

    No-ops (returns False) in single-process settings: on TPU pods the
    arguments come from the environment automatically; elsewhere they can be
    passed explicitly or via JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID.
    """
    already = getattr(jax.distributed, "is_initialized", None)
    if callable(already) and jax.distributed.is_initialized():
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    num_processes = num_processes if num_processes is not None else (
        int(env_np) if env_np else None
    )
    env_pid = os.environ.get("JAX_PROCESS_ID")
    process_id = process_id if process_id is not None else (
        int(env_pid) if env_pid else None
    )
    if coordinator_address is None and num_processes is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def is_primary() -> bool:
    """True on the process that owns logging/checkpoint writes."""
    return jax.process_index() == 0


def global_env_count(per_host_envs: int) -> int:
    return per_host_envs * jax.process_count()


def host_env_slice(num_envs_global: int) -> tuple[int, int]:
    """(start, count) of this host's contiguous env shard."""
    per = num_envs_global // jax.process_count()
    return jax.process_index() * per, per
