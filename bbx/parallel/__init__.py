"""Distributed substrate: mesh layout, shardings, multi-host init."""
from .distributed import (
    global_env_count,
    host_env_slice,
    initialize_multihost,
    is_primary,
)
from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_spec_tree,
    data_sharding,
    make_mesh,
    replicate_tree,
    replicated,
    replicated_spec_tree,
    shard_batched_tree,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_spec_tree",
    "data_sharding",
    "global_env_count",
    "host_env_slice",
    "initialize_multihost",
    "is_primary",
    "make_mesh",
    "replicate_tree",
    "replicated",
    "replicated_spec_tree",
    "shard_batched_tree",
]
