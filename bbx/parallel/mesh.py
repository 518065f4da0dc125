"""Device mesh and sharding layout.

The reference has no distributed substrate at all (SURVEY.md §2.8): its
"vectorization" is a Python loop in one process.  Here scaling is native:

  * a `jax.sharding.Mesh` with a `data` axis (and a reserved `model` axis,
    kept size 1 — the ~5M-param CNN is replicated; the axis exists so the
    8192x512 FC could be tensor-sharded if the model family were scaled up);
  * environment state and rollout buffers sharded over `data`;
  * parameters/optimizer state replicated; XLA's GSPMD partitioner inserts
    the gradient all-reduce over ICI automatically when the jitted update
    consumes data-sharded batches with replicated params.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    num_data: Optional[int] = None,
    num_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    Args:
      num_data: size of the data axis (default: all devices / num_model).
      num_model: size of the model axis (default 1: fully replicated model).
    """
    devices = list(devices if devices is not None else jax.devices())
    if num_data is None:
        num_data = len(devices) // num_model
    use = num_data * num_model
    grid = np.asarray(devices[:use]).reshape(num_data, num_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (env/batch) dimension over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batched_tree(tree, mesh: Mesh):
    """Place every leaf of a batch-first pytree with its leading dim sharded
    over `data` (env state, rollout buffers, action batches...)."""
    sh = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def replicate_tree(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def batch_spec_tree(tree):
    """PartitionSpec pytree: leading axis on `data` for every leaf."""
    return jax.tree.map(lambda _: P(DATA_AXIS), tree)


def replicated_spec_tree(tree):
    return jax.tree.map(lambda _: P(), tree)
