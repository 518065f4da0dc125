"""Orbax checkpointing with the reference's naming scheme.

Reference: torch state-dict files `best.pt` / `latest.pt` / `final.pt` /
`checkpoint_<step>.pt` (`scripts/train.py:228-294`, `src/agents/ppo.py:
425-439`).  Here a checkpoint is the full training pytree — params, batch
stats, optimizer state, update counter, env state, and RNG — so resume is
exact (the reference restores only weights+optimizer and parses the step
from the filename, `scripts/train.py:128-135`).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_numpy_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(directory: str, name: str, payload: Dict[str, Any]) -> str:
    """Save `payload` (a pytree dict) under `directory/name`."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(directory, name))
    os.makedirs(directory, exist_ok=True)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, _to_numpy_tree(payload), force=True)
    return path


def load_checkpoint(path: str, template: Optional[Dict[str, Any]] = None):
    """Load a checkpoint; with `template`, restores into matching dtypes and
    shardings."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        if template is not None:
            restore_args = jax.tree.map(
                lambda x: ocp.ArrayRestoreArgs(
                    sharding=getattr(x, "sharding", None)
                ),
                template,
            )
            return ckptr.restore(path, restore_args=restore_args)
        return ckptr.restore(path)


def checkpoint_exists(path: str) -> bool:
    return os.path.isdir(path)


def latest_step_checkpoint(directory: str) -> Optional[str]:
    """Find the highest-step `checkpoint_<step>` directory."""
    if not os.path.isdir(directory):
        return None
    best, best_step = None, -1
    for entry in os.listdir(directory):
        if entry.startswith("checkpoint_"):
            try:
                step = int(entry.split("_")[-1])
            except ValueError:
                continue
            if step > best_step:
                best, best_step = entry, step
    return os.path.join(directory, best) if best else None
