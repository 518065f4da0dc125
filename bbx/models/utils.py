"""Model utilities (reference: `/root/reference/src/models/utils.py`).

Checkpoint I/O lives in `bbx.utils.checkpoints` (Orbax); this module carries
the remaining reference surface: summaries, early stopping, and gradient
clipping as an optax transform.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import optax

from .network import count_parameters


def get_model_summary(params, name: str = "model") -> str:
    """Human-readable parameter summary (`utils.py:103-124`)."""
    lines = [f"{name} summary", "-" * 40]
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        lines.append(f"{key:<48} {str(leaf.shape):<18} {leaf.size:,}")
    lines.append("-" * 40)
    lines.append(f"total parameters: {count_parameters(params):,}")
    return "\n".join(lines)


class EarlyStopping:
    """Patience-based early stopping (`utils.py:127-185`)."""

    def __init__(self, patience: int = 10, min_delta: float = 0.0,
                 mode: str = "max"):
        assert mode in ("min", "max")
        self.patience = patience
        self.min_delta = min_delta
        self.mode = mode
        self.best: Optional[float] = None
        self.counter = 0
        self.should_stop = False

    def __call__(self, value: float) -> bool:
        if self.best is None:
            self.best = value
            return False
        improved = (
            value > self.best + self.min_delta
            if self.mode == "max"
            else value < self.best - self.min_delta
        )
        if improved:
            self.best = value
            self.counter = 0
        else:
            self.counter += 1
            if self.counter >= self.patience:
                self.should_stop = True
        return self.should_stop

    def reset(self) -> None:
        self.best, self.counter, self.should_stop = None, 0, False


def gradient_clipper(max_norm: float = 0.5) -> optax.GradientTransformation:
    """Global-norm gradient clipping as a reusable transform
    (`utils.py:189-216`; the agent composes this into its optimizer chain)."""
    return optax.clip_by_global_norm(max_norm)


def global_grad_norm(grads) -> jax.Array:
    return optax.global_norm(grads)
