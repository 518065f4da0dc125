"""Masked categorical distribution utilities (pure functions).

Re-implements the reference's action masking and masked entropy
(`/root/reference/src/models/network.py:173-262`) as jit-friendly functions
shared by every model.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Large-negative instead of -inf: exp() flushes to exactly 0 in softmax but
# avoids NaN propagation through log_softmax/grad on fully-masked rows.
MASKED_LOGIT = -1e9


def mask_logits(logits: jnp.ndarray, action_mask: jnp.ndarray) -> jnp.ndarray:
    """Invalid actions get a -1e9 logit (reference adds -inf,
    `network.py:173-180`)."""
    return jnp.where(action_mask > 0, logits, MASKED_LOGIT)


def sample(key: jax.Array, masked: jnp.ndarray) -> jnp.ndarray:
    """Sample from the masked categorical ([B, A] logits -> [B] int32)."""
    return jax.random.categorical(key, masked, axis=-1).astype(jnp.int32)


def mode(masked: jnp.ndarray) -> jnp.ndarray:
    """Deterministic action: argmax of masked logits ([B] int32)."""
    return jnp.argmax(masked, axis=-1).astype(jnp.int32)


def log_prob(masked: jnp.ndarray, action: jnp.ndarray) -> jnp.ndarray:
    """Log-probability of `action` under the masked categorical."""
    logp = jax.nn.log_softmax(masked, axis=-1)
    return jnp.take_along_axis(logp, action[:, None].astype(jnp.int32), axis=-1)[:, 0]


def masked_entropy(masked: jnp.ndarray, action_mask: jnp.ndarray) -> jnp.ndarray:
    """Entropy over *valid* actions only (`network.py:232-262`).

    Probabilities are renormalized over the valid set (numerically they
    already sum to ~1 because invalid logits are -1e9) and the entropy sum
    runs only over valid entries — matching the reference's clamped formula.
    """
    probs = jax.nn.softmax(masked, axis=-1)
    maskf = (action_mask > 0).astype(probs.dtype)
    masked_probs = probs * maskf
    denom = jnp.clip(jnp.sum(masked_probs, axis=-1, keepdims=True), min=1e-10)
    p = masked_probs / denom
    logp = jnp.log(jnp.clip(p, min=1e-10))
    return -jnp.sum(p * logp * maskf, axis=-1)
