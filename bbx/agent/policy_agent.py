"""Object-style agent facade over the functional PPO core.

Gives host-side scripts (play, evaluate, GUI) the reference's `PPOAgent`
surface — `select_action` / `select_actions` / `get_values` / `save` / `load`
(`/root/reference/src/agents/ppo.py:221-449`) — while training itself goes
through the jitted `bbx.agent.trainer.PPOTrainer` path.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

from ..models import distributions as D
from ..models.network import BlockBlastNetwork
from .base import BaseAgent


class PolicyAgent(BaseAgent):
    """Inference-side agent: wraps (network, variables) with jitted acting."""

    def __init__(self, network: Optional[BlockBlastNetwork] = None,
                 variables: Optional[dict] = None, seed: int = 0):
        super().__init__()
        self.network = network or BlockBlastNetwork()
        if variables is None:
            variables = self.network.init(
                {"params": jr.key(seed), "dropout": jr.key(seed)},
                jnp.zeros((1, 8, 8)), jnp.zeros((1, 3, 8, 8)), train=False,
            )
        self.variables = variables
        self._key = jr.key(seed + 1)

        @jax.jit
        def _act(variables, board, pieces, mask, key, deterministic):
            logits, value = self.network.apply(
                variables, board, pieces, mask, train=False
            )
            action = jnp.where(
                deterministic, D.mode(logits), D.sample(key, logits)
            )
            logp = D.log_prob(logits, action)
            entropy = D.masked_entropy(logits, mask)
            return action, logp, entropy, value

        self._act = _act

    def _split(self):
        self._key, k = jr.split(self._key)
        return k

    def select_action(self, observation: Dict[str, np.ndarray],
                      deterministic: bool = False) -> Tuple[int, Dict[str, Any]]:
        """Single-observation acting (`ppo.py:261-289`)."""
        a, logp, ent, v = self._act(
            self.variables,
            jnp.asarray(observation["board"])[None],
            jnp.asarray(observation["pieces"])[None],
            jnp.asarray(observation["action_mask"], jnp.float32)[None],
            self._split(),
            deterministic,
        )
        return int(a[0]), {
            "log_prob": float(logp[0]),
            "entropy": float(ent[0]),
            "value": float(v[0]),
        }

    def select_actions(self, observations: Dict[str, np.ndarray],
                       deterministic: bool = False):
        """Batched acting (`ppo.py:291-319`)."""
        a, logp, _, v = self._act(
            self.variables,
            jnp.asarray(observations["board"]),
            jnp.asarray(observations["pieces"]),
            jnp.asarray(observations["action_mask"], jnp.float32),
            self._split(),
            deterministic,
        )
        return np.asarray(a), np.asarray(logp), np.asarray(v)

    def get_values(self, observations: Dict[str, np.ndarray]) -> np.ndarray:
        """Bootstrap values (`ppo.py:321-328`)."""
        _, _, _, v = self._act(
            self.variables,
            jnp.asarray(observations["board"]),
            jnp.asarray(observations["pieces"]),
            jnp.ones(
                (np.asarray(observations["board"]).shape[0], 192), jnp.float32
            ),
            self._split(),
            True,
        )
        return np.asarray(v)

    def save(self, path: str) -> None:
        from ..utils.checkpoints import save_checkpoint
        import os
        payload = {
            "params": self.variables["params"],
            "batch_stats": self.variables.get("batch_stats", {}),
        }
        save_checkpoint(os.path.dirname(path) or ".", os.path.basename(path),
                        payload)

    def load(self, path: str) -> None:
        from ..cli.evaluate import load_variables_from_checkpoint
        self.variables = load_variables_from_checkpoint(path)

    @classmethod
    def from_checkpoint(cls, path: str, config: Optional[dict] = None):
        from ..agent.trainer import _network_from_config
        from ..cli.evaluate import (
            config_for_checkpoint,
            load_variables_from_checkpoint,
        )
        cfg = config or config_for_checkpoint(path)
        net = _network_from_config(cfg.get("network", {}))
        return cls(net, load_variables_from_checkpoint(path))
