"""Agent interface (reference: `/root/reference/src/agents/base.py`)."""
from __future__ import annotations

import abc
from typing import Any, Dict, Tuple

import numpy as np


class BaseAgent(abc.ABC):
    """Minimal agent contract: act, learn, persist (`base.py:10-87`)."""

    def __init__(self):
        self.training = True

    @abc.abstractmethod
    def select_action(self, observation: Dict[str, np.ndarray],
                      deterministic: bool = False) -> Tuple[int, Dict[str, Any]]:
        ...

    # NOTE: the reference also declares `update(batch) -> Dict` abstract
    # (`base.py:43-56`), but its own PPO never calls it through this
    # interface and its signature (a single torch-tensor batch) doesn't fit
    # the actual update (rollout buffer + schedules).  bbx drops it
    # deliberately: the on-device update is `bbx.agent.ppo.update`, invoked
    # by the jitted train iteration, not a per-agent method — a host-side
    # abstract method would be dead API surface here.

    @abc.abstractmethod
    def save(self, path: str) -> None:
        ...

    @abc.abstractmethod
    def load(self, path: str) -> None:
        ...

    def train(self) -> None:
        self.training = True

    def eval(self) -> None:
        self.training = False
