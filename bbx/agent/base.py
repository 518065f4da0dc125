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
