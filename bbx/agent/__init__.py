"""Agent layer (L4): PPO with GAE, fully on-device."""
from .base import BaseAgent
from .policy_agent import PolicyAgent
from .ppo import (
    PPOConfig,
    TrainState,
    compute_gae,
    init_train_state,
    make_optimizer,
    make_train_iteration,
    rollout,
    train_iteration,
    update,
)

from .trainer import PPOTrainer, train

__all__ = [
    "BaseAgent",
    "PPOTrainer",
    "PolicyAgent",
    "train",
    "PPOConfig",
    "TrainState",
    "compute_gae",
    "init_train_state",
    "make_optimizer",
    "make_train_iteration",
    "rollout",
    "train_iteration",
    "update",
]
