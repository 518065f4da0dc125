"""Agent layer (L4): PPO with GAE, fully on-device."""
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

__all__ = [
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
