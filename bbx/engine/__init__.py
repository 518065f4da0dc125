"""TPU-native Block Blast game engine: pure-functional, batch-first, jittable.

Layer L1 of the framework (reference: `/root/reference/src/game/`), rebuilt
as tensor programs — see SURVEY.md §7.1.
"""
from . import kernel, pieces, solvability, tables
from .state import EnvState, make_env_keys, regen_pieces, reset
from .step import RewardConfig, StepOutput, observe, step

__all__ = [
    "EnvState",
    "RewardConfig",
    "StepOutput",
    "kernel",
    "make_env_keys",
    "observe",
    "pieces",
    "regen_pieces",
    "reset",
    "solvability",
    "step",
    "tables",
]
