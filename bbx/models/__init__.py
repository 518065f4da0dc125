"""Model layer (L3): Flax policy/value networks and masked distributions."""
from . import distributions
from .network import ActorCritic, BlockBlastNetwork, ResidualBlock, count_parameters

__all__ = [
    "ActorCritic",
    "BlockBlastNetwork",
    "ResidualBlock",
    "count_parameters",
    "distributions",
]
