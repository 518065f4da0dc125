"""Model layer (L3): Flax policy/value networks and masked distributions."""
from . import distributions
from .afterstate import AfterstateNetwork, afterstate_planes
from .network import ActorCritic, BlockBlastNetwork, ResidualBlock, count_parameters

__all__ = [
    "ActorCritic",
    "AfterstateNetwork",
    "afterstate_planes",
    "BlockBlastNetwork",
    "ResidualBlock",
    "count_parameters",
    "distributions",
]
