"""bbx — Block Blast on XLA.

A TPU-native reinforcement-learning framework with the full capability
surface of `rfahd1525/Block-Blast-AI---Reinforcement-Learning-Agent`,
re-designed for JAX/XLA/Pallas/pjit: the game engine, environment, model,
and PPO trainer all run on-device as one compiled program, scaling over a
`jax.sharding.Mesh` instead of a Python loop of env objects.
"""

__version__ = "0.1.0"
