"""One-ply value-lookahead action selection (beyond-the-reference eval mode).

The raw policy picks `argmax pi(a|s)`.  This selector instead simulates ALL
192 actions of every lane in one batched device step — place, clear, score,
regen — and picks `argmax_a [ r(s,a) + gamma * V(s') * (1 - done) ]` using
the trained value head.  On TPU the whole one-ply expansion is a single
fused program over an [N*192] tiled fleet; the reference's per-move Python
engine (~180 steps/s total) could never afford a 192-way simulation per
move, which is why no such mode exists there.

This is NOT the checkpoint's raw policy: results from it must be reported
as `policy+1-ply search`, never compared against raw-policy numbers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.random as jr

from ..engine.state import EnvState
from ..engine.step import RewardConfig, observe, step
from ..engine.tables import NUM_ACTIONS


def lookahead_actions(
    network,
    variables,
    state: EnvState,
    key: jnp.ndarray,
    reward_config: RewardConfig | None = None,
    gamma: float = 0.99,
) -> jnp.ndarray:
    """Pick actions by one-step simulation + value bootstrap.

    Args:
      network: the policy/value network (masked logits, value head).
      variables: its parameters (and batch stats).
      state: [N] EnvState.
      key: PRNG key — decorrelates the simulated regen draws (a one-sample
        estimate of E[V(s')] over the piece-draw distribution).
      reward_config: shaped-reward coefficients used for r(s, a).
      gamma: discount for the value bootstrap.
    Returns:
      [N] int32 actions (argmax of the one-ply Q estimate over valid moves).
    """
    rc = reward_config or RewardConfig()
    n = state.num_envs
    mask = observe(state)["action_mask"]                      # [N, 192]

    tiled = jax.tree.map(
        lambda x: jnp.repeat(x, NUM_ACTIONS, axis=0), state
    )
    tiled = tiled.replace(rng=jr.split(key, n * NUM_ACTIONS))
    actions = jnp.tile(jnp.arange(NUM_ACTIONS, dtype=jnp.int32), n)
    out = step(tiled, actions, rc, auto_reset=False)

    obs2 = observe(out.state)
    _, v2 = network.apply(
        variables, obs2["board"], obs2["pieces"], obs2["action_mask"],
        train=False,
    )
    q = out.reward + gamma * v2.astype(jnp.float32) * (
        1.0 - out.done.astype(jnp.float32)
    )
    q = jnp.where(mask, q.reshape(n, NUM_ACTIONS), -jnp.inf)
    return jnp.argmax(q, axis=1).astype(jnp.int32)
