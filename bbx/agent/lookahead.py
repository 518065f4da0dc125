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
    topk: int = 0,
    policy_logits: jnp.ndarray | None = None,
    return_q: bool = False,
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
      topk: if > 0, simulate only the top-k actions by masked policy logit
        instead of all 192 — the N*192 fleet is the scaling wall for search
        rollouts at training fleet sizes (round-4 verdict), and the policy's
        own top-k covers the search argmax almost always once the policy is
        warm.  0 (default, exact) simulates every action.
      policy_logits: optional precomputed masked logits [N, 192] for the
        top-k candidate selection (rollouts already have them; passing them
        avoids a second forward pass).
      return_q: also return the candidate ids and their Q estimates — the
        dense distillation target (Q-soft cloning regresses the policy
        toward the full candidate ORDERING instead of a noisy argmax
        label).
    Returns:
      [N] int32 actions (argmax of the one-ply Q estimate over candidates);
      with `return_q`, the tuple (actions, cand [N, width] int32,
      q [N, width] f32 with -inf on invalid candidates).
    """
    rc = reward_config or RewardConfig()
    n = state.num_envs
    mask = observe(state)["action_mask"]                      # [N, 192]

    if topk and topk < NUM_ACTIONS:
        if policy_logits is None:
            obs = observe(state)
            policy_logits, _ = network.apply(
                variables, obs["board"], obs["pieces"], obs["action_mask"],
                train=False,
            )
        # Masked logits sink invalid actions to -1e9, so top_k returns the
        # k highest-mass VALID actions first; any invalid stragglers (fewer
        # than k valid moves) are re-masked out of the Q argmax below.
        _, cand = jax.lax.top_k(policy_logits, topk)          # [N, k]
        cand = cand.astype(jnp.int32)
        width = topk
        actions = cand.reshape(n * width)
        cand_mask = jnp.take_along_axis(mask, cand, axis=1)
    else:
        cand = None
        width = NUM_ACTIONS
        actions = jnp.tile(jnp.arange(NUM_ACTIONS, dtype=jnp.int32), n)
        cand_mask = mask

    tiled = jax.tree.map(lambda x: jnp.repeat(x, width, axis=0), state)
    tiled = tiled.replace(rng=jr.split(key, n * width))
    out = step(tiled, actions, rc, auto_reset=False)

    obs2 = observe(out.state)
    _, v2 = network.apply(
        variables, obs2["board"], obs2["pieces"], obs2["action_mask"],
        train=False,
    )
    q = out.reward + gamma * v2.astype(jnp.float32) * (
        1.0 - out.done.astype(jnp.float32)
    )
    q = jnp.where(cand_mask, q.reshape(n, width), -jnp.inf)
    best = jnp.argmax(q, axis=1)
    if cand is None:
        cand_out = jnp.broadcast_to(
            jnp.arange(NUM_ACTIONS, dtype=jnp.int32)[None, :], (n, width)
        )
        action = best.astype(jnp.int32)
    else:
        cand_out = cand
        action = jnp.take_along_axis(cand, best[:, None], axis=1)[:, 0]
        action = action.astype(jnp.int32)
    if return_q:
        return action, cand_out, q
    return action
