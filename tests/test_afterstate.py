"""AfterstateNetwork: the in-model afterstate expansion must match the engine.

`bbx.models.afterstate.afterstate_planes` recomputes place+clear from the
observation planes alone; the engine's `_move_core` (bbx/engine/step.py) is
the ground truth.  Any drift here would mean the policy ranks boards the
game never produces.
"""
import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from bbx.engine.state import make_env_keys, reset
from bbx.engine.step import RewardConfig, observe, step
from bbx.engine.tables import NUM_ACTIONS
from bbx.models.afterstate import AfterstateNetwork, afterstate_planes


def _rollout_states(n=8, moves=12, seed=3):
    """Random-valid-action play to reach mid-game boards."""
    state = reset(make_env_keys(seed, n))
    key = jr.key(seed + 1)
    for _ in range(moves):
        obs = observe(state)
        key, k = jr.split(key)
        logits = jnp.where(obs["action_mask"], 0.0, -1e9)
        action = jr.categorical(k, logits)
        state = step(state, action, RewardConfig(), auto_reset=True).state
    return state


@pytest.mark.parametrize("seed", [3, 11])
def test_afterstate_matches_engine(seed):
    state = _rollout_states(n=6, moves=10, seed=seed)
    obs = observe(state)
    n = state.num_envs

    after, placed, lines, overlap = afterstate_planes(
        obs["board"], obs["pieces"]
    )

    # Engine ground truth: step every action on a tiled fleet.
    tiled = jax.tree.map(lambda x: jnp.repeat(x, NUM_ACTIONS, axis=0), state)
    actions = jnp.tile(jnp.arange(NUM_ACTIONS, dtype=jnp.int32), n)
    out = step(tiled, actions, RewardConfig(), auto_reset=False)
    eng_board = np.asarray(out.state.board).reshape(n, NUM_ACTIONS, 8, 8)
    eng_lines = np.asarray(
        out.info["last_lines_cleared"]
    ).reshape(n, NUM_ACTIONS)

    mask = np.asarray(obs["action_mask"])
    after = np.asarray(after)
    lines_np = np.asarray(lines)
    overlap_np = np.asarray(overlap)

    assert mask.any(), "test states must have valid moves"
    for i in range(n):
        for a in np.nonzero(mask[i])[0]:
            np.testing.assert_array_equal(
                after[i, a].astype(np.uint8), eng_board[i, a],
                err_msg=f"afterboard mismatch env {i} action {a}",
            )
            assert lines_np[i, a] == eng_lines[i, a], (i, a)
    # A valid (maskable) action never overlaps/out-of-bounds.
    assert not (mask & overlap_np).any()


def test_afterstate_network_forward_and_grad():
    state = _rollout_states(n=4, moves=6, seed=5)
    obs = observe(state)
    net = AfterstateNetwork(dtype=jnp.float32)
    variables = net.init(
        jr.key(0), obs["board"], obs["pieces"], obs["action_mask"]
    )
    logits, value = net.apply(
        variables, obs["board"], obs["pieces"], obs["action_mask"]
    )
    assert logits.shape == (4, NUM_ACTIONS) and value.shape == (4,)
    mask = np.asarray(obs["action_mask"])
    lg = np.asarray(logits)
    assert np.isfinite(lg[mask]).all() and np.isfinite(np.asarray(value)).all()
    assert (lg[~mask] < -1e8).all(), "invalid actions must be masked"

    def loss(params):
        lg2, v2 = net.apply(
            {"params": params}, obs["board"], obs["pieces"],
            obs["action_mask"],
        )
        sel = jnp.where(obs["action_mask"], jax.nn.log_softmax(lg2), 0.0)
        return -jnp.sum(sel) + jnp.sum(v2**2)

    grads = jax.grad(loss)(variables["params"])
    norms = [float(jnp.linalg.norm(g)) for g in jax.tree.leaves(grads)]
    assert all(np.isfinite(norms)) and sum(norms) > 0.0


def test_afterstate_trains_one_iteration():
    """PPO drives the afterstate family through one jitted iteration."""
    from bbx.agent.trainer import PPOTrainer

    cfg = {
        "training": {"num_envs": 8, "rollout_steps": 8, "batch_size": 32,
                     "total_timesteps": 4096},
        "ppo": {"num_epochs": 1},
        "network": {"type": "afterstate", "eval_channels": [8],
                    "eval_hidden": 16, "value_channels": [8],
                    "value_hidden": 16, "compute_dtype": "float32"},
    }
    tr = PPOTrainer(cfg, seed=0)
    m1 = tr.iterate()
    m2 = tr.iterate()
    for m in (m1, m2):
        for k, v in m.items():
            assert np.isfinite(float(v)), (k, v)
