"""Search-distillation machinery tests (round-5: BC aux loss, annealed
search fraction, top-k lookahead restriction, bounded-update numerics).

These cover the beyond-the-reference distillation path that trains the RAW
policy toward the 1-ply value search's behavior (`bbx/agent/lookahead.py`,
`bbx/agent/ppo.py`): schedule math, rollout recording, candidate
restriction, the explicit BC gradient channel, and the NaN regression that
killed round 4's first probe.
"""
import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from bbx.agent.lookahead import lookahead_actions
from bbx.agent.ppo import (
    PPOConfig,
    bc_coef_at,
    init_train_state,
    make_optimizer,
    rollout,
    search_frac_at,
    update,
)
from bbx.engine.state import make_env_keys, reset
from bbx.engine.step import RewardConfig, observe
from bbx.engine.tables import NUM_ACTIONS
from bbx.models import BlockBlastNetwork
from bbx.models import distributions as D


@pytest.fixture(scope="module")
def net_and_state():
    net = BlockBlastNetwork(dtype=jnp.float32)
    cfg = PPOConfig(num_envs=8, rollout_steps=8, minibatch_size=32,
                    num_epochs=2)
    ts = init_train_state(net, cfg, jr.key(0))
    return net, ts


def test_schedule_anneals():
    cfg = PPOConfig(rollout_search_frac=0.8, final_rollout_search_frac=0.0,
                    bc_coef=0.5, final_bc_coef=0.1, schedule_updates=10)
    assert float(search_frac_at(cfg, jnp.int32(0))) == pytest.approx(0.8)
    assert float(search_frac_at(cfg, jnp.int32(5))) == pytest.approx(0.4)
    # Clamped past the horizon, never negative.
    assert float(search_frac_at(cfg, jnp.int32(25))) == pytest.approx(0.0)
    assert float(bc_coef_at(cfg, jnp.int32(10))) == pytest.approx(0.1)
    # No final value -> constant.
    flat = PPOConfig(rollout_search_frac=0.3, schedule_updates=10)
    assert float(search_frac_at(flat, jnp.int32(7))) == pytest.approx(0.3)
    assert flat.uses_search and cfg.uses_search
    assert not PPOConfig().uses_search
    # search_anneal_frac compresses the anneal horizon (lr/entropy keep
    # the full schedule): with 0.5 the anneal completes at half the run.
    early = PPOConfig(rollout_search_frac=0.8, final_rollout_search_frac=0.0,
                      bc_coef=0.4, final_bc_coef=0.0, schedule_updates=10,
                      search_anneal_frac=0.5)
    assert float(search_frac_at(early, jnp.int32(5))) == pytest.approx(0.0)
    assert float(bc_coef_at(early, jnp.int32(5))) == pytest.approx(0.0)
    assert float(search_frac_at(early, jnp.int32(2))) == pytest.approx(0.48)


def test_topk_matches_full_lookahead_on_reset_states(net_and_state):
    """On freshly-reset states a one-ply simulation never triggers a regen
    (all 3 pieces fresh, one placement), so the Q values are rng-independent
    and the top-k path must agree with the exact 192-way path wherever the
    candidate set covers every valid action."""
    net, ts = net_and_state
    variables = {"params": ts.params}
    if ts.batch_stats:
        variables["batch_stats"] = ts.batch_stats
    state = reset(make_env_keys(3, 6))
    mask = np.asarray(observe(state)["action_mask"])
    k = 184  # gather path (k < 192), wide enough to cover all valid moves
    full = np.asarray(lookahead_actions(
        net, variables, state, jr.key(5), RewardConfig()))
    topk = np.asarray(lookahead_actions(
        net, variables, state, jr.key(5), RewardConfig(), topk=k))
    covered = mask.sum(axis=1) <= k
    assert covered.any()
    np.testing.assert_array_equal(full[covered], topk[covered])
    # Both paths must return valid actions on every live lane.
    for arr in (full, topk):
        assert mask[np.arange(len(arr)), arr].all()


def test_rollout_records_valid_search_actions(net_and_state):
    net, ts = net_and_state
    cfg = PPOConfig(num_envs=8, rollout_steps=8, minibatch_size=32,
                    num_epochs=2, rollout_search_frac=0.5, search_topk=8)
    env_state = reset(make_env_keys(1, cfg.num_envs))
    _, _, traj, _, _ = jax.jit(
        lambda es, k: rollout(net, cfg, RewardConfig(), ts.params,
                              ts.batch_stats, es, k, jnp.int32(0))
    )(env_state, jr.key(2))
    assert "search_a" in traj
    sa = np.asarray(traj["search_a"], np.int64)  # [T, N]
    mask = np.asarray(traj["mask"])              # [T, N, 192]
    t_idx, n_idx = np.meshgrid(np.arange(sa.shape[0]), np.arange(sa.shape[1]),
                               indexing="ij")
    # Training lanes auto-reset, so every state is live and the search must
    # always choose a currently-valid action.
    assert mask[t_idx, n_idx, sa].all()


def test_rollout_skips_search_when_annealed_out(net_and_state):
    net, ts = net_and_state
    cfg = PPOConfig(num_envs=8, rollout_steps=4, minibatch_size=32,
                    num_epochs=2, rollout_search_frac=0.5,
                    final_rollout_search_frac=0.0, schedule_updates=10)
    env_state = reset(make_env_keys(1, cfg.num_envs))
    _, _, traj, _, _ = jax.jit(
        lambda es, k, step: rollout(net, cfg, RewardConfig(), ts.params,
                                    ts.batch_stats, es, k, step)
    )(env_state, jr.key(2), jnp.int32(50))
    # Past the anneal horizon the lax.cond takes the dummy branch.
    assert int(np.asarray(traj["search_a"]).sum()) == 0


def _synthetic_traj(cfg, target_action):
    T, N = cfg.rollout_steps, cfg.num_envs
    rng = np.random.default_rng(0)
    return {
        "board": jnp.zeros((T, N, 8, 8), jnp.uint8),
        "piece_ids": jnp.zeros((T, N, 3), jnp.int8),
        "used": jnp.zeros((T, N, 3), bool),
        "mask": jnp.ones((T, N, NUM_ACTIONS), bool),
        "action": jnp.asarray(rng.integers(0, NUM_ACTIONS, (T, N)), jnp.int32),
        "logp": jnp.full((T, N), -5.0, jnp.float32),
        "value": jnp.zeros((T, N), jnp.float32),
        "reward": jnp.zeros((T, N), jnp.float32),
        "done": jnp.zeros((T, N), bool),
        "search_a": jnp.full((T, N), target_action, jnp.uint8),
        "search_used": jnp.ones((T, N), bool),
    }


def test_bc_adv_pos_filter(net_and_state):
    """`bc_filter: adv_pos` clones only executed-search steps whose GAE came
    out positive; with every advantage negative the BC term must vanish."""
    net, ts0 = net_and_state
    cfg = PPOConfig(num_envs=8, rollout_steps=8, minibatch_size=32,
                    num_epochs=1, bc_coef=1.0, bc_filter="adv_pos")
    tx = make_optimizer(cfg)
    ts = ts0.replace(opt_state=tx.init(ts0.params))
    traj = _synthetic_traj(cfg, 5)
    T, N = cfg.rollout_steps, cfg.num_envs
    ret = jnp.zeros((T, N), jnp.float32)
    neg = jnp.full((T, N), -2.0, jnp.float32)
    # Advantages are re-normalized inside update(); uniform values would
    # normalize to ~0, so mix mostly-negative with a few positives and
    # check both regimes stay finite; then a pure search_used=False case
    # must zero the BC loss exactly.
    _, m = jax.jit(lambda ts, k: update(net, cfg, tx, ts, traj, neg, ret, k)
                   )(ts, jr.key(0))
    assert np.isfinite(float(m["bc_loss"]))
    traj2 = dict(traj)
    traj2["search_used"] = jnp.zeros((T, N), bool)
    _, m2 = jax.jit(lambda ts, k: update(net, cfg, tx, ts, traj2, neg, ret, k)
                    )(ts, jr.key(0))
    assert float(m2["bc_loss"]) == 0.0


def test_bc_loss_pulls_policy_toward_search_action(net_and_state):
    """The explicit BC channel must raise the policy's probability of the
    search-chosen action even when the advantage signal is zero — the exact
    failure mode of round 4's floored-logp surrogate (ADVICE.md)."""
    net, ts0 = net_and_state
    cfg = PPOConfig(num_envs=8, rollout_steps=8, minibatch_size=32,
                    num_epochs=4, bc_coef=1.0, learning_rate=1e-3)
    assert cfg.uses_search
    tx = make_optimizer(cfg)
    ts = ts0.replace(opt_state=tx.init(ts0.params))
    target = 7
    traj = _synthetic_traj(cfg, target)
    zeros = jnp.zeros((cfg.rollout_steps, cfg.num_envs), jnp.float32)

    obs = {
        "board": jnp.zeros((4, 8, 8), jnp.float32),
        "pieces": jnp.zeros((4, 3, 8, 8), jnp.float32),
        "action_mask": jnp.ones((4, NUM_ACTIONS), bool),
    }

    def prob_of_target(params, batch_stats):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        logits, _ = net.apply(variables, obs["board"], obs["pieces"],
                              obs["action_mask"], train=False)
        return float(jnp.exp(D.log_prob(
            logits, jnp.full((4,), target, jnp.int32))).mean())

    before = prob_of_target(ts.params, ts.batch_stats)
    for i in range(3):
        ts, metrics = jax.jit(
            lambda ts, k: update(net, cfg, tx, ts, traj, zeros, zeros, k)
        )(ts, jr.key(i))
        assert np.isfinite(float(metrics["total_loss"]))
        assert np.isfinite(float(metrics["bc_loss"]))
    after = prob_of_target(ts.params, ts.batch_stats)
    assert after > max(3 * before, 0.2), (before, after)


def test_q_soft_distillation_orders_policy(net_and_state):
    """`bc_target: q_soft` must pull the policy's ranking toward the
    candidate Q ordering — the dense target that replaced hard-argmax
    cloning after run7's rank-2 plateau (see PPOConfig.bc_target)."""
    net, ts0 = net_and_state
    cfg = PPOConfig(num_envs=8, rollout_steps=8, minibatch_size=32,
                    num_epochs=4, bc_coef=1.0, bc_target="q_soft",
                    bc_q_temp=1.0, search_topk=4, learning_rate=1e-3)
    tx = make_optimizer(cfg)
    ts = ts0.replace(opt_state=tx.init(ts0.params))
    T, N = cfg.rollout_steps, cfg.num_envs
    traj = _synthetic_traj(cfg, 5)
    # Candidates 10..13 with a strong Q gradient favouring action 10.
    cand = jnp.broadcast_to(jnp.arange(10, 14, dtype=jnp.int32),
                            (T, N, 4))
    qv = jnp.broadcast_to(jnp.asarray([4.0, 1.0, 0.0, -2.0], jnp.float32),
                          (T, N, 4))
    traj["search_cand"] = cand.astype(jnp.uint8)
    traj["search_q"] = qv.astype(jnp.bfloat16)
    zeros = jnp.zeros((T, N), jnp.float32)

    obs = {
        "board": jnp.zeros((4, 8, 8), jnp.float32),
        "pieces": jnp.zeros((4, 3, 8, 8), jnp.float32),
        "action_mask": jnp.ones((4, NUM_ACTIONS), bool),
    }

    def prob(params, batch_stats, a):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        logits, _ = net.apply(variables, obs["board"], obs["pieces"],
                              obs["action_mask"], train=False)
        return float(jnp.exp(D.log_prob(
            logits, jnp.full((4,), a, jnp.int32))).mean())

    for i in range(3):
        ts, metrics = jax.jit(
            lambda ts, k: update(net, cfg, tx, ts, traj, zeros, zeros, k)
        )(ts, jr.key(i))
        assert np.isfinite(float(metrics["bc_loss"]))
    p10 = prob(ts.params, ts.batch_stats, 10)
    p13 = prob(ts.params, ts.batch_stats, 13)
    assert p10 > 0.2 and p10 > 5 * p13, (p10, p13)


def test_update_finite_under_extreme_ratio(net_and_state):
    """NaN regression (round-4 probe): stored logp floored at -15 while the
    policy later concentrates mass means ratios up to e^15.  The dual-clip
    bound must keep loss and gradients finite."""
    net, ts0 = net_and_state
    cfg = PPOConfig(num_envs=8, rollout_steps=8, minibatch_size=32,
                    num_epochs=2, rollout_search_frac=0.5)
    tx = make_optimizer(cfg)
    ts = ts0.replace(opt_state=tx.init(ts0.params))
    traj = _synthetic_traj(cfg, 3)
    # Worst case: floored old logp, strongly negative advantages.
    traj["logp"] = jnp.full_like(traj["logp"], -15.0)
    T, N = cfg.rollout_steps, cfg.num_envs
    adv = jnp.full((T, N), -4.0, jnp.float32)
    ret = jnp.zeros((T, N), jnp.float32)
    ts2, metrics = jax.jit(
        lambda ts, k: update(net, cfg, tx, ts, traj, adv, ret, k)
    )(ts, jr.key(0))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    for leaf in jax.tree.leaves(ts2.params):
        assert np.isfinite(np.asarray(leaf)).all()
