"""PPO training-path tests: GAE pins, one full jitted iteration, learning
signal on a tiny run, checkpoint round-trip."""
import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from bbx.agent.ppo import (
    PPOConfig,
    compute_gae,
    init_train_state,
    make_optimizer,
    train_iteration,
)
from bbx.agent.trainer import PPOTrainer
from bbx.engine.state import make_env_keys, reset
from bbx.engine.step import RewardConfig
from bbx.models import BlockBlastNetwork

TINY = PPOConfig(
    num_epochs=2, minibatch_size=32, rollout_steps=8, num_envs=8,
)


def test_gae_matches_reference_recursion():
    """Pin GAE against a direct NumPy transcription of the reference
    recursion (`ppo.py:141-169`)."""
    cfg = PPOConfig(gamma=0.9, gae_lambda=0.8)
    T, N = 6, 3
    rng = np.random.default_rng(0)
    rewards = rng.normal(size=(T, N)).astype(np.float32)
    dones = (rng.random((T, N)) < 0.25).astype(np.float32)
    values = rng.normal(size=(T, N)).astype(np.float32)
    last_values = rng.normal(size=N).astype(np.float32)

    adv_ref = np.zeros((T, N), np.float32)
    last_gae = 0.0
    for t in reversed(range(T)):
        nonterm = 1.0 - dones[t]
        next_v = last_values if t == T - 1 else values[t + 1]
        delta = rewards[t] + cfg.gamma * next_v * nonterm - values[t]
        last_gae = delta + cfg.gamma * cfg.gae_lambda * nonterm * last_gae
        adv_ref[t] = last_gae
    ret_ref = adv_ref + values

    adv, ret = compute_gae(
        cfg, jnp.asarray(rewards), jnp.asarray(dones) > 0,
        jnp.asarray(values), jnp.asarray(last_values),
    )
    np.testing.assert_allclose(np.asarray(adv), adv_ref, rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ret), ret_ref, rtol=2e-5, atol=1e-5)


def test_adam_mu_dtype_bf16():
    """`ppo.adam_mu_dtype: bfloat16` stores Adam's first moment in bf16
    (HBM-traffic lever, round-5); second moment stays f32."""
    cfg = PPOConfig(adam_mu_dtype="bfloat16", num_envs=8, rollout_steps=8,
                    minibatch_size=32, num_epochs=2)
    net = BlockBlastNetwork(dtype=jnp.float32)
    ts = init_train_state(net, cfg, jr.key(0))
    adam_state = ts.opt_state[1][0]
    assert jax.tree.leaves(adam_state.mu)[0].dtype == jnp.bfloat16
    assert jax.tree.leaves(adam_state.nu)[0].dtype == jnp.float32
    # Default stays f32 (reference-faithful).
    ts2 = init_train_state(net, TINY, jr.key(0))
    assert jax.tree.leaves(ts2.opt_state[1][0].mu)[0].dtype == jnp.float32


@pytest.fixture(scope="module")
def tiny_setup():
    net = BlockBlastNetwork(dtype=jnp.float32)
    tx = make_optimizer(TINY)
    ts = init_train_state(net, TINY, jr.key(0))
    env_state = reset(make_env_keys(0, TINY.num_envs))
    return net, tx, ts, env_state


def test_one_train_iteration(tiny_setup):
    net, tx, ts, env_state = tiny_setup
    fn = jax.jit(
        lambda ts, es, k: train_iteration(
            net, TINY, RewardConfig(), tx, ts, es, k
        )
    )
    ts2, env_state2, metrics = fn(ts, env_state, jr.key(1))
    for k in ("policy_loss", "value_loss", "entropy", "approx_kl",
              "clip_fraction", "mean_score", "episodes", "invalid_frac"):
        assert k in metrics
        assert np.isfinite(float(metrics[k])), k
    assert int(ts2.update_step) == 1
    # Params changed.
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(ts.params), jax.tree.leaves(ts2.params))
    )
    assert changed
    # Masked sampling means no invalid actions ever.
    assert float(metrics["invalid_frac"]) == 0.0
    # Entropy of a masked categorical over <=192 actions.
    assert 0.0 < float(metrics["entropy"]) <= np.log(192) + 1e-3


def test_multiple_iterations_stable(tiny_setup):
    net, tx, ts, env_state = tiny_setup
    fn = jax.jit(
        lambda ts, es, k: train_iteration(
            net, TINY, RewardConfig(), tx, ts, es, k
        )
    )
    key = jr.key(2)
    for i in range(3):
        key, k = jr.split(key)
        ts, env_state, metrics = fn(ts, env_state, k)
        assert np.isfinite(float(metrics["total_loss"]))
    assert int(ts.update_step) == 3


def test_trainer_end_to_end_and_checkpoint(tmp_path):
    config = {
        "training": {"num_envs": 8, "rollout_steps": 8, "batch_size": 32},
        "ppo": {"num_epochs": 2},
        "network": {"compute_dtype": "float32"},
    }
    trainer = PPOTrainer(config, seed=0)
    m1 = trainer.iterate()
    assert np.isfinite(float(m1["total_loss"]))
    assert trainer.global_step == 64

    trainer.save(str(tmp_path), "ckpt")
    step_before = trainer.global_step
    params_before = jax.tree.map(np.asarray, trainer.train_state.params)

    trainer.iterate()
    trainer.load(str(tmp_path / "ckpt"))
    assert trainer.global_step == step_before
    for a, b in zip(jax.tree.leaves(params_before),
                    jax.tree.leaves(trainer.train_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
