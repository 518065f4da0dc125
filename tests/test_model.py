"""Model-layer tests: topology, masking, masked entropy, param count."""
import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from bbx.models import BlockBlastNetwork, ActorCritic, count_parameters
from bbx.models import distributions as D


@pytest.fixture(scope="module")
def net_and_params():
    net = BlockBlastNetwork(dtype=jnp.float32)
    variables = net.init(
        {"params": jr.key(0), "dropout": jr.key(1)},
        jnp.zeros((2, 8, 8)), jnp.zeros((2, 3, 8, 8)), train=False,
    )
    return net, variables


def test_output_shapes(net_and_params):
    net, variables = net_and_params
    b, p = jnp.zeros((4, 8, 8)), jnp.zeros((4, 3, 8, 8))
    mask = jnp.ones((4, 192))
    logits, value = net.apply(variables, b, p, mask, train=False)
    assert logits.shape == (4, 192)
    assert value.shape == (4,)
    assert logits.dtype == jnp.float32


def test_param_count_close_to_reference(net_and_params):
    """Reference prints ~5M params (`scripts/train.py:124`); same topology
    here must land in the same ballpark."""
    _, variables = net_and_params
    n = count_parameters(variables["params"])
    assert 4_000_000 < n < 6_500_000, n


def test_masked_logits_kill_invalid_actions(net_and_params):
    net, variables = net_and_params
    key = jr.key(2)
    b = jr.uniform(key, (8, 8, 8))
    p = jr.uniform(key, (8, 3, 8, 8))
    mask = jr.bernoulli(key, 0.2, (8, 192)).astype(jnp.float32)
    mask = mask.at[:, 0].set(1.0)  # ensure at least one valid
    logits, _ = net.apply(variables, b, p, mask, train=False)
    probs = jax.nn.softmax(logits, axis=-1)
    invalid_mass = jnp.sum(probs * (1 - mask), axis=-1)
    assert float(jnp.max(invalid_mass)) < 1e-6


def test_sampling_respects_mask(net_and_params):
    net, variables = net_and_params
    key = jr.key(3)
    b = jr.uniform(key, (64, 8, 8))
    p = jr.uniform(key, (64, 3, 8, 8))
    mask = jnp.zeros((64, 192)).at[:, 10].set(1.0).at[:, 100].set(1.0)
    logits, _ = net.apply(variables, b, p, mask, train=False)
    actions = D.sample(jr.key(4), logits)
    assert set(np.asarray(actions).tolist()) <= {10, 100}


def test_masked_entropy_bounds():
    # Uniform over k valid actions -> entropy log(k); one valid -> 0.
    mask = jnp.zeros((2, 192))
    mask = mask.at[0, :4].set(1.0)
    mask = mask.at[1, 7].set(1.0)
    logits = D.mask_logits(jnp.zeros((2, 192)), mask)
    ent = D.masked_entropy(logits, mask)
    assert float(ent[0]) == pytest.approx(np.log(4), abs=1e-5)
    assert float(ent[1]) == pytest.approx(0.0, abs=1e-6)


def test_log_prob_matches_softmax():
    key = jr.key(5)
    raw = jr.normal(key, (3, 192))
    mask = jnp.ones((3, 192))
    logits = D.mask_logits(raw, mask)
    actions = jnp.array([0, 5, 191])
    lp = D.log_prob(logits, actions)
    ref = jnp.log(jax.nn.softmax(raw, axis=-1))
    for i, a in enumerate([0, 5, 191]):
        assert float(lp[i]) == pytest.approx(float(ref[i, a]), abs=1e-5)


def test_batch_stats_update_in_train_mode(net_and_params):
    net, variables = net_and_params
    b = jr.uniform(jr.key(6), (16, 8, 8))
    p = jr.uniform(jr.key(7), (16, 3, 8, 8))
    (_, _), mut = net.apply(
        variables, b, p, train=True, mutable=["batch_stats"],
        rngs={"dropout": jr.key(8)},
    )
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(mut["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(x), np.asarray(y))
        for x, y in zip(before, after)
    )
    assert changed


def test_groupnorm_variant_runs():
    net = BlockBlastNetwork(norm="group", dtype=jnp.float32)
    variables = net.init(
        {"params": jr.key(0), "dropout": jr.key(1)},
        jnp.zeros((2, 8, 8)), jnp.zeros((2, 3, 8, 8)), train=False,
    )
    logits, value = net.apply(
        variables, jnp.zeros((2, 8, 8)), jnp.zeros((2, 3, 8, 8)), train=False
    )
    assert logits.shape == (2, 192)
    assert "batch_stats" not in variables


def test_actor_critic_variant():
    net = ActorCritic(dtype=jnp.float32)
    variables = net.init(
        jr.key(0), jnp.zeros((2, 8, 8)), jnp.zeros((2, 3, 8, 8)),
    )
    logits, value = net.apply(
        variables, jnp.zeros((2, 8, 8)), jnp.zeros((2, 3, 8, 8)),
        jnp.ones((2, 192)),
    )
    assert logits.shape == (2, 192) and value.shape == (2,)
