"""PPO, fully on-device: rollout scan -> GAE scan -> minibatch update scans.

One jitted `train_iteration` replaces the reference's host-side loop
(`/root/reference/scripts/train.py:169-210`, `/root/reference/src/agents/
ppo.py:70-423`): the environment, the policy, GAE, and the clipped update all
run inside a single XLA program with zero host<->device transfers per step.

Semantics preserved from the reference:
  * rollout of `rollout_steps` x `num_envs` transitions, then GAE with
    bootstrap values (`ppo.py:141-169`);
  * advantages normalized over the WHOLE buffer before minibatching
    (`ppo.py:196`);
  * per-epoch reshuffled minibatches; clipped surrogate + 0.5*MSE value loss
    + 0.01 * (-masked entropy); global-norm clip 0.5; Adam(eps=1e-5)
    (`ppo.py:246-256,362-414`);
  * the network runs in train mode (BatchNorm batch stats + dropout) during
    both rollout and update, as torch's default mode does in the reference.

The rollout buffer is stored compactly on device: uint8 boards and int8
piece ids instead of f32 observation planes (the f32 planes are
rematerialized per minibatch from the piece table — cheaper than the HBM
traffic of storing them).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import jax.random as jr
import optax
from flax import struct

from ..engine.state import EnvState
from ..engine.step import RewardConfig, observe, step
from ..engine.tables import NUM_ACTIONS, PIECE_MASKS
from ..models import distributions as D


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    """Hyperparameters (`ppo.py:26-67` + `config/default.yaml`)."""

    learning_rate: float = 3e-4
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_epsilon: float = 0.2
    entropy_coef: float = 0.01
    value_coef: float = 0.5
    max_grad_norm: float = 0.5
    num_epochs: int = 10
    minibatch_size: int = 2048
    rollout_steps: int = 128
    num_envs: int = 64
    # torch modules default to train mode, so the reference's rollout uses
    # batch-stat BN and live dropout; flip this for deterministic rollouts.
    rollout_train_mode: bool = True
    # --- search distillation (beyond the reference) ----------------------
    # Fraction of rollout actions taken by the 1-ply value search instead of
    # the policy sample (bbx.agent.lookahead).  May be annealed (DAgger-
    # style) via final_rollout_search_frac so the policy must stand alone by
    # the end of training.  0.0 (default) is the reference-faithful
    # pure-policy rollout.
    rollout_search_frac: float = 0.0
    final_rollout_search_frac: Optional[float] = None
    # Behavior-cloning auxiliary loss: cross-entropy of the policy against
    # the search-chosen action at EVERY rollout state (the search action is
    # recorded even on steps where the env executed the policy sample).
    # The clipped-ratio surrogate is a weak distillation signal for actions
    # the policy gives near-zero mass; this is the explicit supervised
    # channel.  Annealable to 0 via final_bc_coef.
    bc_coef: float = 0.0
    final_bc_coef: Optional[float] = None
    # BC sample filter: "all" clones the search action at every state;
    # "adv_pos" clones only steps where the env EXECUTED the search action
    # and GAE scored it positive (binary advantage-weighted regression).
    # The 1-ply teacher is noisy (one-sample regen draws, near-ties in Q):
    # uniform cloning bottoms out at the teacher distribution's ~2.4-nat
    # entropy floor, while the advantage filter keeps only the choices that
    # actually paid off.
    bc_filter: str = "all"
    # BC target: "argmax" is hard cross-entropy against the search-chosen
    # action; "q_soft" distills the search's per-candidate Q VALUES via
    # CE(policy, softmax(q / bc_q_temp)) — the dense target.  Measured on
    # run7 (55M steps of argmax cloning): the search action sat at median
    # RANK 2 in the policy with 0.19 mass and argmax agreement stuck at
    # 31% — a hard label cannot resolve the ordering of the policy's top
    # few candidates, which is where the score difference lives; the Q
    # vector supervises that ordering directly and its one-sample regen
    # noise averages out in the soft target.
    bc_target: str = "argmax"
    bc_q_temp: float = 1.0
    # Restrict the 1-ply simulation to the top-k masked policy logits
    # (0 = all 192 actions).  Cuts the lookahead fleet from N*192 to N*k,
    # which is what makes search rollouts affordable at 1024+ envs.
    search_topk: int = 0
    # Fraction of `schedule_updates` over which the search-frac/BC anneals
    # complete (lr/entropy keep the full horizon).  With e.g. 0.6 the last
    # 40% of the run is pure-policy PPO polish at full rollout speed.
    search_anneal_frac: float = 1.0
    # Optional linear schedules over `schedule_updates` PPO iterations
    # (the reference trains at constant lr/entropy; these default off).
    final_learning_rate: Optional[float] = None
    final_entropy_coef: Optional[float] = None
    schedule_updates: int = 0
    # Store Adam's first moment in bfloat16 ("bfloat16" | None).  Halves the
    # optimizer-state HBM traffic per minibatch step; the second moment and
    # the update math stay f32 (v's dynamic range matters for eps=1e-5).
    adam_mu_dtype: Optional[str] = None

    @property
    def batch_size(self) -> int:
        return self.rollout_steps * self.num_envs

    @property
    def uses_search(self) -> bool:
        """Static (trace-time) flag: does any phase of this run need the
        1-ply search in rollouts?  The per-update amount is dynamic
        (annealed); this gates whether the search machinery is traced in."""
        return (
            self.rollout_search_frac > 0.0
            or (self.final_rollout_search_frac or 0.0) > 0.0
            or self.bc_coef > 0.0
            or (self.final_bc_coef or 0.0) > 0.0
        )


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    update_step: jnp.ndarray  # scalar int32


def make_optimizer(config: PPOConfig) -> optax.GradientTransformation:
    lr = config.learning_rate
    if config.final_learning_rate is not None and config.schedule_updates > 0:
        # The optimizer step count advances once per minibatch gradient step.
        steps = (config.schedule_updates * config.num_epochs
                 * max(1, config.batch_size // config.minibatch_size))
        lr = optax.linear_schedule(
            config.learning_rate, config.final_learning_rate, steps
        )
    mu_dtype = jnp.bfloat16 if config.adam_mu_dtype == "bfloat16" else None
    return optax.chain(
        optax.clip_by_global_norm(config.max_grad_norm),
        optax.adam(lr, eps=1e-5, mu_dtype=mu_dtype),
    )


def _linear_at(c0: float, c1: Optional[float], horizon: int,
               update_step: jnp.ndarray) -> jnp.ndarray:
    """Linear schedule c0 -> c1 over `horizon` PPO iterations (traced)."""
    if c1 is None or horizon <= 0:
        return jnp.float32(c0)
    frac = jnp.clip(update_step.astype(jnp.float32) / horizon, 0.0, 1.0)
    return jnp.float32(c0) + (jnp.float32(c1) - jnp.float32(c0)) * frac


def entropy_coef_at(config: PPOConfig, update_step: jnp.ndarray) -> jnp.ndarray:
    """Entropy coefficient for the given PPO iteration (traced-friendly)."""
    return _linear_at(config.entropy_coef, config.final_entropy_coef,
                      config.schedule_updates, update_step)


def search_frac_at(config: PPOConfig, update_step: jnp.ndarray) -> jnp.ndarray:
    """Search-action fraction for the given PPO iteration (annealable)."""
    horizon = int(config.schedule_updates * config.search_anneal_frac)
    return _linear_at(config.rollout_search_frac,
                      config.final_rollout_search_frac,
                      horizon, update_step)


def bc_coef_at(config: PPOConfig, update_step: jnp.ndarray) -> jnp.ndarray:
    """Behavior-cloning coefficient for the given PPO iteration."""
    horizon = int(config.schedule_updates * config.search_anneal_frac)
    return _linear_at(config.bc_coef, config.final_bc_coef,
                      horizon, update_step)


def init_train_state(network, config: PPOConfig, key) -> TrainState:
    dummy_board = jnp.zeros((2, 8, 8), jnp.float32)
    dummy_pieces = jnp.zeros((2, 3, 8, 8), jnp.float32)
    variables = network.init(
        {"params": key, "dropout": key}, dummy_board, dummy_pieces, train=False
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(config)
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        update_step=jnp.int32(0),
    )


def _apply(network, params, batch_stats, obs, *, train, dropout_key=None,
           mutable=False):
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    rngs = {"dropout": dropout_key} if dropout_key is not None else None
    if mutable and batch_stats:
        (logits, value), mut = network.apply(
            variables, obs["board"], obs["pieces"], obs["action_mask"],
            train=train, rngs=rngs, mutable=["batch_stats"],
        )
        return logits, value, mut["batch_stats"]
    logits, value = network.apply(
        variables, obs["board"], obs["pieces"], obs["action_mask"],
        train=train, rngs=rngs,
    )
    return logits, value, batch_stats


def rollout(network, config: PPOConfig, reward_config: RewardConfig,
            params, batch_stats, env_state: EnvState, key,
            update_step=None):
    """Collect `rollout_steps` transitions for every env, entirely on device.

    Returns (env_state, batch_stats, traj, ep_stats) where `traj` is a dict
    of [T, N, ...] arrays and `ep_stats` aggregates finished episodes.
    `update_step` drives the (optional) search-frac / BC-coef anneals.
    """
    train_mode = config.rollout_train_mode
    obs0 = observe(env_state)
    if update_step is None:
        update_step = jnp.int32(0)
    frac = search_frac_at(config, update_step)
    bc_now = bc_coef_at(config, update_step)

    def body(carry, key_t):
        env_state, obs, batch_stats = carry
        k_drop, k_samp = jr.split(key_t)
        logits, value, batch_stats = _apply(
            network, params, batch_stats, obs,
            train=train_mode,
            dropout_key=k_drop if train_mode else None,
            mutable=train_mode,
        )
        action = D.sample(k_samp, logits)
        search_a = None
        if config.uses_search:
            from .lookahead import lookahead_actions

            k_look, k_mix = jr.split(jr.fold_in(key_t, 1))
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats

            width = (config.search_topk
                     if 0 < config.search_topk < NUM_ACTIONS else NUM_ACTIONS)
            n = action.shape[0]

            def _search(args):
                st, lg, k = args
                return lookahead_actions(
                    network, variables, st, k,
                    reward_config=reward_config, gamma=config.gamma,
                    topk=config.search_topk, policy_logits=lg,
                    return_q=True,
                )

            def _dummy(args):
                # Dummy Q is 0, NOT -inf: an all--inf row would make the
                # (coefficient-gated) soft target NaN, and a NaN anywhere in
                # the graph leaks through `where`'s untaken-branch gradient.
                return (jnp.zeros_like(action),
                        jnp.zeros((n, width), jnp.int32),
                        jnp.zeros((n, width), jnp.float32))

            # lax.cond, not where: once the anneal reaches 0 the N*k-lane
            # simulation is genuinely skipped, so the tail of a DAgger-style
            # run costs the same as a pure-policy rollout.
            search_a, search_cand, search_q = jax.lax.cond(
                (frac > 0.0) | (bc_now > 0.0),
                _search, _dummy,
                (env_state, logits, k_look),
            )
            use = jr.uniform(k_mix, action.shape) < frac
            action = jnp.where(use, search_a, action)
            search_used = use
        logp = D.log_prob(logits, action)
        if config.uses_search:
            # Floor only the STORED logp (advisor, round 4): a search action
            # the policy gives ~zero mass would store logp ~ -1e9 and the
            # update's exp(new - old) ratio would overflow.  With the floor,
            # new_logp <= 0 bounds the ratio at e^15; the update's own
            # gradient is bounded by its clipping (see `update`), so the
            # fresh log-prob there stays UNfloored and keeps its gradient.
            logp = jnp.maximum(logp, -15.0)
        out = step(env_state, action, reward_config, auto_reset=True)
        trans = {
            "board": env_state.board,                    # uint8 [N,8,8]
            "piece_ids": env_state.piece_ids.astype(jnp.int8),
            "used": env_state.used,
            "mask": obs["action_mask"],                  # bool [N,192]
            "action": action,
            "logp": logp,
            "value": value,
            "reward": out.reward,
            "done": out.done,
        }
        if search_a is not None:
            trans["search_a"] = search_a.astype(jnp.uint8)  # 192 < 256
            trans["search_used"] = search_used
            if config.bc_target == "q_soft":
                trans["search_cand"] = search_cand.astype(jnp.uint8)
                # bf16 storage: the soft target tolerates coarse Q.
                trans["search_q"] = search_q.astype(jnp.bfloat16)
        stats = {
            "done": out.done,
            "final_score": out.info["final_score"],
            "final_length": out.info["final_length"],
            "final_return": out.info["final_return"],
            "final_lines": out.info["final_lines"],
            "final_max_combo": out.info["final_max_combo"],
            "invalid": out.info["invalid_action"],
        }
        return (out.state, out.obs, batch_stats), (trans, stats)

    keys = jr.split(key, config.rollout_steps)
    (env_state, last_obs, batch_stats), (traj, stats) = jax.lax.scan(
        body, (env_state, obs0, batch_stats), keys
    )

    # Bootstrap value of the final observation (`scripts/train.py:206`).
    logits, last_value, batch_stats = _apply(
        network, params, batch_stats, last_obs, train=False, mutable=False
    )
    del logits

    dones_f = stats["done"].astype(jnp.float32)
    n_done = jnp.maximum(jnp.sum(dones_f), 1.0)
    ep_stats = {
        "episodes": jnp.sum(dones_f),
        "mean_score": jnp.sum(stats["final_score"] * dones_f) / n_done,
        "max_score": jnp.max(
            jnp.where(stats["done"], stats["final_score"], 0)
        ).astype(jnp.float32),
        "mean_length": jnp.sum(stats["final_length"] * dones_f) / n_done,
        "mean_return": jnp.sum(stats["final_return"] * dones_f) / n_done,
        "mean_lines": jnp.sum(stats["final_lines"] * dones_f) / n_done,
        "mean_max_combo": jnp.sum(stats["final_max_combo"] * dones_f) / n_done,
        "invalid_frac": jnp.mean(stats["invalid"].astype(jnp.float32)),
    }
    return env_state, batch_stats, traj, last_value, ep_stats


def compute_gae(config: PPOConfig, rewards, dones, values, last_value):
    """Reverse-scan GAE (`ppo.py:141-169`)."""
    gamma, lam = config.gamma, config.gae_lambda

    def body(carry, xs):
        adv_next, v_next = carry
        r, d, v = xs
        nonterm = 1.0 - d.astype(jnp.float32)
        delta = r + gamma * v_next * nonterm - v
        adv = delta + gamma * lam * nonterm * adv_next
        return (adv, v), adv

    (_, _), advantages = jax.lax.scan(
        body,
        (jnp.zeros_like(last_value), last_value),
        (rewards, dones, values),
        reverse=True,
    )
    returns = advantages + values
    return advantages, returns


def _minibatch_obs(batch):
    """Rematerialize f32 observation planes from the compact buffer."""
    pieces = PIECE_MASKS[batch["piece_ids"].astype(jnp.int32)]
    pieces = pieces * (~batch["used"][:, :, None, None]).astype(jnp.float32)
    return {
        "board": batch["board"].astype(jnp.float32),
        "pieces": pieces,
        "action_mask": batch["mask"],
    }


def update(network, config: PPOConfig, tx, ts: TrainState, traj,
           advantages, returns, key):
    """Epochs of shuffled minibatch PPO updates (`ppo.py:330-423`)."""
    total = config.batch_size
    mb = config.minibatch_size
    assert total % mb == 0, (
        f"rollout batch {total} not divisible by minibatch {mb}"
    )
    num_mb = total // mb

    flat = {k: v.reshape(total, *v.shape[2:]) for k, v in traj.items()}
    adv = advantages.reshape(total)
    adv = (adv - adv.mean()) / (adv.std() + 1e-8)  # ppo.py:196
    ret = returns.reshape(total)
    ent_coef = entropy_coef_at(config, ts.update_step)
    bc_coef = bc_coef_at(config, ts.update_step)

    def loss_fn(params, batch_stats, batch, dropout_key):
        obs = _minibatch_obs(batch)
        logits, value, new_stats = _apply(
            network, params, batch_stats, obs,
            train=True, dropout_key=dropout_key, mutable=True,
        )
        new_logp = D.log_prob(logits, batch["action"])
        entropy = D.masked_entropy(logits, batch["mask"])

        # Stored logp is floored at -15 (rollout), new_logp <= 0, so the
        # log-ratio lives in (-inf, 15]: exp never overflows and a ~zero
        # mass action just contributes ratio ~ 0.  The gradient is bounded
        # on BOTH advantage signs: positive-adv samples with ratio past
        # 1+eps take the constant clipped branch, and negative-adv samples
        # with ratio past the dual-clip bound (Ye et al. 2020, used only in
        # mixed search/policy rollouts where ratios can reach e^15) take a
        # constant floor — which is what keeps a distillation run finite
        # where round 4's probe hit NaN.
        logratio = new_logp - batch["logp"]
        ratio = jnp.exp(logratio)
        surr1 = ratio * batch["adv"]
        surr2 = jnp.clip(ratio, 1 - config.clip_epsilon,
                         1 + config.clip_epsilon) * batch["adv"]
        per_sample = jnp.minimum(surr1, surr2)
        if config.uses_search:
            dual = 3.0 * batch["adv"]
            per_sample = jnp.where(
                batch["adv"] < 0.0, jnp.maximum(per_sample, dual), per_sample
            )
        policy_loss = -jnp.mean(per_sample)
        value_loss = jnp.mean((value - batch["ret"]) ** 2)
        entropy_mean = jnp.mean(entropy)
        loss = (
            policy_loss
            + config.value_coef * value_loss
            - ent_coef * entropy_mean
        )
        if config.uses_search:
            # Explicit distillation channel: cross-entropy against the
            # search-chosen action at every state (recorded whether or not
            # the env executed it).  The clipped surrogate above cannot push
            # mass onto actions the policy currently scores near zero (its
            # gradient saturates at the clip); this term can.  Once the BC
            # anneal reaches 0 the rollout skips the search entirely and
            # `search_a` holds dummy zeros, so both the loss term and the
            # metric are gated through `where` (never 0 * garbage).
            if config.bc_target == "q_soft":
                # Dense target: CE against softmax(q / temp) over the
                # search's candidate set.  Invalid candidates carry -inf Q
                # (zero target mass); candidate log-probs are finite (the
                # mask uses -1e9, not -inf).  The advantage filter does not
                # apply here — the Q vector labels every state regardless
                # of which arm acted.
                q = batch["search_q"].astype(jnp.float32)
                tgt = jax.nn.softmax(q / config.bc_q_temp, axis=-1)
                cand = batch["search_cand"].astype(jnp.int32)
                logp_all = jax.nn.log_softmax(logits, axis=-1)
                logp_cand = jnp.take_along_axis(logp_all, cand, axis=-1)
                bc_raw = -jnp.mean(jnp.sum(tgt * logp_cand, axis=-1))
            else:
                bc_logp = D.log_prob(
                    logits, batch["search_a"].astype(jnp.int32))
                if config.bc_filter == "adv_pos":
                    sel = batch["search_used"] & (batch["adv"] > 0.0)
                    w = sel.astype(jnp.float32)
                    bc_raw = -(jnp.sum(bc_logp * w)
                               / jnp.maximum(jnp.sum(w), 1.0))
                else:
                    bc_raw = -jnp.mean(bc_logp)
            bc_active = bc_coef > 0.0
            bc_loss = jnp.where(bc_active, bc_raw, 0.0)
            loss = loss + jnp.where(bc_active, bc_coef * bc_loss, 0.0)
        else:
            bc_loss = jnp.float32(0.0)
        # Metric-only clamp: a ratio of exactly 0 would make the k3 KL
        # estimator print inf; training math above never sees this clamp.
        kl_lr = jnp.clip(logratio, -20.0, 20.0)
        approx_kl = jnp.mean(jnp.exp(kl_lr) - 1.0 - kl_lr)
        clip_frac = jnp.mean(
            (jnp.abs(ratio - 1.0) > config.clip_epsilon).astype(jnp.float32)
        )
        aux = {
            "policy_loss": policy_loss,
            "value_loss": value_loss,
            "entropy": entropy_mean,
            "total_loss": loss,
            "approx_kl": approx_kl,
            "clip_fraction": clip_frac,
            "bc_loss": bc_loss,
        }
        return loss, (new_stats, aux)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def mb_step(carry, idx_key):
        params, batch_stats, opt_state = carry
        mb_idx, k = idx_key
        k_drop = k
        batch = {k2: v[mb_idx] for k2, v in flat.items()}
        batch["adv"] = adv[mb_idx]
        batch["ret"] = ret[mb_idx]
        (_, (batch_stats, aux)), grads = grad_fn(
            params, batch_stats, batch, k_drop
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, batch_stats, opt_state), aux

    def epoch_step(carry, key_e):
        k_perm, k_mb = jr.split(key_e)
        perm = jr.permutation(k_perm, total).reshape(num_mb, mb)
        mb_keys = jr.split(k_mb, num_mb)
        carry, auxs = jax.lax.scan(mb_step, carry, (perm, mb_keys))
        return carry, auxs

    epoch_keys = jr.split(key, config.num_epochs)
    (params, batch_stats, opt_state), auxs = jax.lax.scan(
        epoch_step, (ts.params, ts.batch_stats, ts.opt_state), epoch_keys
    )
    metrics = jax.tree.map(jnp.mean, auxs)
    new_ts = TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        update_step=ts.update_step + 1,
    )
    return new_ts, metrics


def train_iteration(network, config: PPOConfig, reward_config: RewardConfig,
                    tx, ts: TrainState, env_state: EnvState, key):
    """One full PPO iteration: rollout + GAE + update.  Jit this."""
    k_roll, k_upd = jr.split(key)
    env_state, batch_stats, traj, last_value, ep_stats = rollout(
        network, config, reward_config, ts.params, ts.batch_stats,
        env_state, k_roll, ts.update_step,
    )
    ts = ts.replace(batch_stats=batch_stats)
    advantages, returns = compute_gae(
        config, traj["reward"], traj["done"], traj["value"], last_value
    )
    ts, metrics = update(network, config, tx, ts, traj, advantages, returns,
                         k_upd)
    metrics = dict(metrics)
    metrics.update(ep_stats)
    if config.uses_search:
        metrics["search_frac"] = search_frac_at(config, ts.update_step - 1)
        metrics["bc_coef"] = bc_coef_at(config, ts.update_step - 1)
    return ts, env_state, metrics


def make_train_iteration(network, config: PPOConfig,
                         reward_config: RewardConfig, tx, donate: bool = True):
    """Build the jitted train-iteration callable."""
    fn = partial(train_iteration, network, config, reward_config, tx)
    donate_argnums = (0, 1) if donate else ()
    return jax.jit(fn, donate_argnums=donate_argnums)
