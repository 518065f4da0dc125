"""High-level PPO trainer: mesh placement, train loop, logging, checkpoints.

The orchestration layer that the reference spreads over
`scripts/train.py:61-312` — rebuilt around a single jitted train iteration.
Under `jax.jit` + GSPMD the environment batch and rollout live sharded over
the mesh's `data` axis while parameters stay replicated; XLA inserts the
gradient all-reduce (and cross-replica BatchNorm reductions) automatically.
"""
from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

from ..engine.state import make_env_keys, reset as engine_reset
from ..engine.step import RewardConfig
from ..models.network import BlockBlastNetwork, count_parameters
from ..parallel.mesh import make_mesh, data_sharding, replicated
from ..utils.checkpoints import load_checkpoint, save_checkpoint
from ..utils.logging import Logger, MetricsTracker, TensorBoardLogger
from .ppo import (
    PPOConfig,
    TrainState,
    init_train_state,
    make_optimizer,
    train_iteration,
)


def _network_from_config(net_cfg: Dict[str, Any]):
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        net_cfg.get("compute_dtype", "bfloat16")
    ]
    if net_cfg.get("type", "cnn") == "afterstate":
        from ..models.afterstate import AfterstateNetwork

        return AfterstateNetwork(
            eval_channels=tuple(net_cfg.get("eval_channels", (24, 24))),
            eval_hidden=net_cfg.get("eval_hidden", 96),
            ctx_dim=net_cfg.get("ctx_dim", 32),
            value_channels=tuple(net_cfg.get("value_channels", (48, 64))),
            value_hidden=net_cfg.get("value_hidden", 256),
            dtype=dtype,
        )
    return BlockBlastNetwork(
        conv_channels=tuple(net_cfg.get("conv_channels", (64, 128, 128))),
        fc_hidden=tuple(net_cfg.get("fc_hidden", (512, 256))),
        use_residual=net_cfg.get("use_residual", True),
        norm="batch" if net_cfg.get("use_batch_norm", True) else "none",
        dtype=dtype,
    )


def ppo_config_from(
    config: Dict[str, Any], total_timesteps: Optional[int] = None
) -> PPOConfig:
    ppo = config.get("ppo", {})
    tr = config.get("training", {})
    num_envs = tr.get("num_envs", 64)
    rollout_steps = tr.get("rollout_steps", 128)
    # Linear lr/entropy anneal horizon = the planned number of PPO updates
    # (schedules are off unless a final_* value is configured).  The horizon
    # follows the *effective* run length: a --total-timesteps override must
    # stretch/shrink the anneal with it, not leave it at the YAML value.
    effective_total = total_timesteps or tr.get("total_timesteps", 10_000_000)
    schedule_updates = int(effective_total // (num_envs * rollout_steps))
    return PPOConfig(
        learning_rate=ppo.get("learning_rate", 3e-4),
        gamma=ppo.get("gamma", 0.99),
        gae_lambda=ppo.get("gae_lambda", 0.95),
        clip_epsilon=ppo.get("clip_epsilon", 0.2),
        entropy_coef=ppo.get("entropy_coef", 0.01),
        value_coef=ppo.get("value_coef", 0.5),
        max_grad_norm=ppo.get("max_grad_norm", 0.5),
        num_epochs=ppo.get("num_epochs", 10),
        minibatch_size=tr.get("batch_size", 2048),
        rollout_steps=rollout_steps,
        num_envs=num_envs,
        rollout_search_frac=ppo.get("rollout_search_frac", 0.0),
        final_rollout_search_frac=ppo.get("final_rollout_search_frac"),
        bc_coef=ppo.get("bc_coef", 0.0),
        final_bc_coef=ppo.get("final_bc_coef"),
        bc_filter=ppo.get("bc_filter", "all"),
        bc_target=ppo.get("bc_target", "argmax"),
        bc_q_temp=ppo.get("bc_q_temp", 1.0),
        search_topk=ppo.get("search_topk", 0),
        search_anneal_frac=ppo.get("search_anneal_frac", 1.0),
        adam_mu_dtype=ppo.get("adam_mu_dtype"),
        final_learning_rate=ppo.get("final_learning_rate"),
        final_entropy_coef=ppo.get("final_entropy_coef"),
        schedule_updates=schedule_updates,
    )


def reward_config_from(config: Dict[str, Any]) -> RewardConfig:
    rc = RewardConfig()
    rewards = config.get("rewards", {})
    return rc.replace(**{k: v for k, v in rewards.items() if hasattr(rc, k)})


class PPOTrainer:
    """Owns the network, optimizer, sharded env fleet, and the jitted step."""

    def __init__(
        self,
        config: Dict[str, Any],
        seed: int = 42,
        mesh=None,
        total_timesteps: Optional[int] = None,
    ):
        self.config = config
        self.seed = seed
        self.ppo = ppo_config_from(config, total_timesteps)
        self.rewards = reward_config_from(config)
        self.network = _network_from_config(config.get("network", {}))
        self.tx = make_optimizer(self.ppo)

        mesh_cfg = config.get("mesh", {}) or {}
        self.mesh = mesh or make_mesh(
            num_data=mesh_cfg.get("num_data"),
            num_model=mesh_cfg.get("num_model", 1) or 1,
        )
        self._data_sh = data_sharding(self.mesh)
        self._repl_sh = replicated(self.mesh)

        key = jr.key(seed)
        self.key, k_init = jr.split(key)
        ts = init_train_state(self.network, self.ppo, k_init)
        self.train_state: TrainState = self._put_replicated(ts)
        self.env_state = self._initial_env_state(seed)

        def _iter(ts, env_state, key):
            return train_iteration(
                self.network, self.ppo, self.rewards, self.tx,
                ts, env_state, key,
            )

        self._train_iter = jax.jit(
            _iter,
            in_shardings=(self._repl_sh, self._data_sh, self._repl_sh),
            out_shardings=(self._repl_sh, self._data_sh, self._repl_sh),
            donate_argnums=(0, 1),
        )
        self.global_step = 0
        self._loaded_extra: Dict[str, Any] = {}

    # ---- multi-process placement -------------------------------------------
    def _put_replicated(self, tree):
        """Replicate a host-identical pytree over the (possibly multi-host)
        mesh.  Values are bitwise-identical on every process (same seed), so
        assembling from process-local data is exact."""
        if jax.process_count() == 1:
            return jax.device_put(tree, self._repl_sh)
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                self._repl_sh, np.asarray(x)
            ),
            tree,
        )

    def _initial_env_state(self, seed: int):
        """Reset the env fleet sharded over `data`.

        Single process: one jitted reset with sharded outputs.  Multi-process
        (SURVEY.md §2.8 "per-host env shards"): each host resets only its
        contiguous `host_env_slice` of the global fleet and the shards are
        assembled into global arrays — no env data ever crosses hosts.
        """
        n = self.ppo.num_envs
        if jax.process_count() == 1:
            env_keys = jax.device_put(make_env_keys(seed, n), self._data_sh)
            return jax.jit(engine_reset, out_shardings=self._data_sh)(env_keys)

        import dataclasses

        from ..parallel.distributed import host_env_slice

        start, count = host_env_slice(n)
        local = jax.jit(engine_reset)(
            make_env_keys(seed, n)[start:start + count]
        )
        leaves = {f.name: getattr(local, f.name)
                  for f in dataclasses.fields(local)}
        leaves["rng"] = jr.key_data(leaves["rng"])
        global_leaves = {
            k: jax.make_array_from_process_local_data(
                self._data_sh, np.asarray(v)
            )
            for k, v in leaves.items()
        }
        global_leaves["rng"] = jr.wrap_key_data(global_leaves["rng"])
        from ..engine.state import EnvState
        return EnvState(**global_leaves)

    # ---- on-device evaluation ---------------------------------------------
    def evaluate(self, num_episodes: int = 100, seed: int = 10_000,
                 max_steps: int = 8192, chunk: int = 128,
                 stochastic: bool = False,
                 lookahead: bool = False) -> Dict[str, float]:
        """Evaluate the current policy (greedy by default).

        Delegates to `bbx.cli.evaluate.evaluate_policy` — ONE lane-stepping
        implementation serves both the CLI and in-training eval (round-5
        unification), with the union of knobs: `stochastic` samples from the
        masked categorical (how the reference's rolling training mean
        collects episodes, `scripts/train.py:228-232`), `lookahead` runs
        policy+1-ply search (label results as search-assisted).  Every
        aggregate, including the max, is over COMPLETED episodes only.
        """
        from ..cli.evaluate import evaluate_policy

        variables = {"params": self.train_state.params}
        if self.train_state.batch_stats:
            variables["batch_stats"] = self.train_state.batch_stats
        r = evaluate_policy(
            self.network, variables, num_episodes=num_episodes,
            deterministic=not stochastic, seed=seed, max_steps=max_steps,
            chunk=chunk, lookahead=lookahead, gamma=self.ppo.gamma,
            reward_config=self.rewards, topk=self.ppo.search_topk,
        )
        return {
            "eval_score_mean": r["score_mean"],
            "eval_score_max": r["score_max"],
            "eval_score_median": r["score_median"],
            "eval_length_mean": r["length_mean"],
            "eval_completed": float(r["completed"]),
            "eval_truncated": float(r["truncated"]),
        }

    @property
    def num_params(self) -> int:
        return count_parameters(self.train_state.params)

    def iterate(self) -> Dict[str, float]:
        """Run one PPO iteration (rollout + update); returns metrics."""
        self.key, k = jr.split(self.key)
        ts, env_state, metrics = self._train_iter(
            self.train_state, self.env_state, k
        )
        self.train_state = ts
        self.env_state = env_state
        self.global_step += self.ppo.batch_size
        return metrics

    # ---- checkpointing ---------------------------------------------------
    def _payload(self, extra: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
        """Checkpoint payload as host-materializable arrays.

        The env fleet is sharded across hosts, so multi-process saves must
        allgather it first (`np.asarray` raises on jax.Arrays with
        non-addressable shards); the train state is fully replicated and
        converts directly.  This is a COLLECTIVE in multi-process runs —
        every process must call it (see `save`).
        """
        import dataclasses

        env = {f.name: getattr(self.env_state, f.name)
               for f in dataclasses.fields(self.env_state)}
        env["rng"] = jr.key_data(env["rng"])
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            env = jax.tree.map(
                lambda x: multihost_utils.process_allgather(x, tiled=True),
                env,
            )
        payload = {
            "params": self.train_state.params,
            "batch_stats": self.train_state.batch_stats,
            "opt_state": self.train_state.opt_state,
            "update_step": self.train_state.update_step,
            "global_step": np.int64(self.global_step),
            "key": jr.key_data(self.key),
            "env_state": env,
        }
        if extra:
            payload["extra"] = extra
        return payload

    def save(self, directory: str, name: str,
             extra: Optional[Dict[str, Any]] = None) -> str:
        """Save a checkpoint.  In multi-process runs EVERY process must call
        this (the env-fleet allgather inside `_payload` is a collective);
        only the primary touches the filesystem."""
        import os

        from ..parallel.distributed import is_primary

        payload = self._payload(extra)
        # Orbax's Checkpointer is multihost-aware: EVERY process calls save
        # (it synchronizes internally and only the primary touches disk), so
        # there is no save/load race between processes.
        path = save_checkpoint(directory, name, payload)
        if is_primary():
            # Sidecar with the architecture/hyperparameters so evaluate/play
            # can rebuild the right network without the training YAML (the
            # reference stores its config inside the .pt file,
            # `ppo.py:425-439`).
            import json

            sidecar = {k: self.config[k]
                       for k in ("network", "ppo", "rewards", "training")
                       if k in self.config}
            with open(path + ".config.json", "w") as f:
                json.dump(sidecar, f, indent=2)
        return path

    def load(self, path: str) -> None:
        from ..engine.state import EnvState

        payload = load_checkpoint(path)
        # Orbax restores pytrees as plain lists/dicts; rebuild the optax
        # state's named-tuple structure from a fresh template (named tuples
        # and lists flatten in the same field order, so the leaves line up).
        opt_template = self.tx.init(payload["params"])
        opt_state = jax.tree.unflatten(
            jax.tree.structure(opt_template),
            jax.tree.leaves(payload["opt_state"]),
        )
        ts = TrainState(
            params=payload["params"],
            batch_stats=payload["batch_stats"],
            opt_state=opt_state,
            update_step=jnp.asarray(payload["update_step"]),
        )
        # Placement must mirror __init__: plain device_put fails on shardings
        # spanning non-addressable devices, so replicated state goes through
        # _put_replicated and the env fleet is assembled from this host's
        # contiguous slice of the restored global arrays.
        self.train_state = self._put_replicated(ts)
        self.global_step = int(payload.get("global_step", 0))
        if "key" in payload:
            self.key = jr.wrap_key_data(jnp.asarray(payload["key"]))
        env = payload.get("env_state")
        if env is not None and env["board"].shape[0] == self.ppo.num_envs:
            if jax.process_count() == 1:
                env = {k: jnp.asarray(v) for k, v in env.items()}
                env["rng"] = jr.wrap_key_data(env["rng"])
                self.env_state = jax.device_put(EnvState(**env), self._data_sh)
            else:
                from ..parallel.distributed import host_env_slice

                start, count = host_env_slice(self.ppo.num_envs)
                env = {
                    k: jax.make_array_from_process_local_data(
                        self._data_sh, np.asarray(v)[start:start + count]
                    )
                    for k, v in env.items()
                }
                env["rng"] = jr.wrap_key_data(env["rng"])
                self.env_state = EnvState(**env)
        self._loaded_extra = dict(payload.get("extra", {}) or {})

    def load_params_only(self, path: str) -> None:
        payload = load_checkpoint(path)
        self.train_state = self.train_state.replace(
            params=jax.device_put(payload["params"], self._repl_sh),
            batch_stats=jax.device_put(payload["batch_stats"], self._repl_sh),
        )


def _iteration_flops(trainer: "PPOTrainer") -> Optional[float]:
    """Analytic FLOPs of one train iteration (for MFU).

    XLA's `cost_analysis()` counts a `lax.scan` body ONCE regardless of
    trip count, so lowering the whole jitted iteration undercounts the
    scanned rollout (x rollout_steps) and minibatch-update (x epochs *
    minibatches) loops by ~80x at production shapes.  Instead, lower the
    un-scanned network forward at the rollout batch and the minibatch
    grad step, then scale each by its trip count.  The env-step / GAE /
    optimizer FLOPs outside the network are negligible (<1%).
    """
    try:
        from .ppo import _apply

        cfg, net, ts = trainer.ppo, trainer.network, trainer.train_state

        def obs_of(b):
            return {
                "board": jnp.zeros((b, 8, 8), jnp.float32),
                "pieces": jnp.zeros((b, 3, 8, 8), jnp.float32),
                "action_mask": jnp.ones((b, 192), bool),
            }

        def make_fwd(train):
            def fwd(params, obs):
                logits, value, _ = _apply(
                    net, params, ts.batch_stats, obs, train=train,
                    dropout_key=jr.key(0),
                    mutable=train and bool(ts.batch_stats),
                )
                return jnp.sum(logits.astype(jnp.float32)) + jnp.sum(value)
            return fwd

        def count(fn, *args):
            cost = jax.jit(fn).lower(*args).compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            return float(cost.get("flops", 0.0))

        f_roll = count(make_fwd(cfg.rollout_train_mode),
                       ts.params, obs_of(cfg.num_envs))
        f_upd = count(jax.grad(make_fwd(True)),
                      ts.params, obs_of(cfg.minibatch_size))
        num_mb = cfg.batch_size // cfg.minibatch_size
        total = (f_roll * cfg.rollout_steps
                 + f_upd * cfg.num_epochs * num_mb)
        return total or None
    except Exception:
        return None


_PEAK_FLOPS = {
    # bf16 peak per chip
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
}


def _device_peak_flops() -> Optional[float]:
    kind = jax.devices()[0].device_kind
    for k, v in _PEAK_FLOPS.items():
        if kind.startswith(k):
            return v
    return None


def train(
    config: Dict[str, Any],
    resume_path: Optional[str] = None,
    seed: Optional[int] = None,
    progress_callback: Optional[Callable[[Dict[str, Any]], bool]] = None,
    total_timesteps: Optional[int] = None,
    profile: bool = False,
) -> Dict[str, Any]:
    """The canonical training entry point (`scripts/train.py:61-312`).

    Returns final stats.  `progress_callback(metrics) -> bool` mirrors the
    reference's GUI hook: return False to stop training.  `seed=None`
    defaults to `training.seed` from the config (42 if absent); an explicit
    argument (the CLI flag) wins over the config.

    Beyond the reference: optional deterministic eval every
    `logging.eval_interval` updates (gates the `best` checkpoint on eval
    score instead of the stochastic rollout mean), a wall-clock budget
    (`training.max_hours`), exact resume (env fleet + best + tracker
    restored from the checkpoint), preemption-signal checkpointing
    (SIGTERM triggers a clean save of `final` + `latest`, SURVEY.md §5),
    and `profile=True` for per-phase timing, an MFU estimate, and a one-off
    `jax.profiler` trace dump.
    """
    import os
    import signal
    import threading

    tr_cfg = config.get("training", {})
    log_cfg = config.get("logging", {})
    paths = config.get("paths", {})
    if seed is None:
        seed = tr_cfg.get("seed", 42)
    total_timesteps = total_timesteps or tr_cfg.get("total_timesteps", 10_000_000)
    max_hours = tr_cfg.get("max_hours")

    # Preemption handling: a SIGTERM (the TPU-pod preemption signal) stops
    # the loop at the next iteration boundary; the finally block then saves
    # a full-state checkpoint, so (train, SIGTERM, resume) == continuous.
    preempted = threading.Event()
    prev_sigterm = None
    if threading.current_thread() is threading.main_thread():
        try:
            prev_sigterm = signal.signal(
                signal.SIGTERM, lambda *_: preempted.set()
            )
        except ValueError:
            prev_sigterm = None

    ckpt_dir = paths.get("checkpoint_dir", "checkpoints")
    log_dir = paths.get("log_dir", "logs")
    os.makedirs(ckpt_dir, exist_ok=True)

    from ..parallel.distributed import is_primary
    from ..utils.profiling import PhaseTimer

    primary = is_primary()
    logger = Logger(log_dir, "ppo", enabled=primary)
    tb = TensorBoardLogger(log_dir, "ppo", enabled=primary)
    tracker = MetricsTracker(window_size=100)
    timer = PhaseTimer()

    trainer = PPOTrainer(config, seed=seed, total_timesteps=total_timesteps)
    if primary:
        print(f"mesh: {trainer.mesh}")
        print(f"envs: {trainer.ppo.num_envs}  rollout: {trainer.ppo.rollout_steps}"
              f"  batch/update: {trainer.ppo.batch_size}")
        print(f"network parameters: {trainer.num_params:,}")

    best_score = -float("inf")
    best_eval = -float("inf")
    init_from = tr_cfg.get("init_from")
    if init_from and not resume_path:
        # Warm start: network weights (and BN stats) only — fresh optimizer,
        # schedules, env fleet, and step counter.  The fine-tune analogue of
        # --resume, which restores the full training state instead.
        trainer.load_params_only(init_from)
        if primary:
            print(f"initialized params from {init_from}")
    if resume_path:
        trainer.load(resume_path)
        best_score = trainer._loaded_extra.get("best_score", best_score)
        best_eval = trainer._loaded_extra.get("best_eval", best_eval)
        if "tracker_scores" in trainer._loaded_extra:
            tracker.update_many(
                "score", trainer._loaded_extra["tracker_scores"]
            )
            tracker.update_many(
                "length", trainer._loaded_extra.get("tracker_lengths", [])
            )
        if primary:
            print(f"resumed from {resume_path} at step {trainer.global_step}")

    log_interval = log_cfg.get("log_interval", 10)
    save_interval = log_cfg.get("save_interval", 100)
    eval_interval = log_cfg.get("eval_interval", 0)  # 0 disables in-run eval
    eval_episodes = log_cfg.get("eval_episodes", 100)

    flops_per_iter = _iteration_flops(trainer) if profile else None
    peak_flops = _device_peak_flops() if profile else None

    def _extra():
        out = {"best_score": best_score, "best_eval": best_eval}
        scores = np.asarray(tracker.values("score"), np.float64)
        lengths = np.asarray(tracker.values("length"), np.float64)
        # Orbax refuses zero-size arrays; omit the windows until the first
        # episode completes (the resume path tolerates the missing keys).
        if scores.size:
            out["tracker_scores"] = scores
        if lengths.size:
            out["tracker_lengths"] = lengths
        return out

    update_idx = 0
    t_start = time.time()
    t_window = t_start
    steps_window = 0
    iter_window = 0
    stop = False
    deadline = t_start + max_hours * 3600 if max_hours else None

    try:
        while trainer.global_step < total_timesteps and not stop:
            with timer.phase("train_iter"):
                metrics = trainer.iterate()
            update_idx += 1
            steps_window += trainer.ppo.batch_size
            iter_window += 1

            if profile and update_idx == 20:
                trace_dir = os.path.join(log_dir, "trace")
                with jax.profiler.trace(trace_dir):
                    with timer.phase("train_iter"):
                        metrics = trainer.iterate()
                update_idx += 1
                steps_window += trainer.ppo.batch_size
                iter_window += 1
                if primary:
                    print(f"profiler trace written to {trace_dir}")

            if deadline and time.time() > deadline:
                if primary:
                    print(f"wall-clock budget ({max_hours}h) reached — stopping")
                stop = True

            if preempted.is_set():
                if primary:
                    print("SIGTERM received — checkpointing and stopping")
                stop = True

            if update_idx % log_interval == 0 or stop:
                metrics = {k: float(v) for k, v in metrics.items()}
                now = time.time()
                fps = steps_window / max(now - t_window, 1e-9)
                sec_per_iter = (now - t_window) / max(iter_window, 1)
                t_window, steps_window, iter_window = now, 0, 0
                tracker.update({
                    "score": metrics["mean_score"],
                    "length": metrics["mean_length"],
                })
                row = {
                    "fps": fps,
                    "avg_score": tracker.get_mean("score"),
                    "max_score": metrics["max_score"],
                    "avg_length": tracker.get_mean("length"),
                    "policy_loss": metrics["policy_loss"],
                    "value_loss": metrics["value_loss"],
                    "entropy": metrics["entropy"],
                    "approx_kl": metrics["approx_kl"],
                    "clip_fraction": metrics["clip_fraction"],
                    "episodes": metrics["episodes"],
                    "invalid_frac": metrics["invalid_frac"],
                }
                for extra_key in ("bc_loss", "search_frac", "bc_coef"):
                    if extra_key in metrics:
                        row[extra_key] = metrics[extra_key]
                if flops_per_iter and peak_flops:
                    # flops_per_iter counts the GLOBAL batch; peak is per
                    # chip, so normalize by the mesh's device count.
                    row["mfu"] = (flops_per_iter / sec_per_iter
                                  / (peak_flops * jax.device_count()))
                logger.log(row, step=trainer.global_step)
                for k, v in row.items():
                    tag = ("performance/" if k in
                           ("fps", "avg_score", "max_score", "avg_length", "mfu")
                           else "training/")
                    tb.log_scalar(tag + k, v, trainer.global_step)

                # Without in-run eval, `best` is gated on the rolling mean of
                # stochastic rollout scores once the window has substance
                # (the reference compares a 100-episode rolling mean,
                # `scripts/train.py:228-232`).  Save calls are NOT primary-
                # gated: the metrics are global, so the gate agrees on every
                # process, and trainer.save is a collective (env allgather)
                # that only writes on the primary.
                if (not eval_interval
                        and row["avg_score"] > best_score and update_idx > 10):
                    best_score = row["avg_score"]
                    trainer.save(ckpt_dir, "best", extra=_extra())

                if progress_callback is not None:
                    cont = progress_callback(
                        {"step": trainer.global_step, **row}
                    )
                    if cont is False:
                        stop = True

            if eval_interval and (update_idx % eval_interval == 0 or stop):
                with timer.phase("eval"):
                    ev = trainer.evaluate(eval_episodes)
                logger.log(ev, step=trainer.global_step)
                for k, v in ev.items():
                    tb.log_scalar("eval/" + k, v, trainer.global_step)
                if primary:
                    print(f"  eval @ {trainer.global_step}: "
                          f"mean {ev['eval_score_mean']:.1f}  "
                          f"max {ev['eval_score_max']:.0f}  "
                          f"len {ev['eval_length_mean']:.1f}")
                if ev["eval_score_mean"] > best_eval:
                    best_eval = ev["eval_score_mean"]
                    trainer.save(ckpt_dir, "best", extra=_extra())

            if save_interval and update_idx % save_interval == 0:
                with timer.phase("checkpoint"):
                    trainer.save(ckpt_dir, f"checkpoint_{trainer.global_step}",
                                 extra=_extra())
                    trainer.save(ckpt_dir, "latest", extra=_extra())
    except KeyboardInterrupt:
        if primary:
            print("interrupted — saving final checkpoint")
    finally:
        trainer.save(ckpt_dir, "final", extra=_extra())
        if preempted.is_set():
            # Preemption path: also refresh `latest` so the standard
            # resume-from-latest workflow picks up the preempted state.
            trainer.save(ckpt_dir, "latest", extra=_extra())
        if prev_sigterm is not None:
            signal.signal(signal.SIGTERM, prev_sigterm)
        if primary:
            logger.save_summary()
            tb.close()
            if profile:
                print(timer.report())

    elapsed = time.time() - t_start
    return {
        "global_step": trainer.global_step,
        "elapsed_sec": elapsed,
        "steps_per_sec": trainer.global_step / max(elapsed, 1e-9),
        "best_score": best_score,
        "best_eval": best_eval,
        "trainer": trainer,
    }
