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


def _network_from_config(net_cfg: Dict[str, Any]) -> BlockBlastNetwork:
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        net_cfg.get("compute_dtype", "bfloat16")
    ]
    return BlockBlastNetwork(
        conv_channels=tuple(net_cfg.get("conv_channels", (64, 128, 128))),
        fc_hidden=tuple(net_cfg.get("fc_hidden", (512, 256))),
        use_residual=net_cfg.get("use_residual", True),
        norm="batch" if net_cfg.get("use_batch_norm", True) else "none",
        dtype=dtype,
    )


def ppo_config_from(config: Dict[str, Any]) -> PPOConfig:
    ppo = config.get("ppo", {})
    tr = config.get("training", {})
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
        rollout_steps=tr.get("rollout_steps", 128),
        num_envs=tr.get("num_envs", 64),
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
    ):
        self.config = config
        self.seed = seed
        self.ppo = ppo_config_from(config)
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
        self.train_state: TrainState = jax.device_put(ts, self._repl_sh)

        env_keys = jax.device_put(
            make_env_keys(seed, self.ppo.num_envs), self._data_sh
        )
        self.env_state = jax.jit(
            engine_reset, out_shardings=self._data_sh
        )(env_keys)

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
    def _payload(self) -> Dict[str, Any]:
        return {
            "params": self.train_state.params,
            "batch_stats": self.train_state.batch_stats,
            "opt_state": self.train_state.opt_state,
            "update_step": self.train_state.update_step,
            "global_step": np.int64(self.global_step),
            "key": jr.key_data(self.key),
        }

    def save(self, directory: str, name: str) -> str:
        path = save_checkpoint(directory, name, self._payload())
        # Sidecar with the architecture/hyperparameters so evaluate/play can
        # rebuild the right network without the training YAML (the reference
        # stores its config inside the .pt file, `ppo.py:425-439`).
        import json

        sidecar = {k: self.config[k]
                   for k in ("network", "ppo", "rewards", "training")
                   if k in self.config}
        with open(path + ".config.json", "w") as f:
            json.dump(sidecar, f, indent=2)
        return path

    def load(self, path: str) -> None:
        payload = load_checkpoint(path)
        ts = TrainState(
            params=payload["params"],
            batch_stats=payload["batch_stats"],
            opt_state=payload["opt_state"],
            update_step=jnp.asarray(payload["update_step"]),
        )
        self.train_state = jax.device_put(ts, self._repl_sh)
        self.global_step = int(payload.get("global_step", 0))
        if "key" in payload:
            self.key = jr.wrap_key_data(jnp.asarray(payload["key"]))

    def load_params_only(self, path: str) -> None:
        payload = load_checkpoint(path)
        self.train_state = self.train_state.replace(
            params=jax.device_put(payload["params"], self._repl_sh),
            batch_stats=jax.device_put(payload["batch_stats"], self._repl_sh),
        )


def train(
    config: Dict[str, Any],
    resume_path: Optional[str] = None,
    seed: int = 42,
    progress_callback: Optional[Callable[[Dict[str, Any]], bool]] = None,
    total_timesteps: Optional[int] = None,
) -> Dict[str, Any]:
    """The canonical training entry point (`scripts/train.py:61-312`).

    Returns final stats.  `progress_callback(metrics) -> bool` mirrors the
    reference's GUI hook: return False to stop training.
    """
    import os

    tr_cfg = config.get("training", {})
    log_cfg = config.get("logging", {})
    paths = config.get("paths", {})
    total_timesteps = total_timesteps or tr_cfg.get("total_timesteps", 10_000_000)

    ckpt_dir = paths.get("checkpoint_dir", "checkpoints")
    log_dir = paths.get("log_dir", "logs")
    os.makedirs(ckpt_dir, exist_ok=True)

    from ..parallel.distributed import is_primary

    primary = is_primary()
    logger = Logger(log_dir, "ppo", enabled=primary)
    tb = TensorBoardLogger(log_dir, "ppo", enabled=primary)
    tracker = MetricsTracker(window_size=100)

    trainer = PPOTrainer(config, seed=seed)
    if primary:
        print(f"mesh: {trainer.mesh}")
        print(f"envs: {trainer.ppo.num_envs}  rollout: {trainer.ppo.rollout_steps}"
              f"  batch/update: {trainer.ppo.batch_size}")
        print(f"network parameters: {trainer.num_params:,}")

    if resume_path:
        trainer.load(resume_path)
        if primary:
            print(f"resumed from {resume_path} at step {trainer.global_step}")

    log_interval = log_cfg.get("log_interval", 10)
    save_interval = log_cfg.get("save_interval", 100)

    best_score = -float("inf")
    update_idx = 0
    t_start = time.time()
    t_window = t_start
    steps_window = 0
    stop = False

    try:
        while trainer.global_step < total_timesteps and not stop:
            metrics = trainer.iterate()
            update_idx += 1
            steps_window += trainer.ppo.batch_size

            if update_idx % log_interval == 0:
                metrics = {k: float(v) for k, v in metrics.items()}
                now = time.time()
                fps = steps_window / max(now - t_window, 1e-9)
                t_window, steps_window = now, 0
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
                logger.log(row, step=trainer.global_step)
                for k, v in row.items():
                    tag = ("performance/" if k in
                           ("fps", "avg_score", "max_score", "avg_length")
                           else "training/")
                    tb.log_scalar(tag + k, v, trainer.global_step)

                if primary and row["avg_score"] > best_score and update_idx > 10:
                    best_score = row["avg_score"]
                    trainer.save(ckpt_dir, "best")

                if progress_callback is not None:
                    cont = progress_callback(
                        {"step": trainer.global_step, **row}
                    )
                    if cont is False:
                        stop = True

            if primary and update_idx % save_interval == 0:
                trainer.save(ckpt_dir, f"checkpoint_{trainer.global_step}")
                trainer.save(ckpt_dir, "latest")
    except KeyboardInterrupt:
        if primary:
            print("interrupted — saving final checkpoint")
    finally:
        if primary:
            trainer.save(ckpt_dir, "final")
            logger.save_summary()
            tb.close()

    elapsed = time.time() - t_start
    return {
        "global_step": trainer.global_step,
        "elapsed_sec": elapsed,
        "steps_per_sec": trainer.global_step / max(elapsed, 1e-9),
        "best_score": best_score,
        "trainer": trainer,
    }
