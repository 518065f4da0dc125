"""On-device vectorized environment.

The user-facing counterpart of the reference's `VectorizedBlockBlastEnv`
(`/root/reference/src/environment/wrappers.py:14-141`) — except the reference
"vectorization" is a sequential Python loop over env objects, while this is a
single jitted program stepping N boards in lockstep on the accelerator.

The stateful class is a thin convenience shell for benchmarks/eval scripts;
training code uses the pure functions (`bbx.engine.reset/step`) directly
inside its own scan.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.state import EnvState, make_env_keys, reset
from ..engine.step import RewardConfig, StepOutput, observe, step
from ..engine.tables import NUM_ACTIONS


class VectorEnv:
    """Batched Block Blast with auto-reset, matching the reference wrapper's
    observable API (`wrappers.py:53-136`)."""

    def __init__(
        self,
        num_envs: int = 64,
        seed: int = 42,
        reward_config: Optional[RewardConfig] = None,
        auto_reset: bool = True,
        device=None,
    ):
        self.num_envs = num_envs
        self.seed = seed
        self.reward_config = reward_config or RewardConfig()
        self.auto_reset = auto_reset
        self._device = device
        self._reset_fn = jax.jit(reset)
        self._step_fn = jax.jit(
            lambda s, a: step(s, a, self.reward_config, auto_reset=auto_reset)
        )
        self._observe_fn = jax.jit(observe)
        self.state: Optional[EnvState] = None

    def reset(self, seed: Optional[int] = None):
        """Reset all environments; returns the batched observation dict."""
        if seed is not None:
            self.seed = seed
        keys = make_env_keys(self.seed, self.num_envs)
        self.state = self._reset_fn(keys)
        return jax.tree.map(np.asarray, self._observe_fn(self.state))

    def step(self, actions):
        """Step every env; returns (obs, rewards, dones, infos) as NumPy."""
        out: StepOutput = self._step_fn(self.state, jnp.asarray(actions))
        self.state = out.state
        obs, reward, done, info = jax.tree.map(
            np.asarray, (out.obs, out.reward, out.done, out.info)
        )
        return obs, reward, done, info

    def step_device(self, actions) -> StepOutput:
        """Device-native step (no host transfer); for benchmarks/training."""
        out = self._step_fn(self.state, actions)
        self.state = out.state
        return out

    def get_action_masks(self) -> np.ndarray:
        """[N, 192] bool (`wrappers.py:128-131`)."""
        return np.asarray(self._observe_fn(self.state)["action_mask"])

    def sample_valid_actions(self, rng: Optional[np.random.Generator] = None):
        """Uniform random valid action per env (`wrappers.py:133-136`)."""
        rng = rng or np.random.default_rng()
        masks = self.get_action_masks()
        out = np.zeros(self.num_envs, dtype=np.int64)
        for i in range(self.num_envs):
            valid = np.nonzero(masks[i])[0]
            out[i] = rng.choice(valid) if len(valid) else 0
        return out

    def close(self):
        self.state = None


def sample_valid_actions_device(key, mask: jnp.ndarray) -> jnp.ndarray:
    """Uniform-over-valid action sampling fully on device ([N,192] -> [N])."""
    logits = jnp.where(mask > 0, 0.0, -1e9)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


class RunningMeanStd:
    """Welford-merge running moments (`wrappers.py:198-221`)."""

    def __init__(self, epsilon: float = 1e-4, shape=()):
        self.mean = np.zeros(shape, np.float64)
        self.var = np.ones(shape, np.float64)
        self.count = epsilon

    def update(self, x: np.ndarray) -> None:
        bm, bv, bc = np.mean(x, axis=0), np.var(x, axis=0), x.shape[0]
        delta = bm - self.mean
        tot = self.count + bc
        self.mean = self.mean + delta * bc / tot
        m_a = self.var * self.count
        m_b = bv * bc
        m2 = m_a + m_b + delta**2 * self.count * bc / tot
        self.var = m2 / tot
        self.count = tot


class NormalizedRewardVecEnv:
    """Return-based reward normalization over a VectorEnv
    (`wrappers.py:144-196`, per-env discounted return / running std)."""

    def __init__(self, env: VectorEnv, gamma: float = 0.99, epsilon: float = 1e-8):
        self.env = env
        self.gamma = gamma
        self.epsilon = epsilon
        self.return_rms = RunningMeanStd()
        self.returns = np.zeros(env.num_envs, np.float64)

    def reset(self, seed=None):
        self.returns[:] = 0.0
        return self.env.reset(seed)

    def step(self, actions):
        obs, rewards, dones, infos = self.env.step(actions)
        self.returns = self.returns * self.gamma + rewards
        self.return_rms.update(self.returns)
        norm = rewards / np.sqrt(self.return_rms.var + self.epsilon)
        self.returns[dones] = 0.0
        return obs, norm.astype(np.float32), dones, infos

    def __getattr__(self, item):
        return getattr(self.env, item)


class FrameStackVecEnv:
    """Stack the last k board frames as channels (`wrappers.py:224-280`).

    Reset (and the auto-reset of finished lanes) seeds ALL k frames with
    the first observation, as the reference does; the stack lives under
    the separate `board_stack` key (see FrameStackWrapper's note)."""

    def __init__(self, env: VectorEnv, num_frames: int = 4):
        self.env = env
        self.num_frames = num_frames
        self.frames = np.zeros((env.num_envs, num_frames, 8, 8), np.float32)

    def _obs(self, obs):
        obs = dict(obs)
        obs["board_stack"] = self.frames.copy()
        return obs

    def reset(self, seed=None):
        obs = self.env.reset(seed)
        self.frames[:] = obs["board"][:, None]
        return self._obs(obs)

    def step(self, actions):
        obs, rewards, dones, infos = self.env.step(actions)
        self.frames = np.roll(self.frames, -1, axis=1)
        self.frames[:, -1] = obs["board"]
        self.frames[dones] = obs["board"][dones, None]
        return self._obs(obs), rewards, dones, infos

    def __getattr__(self, item):
        return getattr(self.env, item)


def make_vec_env(num_envs: int = 64, seed: int = 42, normalize_rewards=False,
                 frame_stack: int = 0, **kwargs):
    """Factory mirroring `make_vec_env` (`wrappers.py:311-332`)."""
    env = VectorEnv(num_envs=num_envs, seed=seed, **kwargs)
    if normalize_rewards:
        env = NormalizedRewardVecEnv(env)
    if frame_stack:
        env = FrameStackVecEnv(env, frame_stack)
    return env
