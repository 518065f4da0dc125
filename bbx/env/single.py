"""Single-environment, gym-style API (host-facing).

Mirrors `BlockBlastEnv` / `BlockBlastEnvFlat`
(`/root/reference/src/environment/block_blast_env.py:20-403`) on top of the
batched device engine (batch of 1).  Gymnasium is optional: the class
implements the Env protocol structurally and registers with gymnasium when
it is importable.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..engine import pieces as P
from ..engine.state import make_env_keys, reset as engine_reset
from ..engine.step import RewardConfig, observe, step
from ..engine.tables import NUM_ACTIONS
from ..render import render_game_state

BOARD_SIZE = 8
NUM_PIECES_PER_TURN = 3
ACTION_SPACE_SIZE = NUM_ACTIONS

try:  # inherit gymnasium.Env when available (required by gym.make)
    import gymnasium as _gym
    _EnvBase = _gym.Env
except ImportError:  # pragma: no cover - gymnasium is optional
    _EnvBase = object


class BlockBlastEnv(_EnvBase):
    """Gymnasium-compatible Block Blast environment (single instance).

    Observation: {'board' (8,8) f32, 'pieces' (3,8,8) f32,
                  'action_mask' (192,) int8}; action: Discrete(192),
    flat = piece*64 + row*8 + col (`block_blast_env.py:79-132`).
    """

    metadata = {"render_modes": ["human", "ansi"]}

    BOARD_SIZE = BOARD_SIZE
    NUM_PIECES_PER_TURN = NUM_PIECES_PER_TURN
    ACTION_SPACE_SIZE = ACTION_SPACE_SIZE

    def __init__(
        self,
        render_mode: Optional[str] = None,
        reward_config: Optional[Dict[str, float]] = None,
        seed: Optional[int] = None,
    ):
        self.render_mode = render_mode
        self.seed_value = seed if seed is not None else 0
        rc = RewardConfig()
        if reward_config:
            rc = rc.replace(**{k: v for k, v in reward_config.items()
                               if hasattr(rc, k)})
        self.reward_config = rc
        self._reset_fn = jax.jit(engine_reset)
        # auto_reset=False: terminal states persist, and stepping them takes
        # the invalid-action path exactly like the reference engine
        # (`engine.py:342`).
        self._step_fn = jax.jit(
            lambda s, a: step(s, a, self.reward_config, auto_reset=False)
        )
        self._observe_fn = jax.jit(observe)
        self._episode_seed = self.seed_value
        self.state = None
        self._build_spaces()
        self.reset(seed=seed)

    def _build_spaces(self):
        try:
            import gymnasium as gym
            from gymnasium import spaces
        except ImportError:  # structural-typing fallback
            self.observation_space = None
            self.action_space = None
            return
        self.observation_space = spaces.Dict({
            "board": spaces.Box(0.0, 1.0, (8, 8), np.float32),
            "pieces": spaces.Box(0.0, 1.0, (3, 8, 8), np.float32),
            "action_mask": spaces.Box(0, 1, (ACTION_SPACE_SIZE,), np.int8),
        })
        self.action_space = spaces.Discrete(ACTION_SPACE_SIZE)

    # -- helpers -----------------------------------------------------------
    def _action_to_move(self, action: int) -> Tuple[int, int, int]:
        piece = action // 64
        rem = action % 64
        return piece, rem // 8, rem % 8

    def _move_to_action(self, piece: int, row: int, col: int) -> int:
        return piece * 64 + row * 8 + col

    def _get_observation(self) -> Dict[str, np.ndarray]:
        obs = self._observe_fn(self.state)
        return {
            "board": np.asarray(obs["board"][0]),
            "pieces": np.asarray(obs["pieces"][0]),
            "action_mask": np.asarray(obs["action_mask"][0]).astype(np.int8),
        }

    def _get_info(self, step_info=None) -> Dict[str, Any]:
        s = self.state
        info = {
            "score": int(s.score[0]),
            "moves": int(s.moves[0]),
            "lines_cleared": int(s.lines_total[0]),
            "max_combo": int(s.max_streak[0]),
            "blocks_placed": int(s.blocks_total[0]),
            "board_fill": float(np.asarray(s.board[0]).sum() / 64.0),
            "holes": int(np.asarray(_holes_jit(s.board))[0]),
            "invalid_action": False,
        }
        if step_info is not None:
            info["invalid_action"] = bool(step_info["invalid_action"][0])
            info["last_move"] = {
                "blocks_placed": int(step_info["last_blocks_placed"][0]),
                "lines_cleared": int(step_info["last_lines_cleared"][0]),
                "combo_multiplier": int(step_info["last_combo_multiplier"][0]),
                "score_gained": int(step_info["last_score_gained"][0]),
            }
        return info

    # -- gym API -----------------------------------------------------------
    def reset(self, seed: Optional[int] = None, options=None):
        if seed is not None:
            self.seed_value = seed
            self._episode_seed = seed
        else:
            # Fresh piece stream per episode (the reference re-seeds with the
            # SAME seed on every reset, replaying identical episodes —
            # `block_blast_env.py:215`; we advance the stream by default and
            # keep replay available by passing an explicit seed).
            self._episode_seed += 1_000_003
        keys = make_env_keys(self._episode_seed, 1)
        self.state = self._reset_fn(keys)
        return self._get_observation(), self._get_info()

    def step(self, action: int):
        out = self._step_fn(self.state, jnp.asarray([int(action)]))
        self.state = out.state
        reward = float(out.reward[0])
        terminated = bool(out.done[0])
        obs = self._get_observation()
        info = self._get_info(out.info)
        if self.render_mode == "human":
            self.render()
        return obs, reward, terminated, False, info

    def render(self) -> Optional[str]:
        text = render_game_state(
            np.asarray(self.state.board[0]),
            [int(i) for i in np.asarray(self.state.piece_ids[0])],
            [bool(u) for u in np.asarray(self.state.used[0])],
            score=int(self.state.score[0]),
            moves=int(self.state.moves[0]),
            combo=int(self.state.streak[0]),
            game_over=bool(self.state.done[0]),
        )
        if self.render_mode == "ansi":
            return text
        if self.render_mode == "human":
            print("\033[2J\033[H" + text)
        return None

    def close(self) -> None:
        self.state = None

    def get_action_mask(self) -> np.ndarray:
        return self._get_observation()["action_mask"].astype(bool)

    def get_valid_actions(self):
        return np.where(self.get_action_mask())[0].tolist()

    def sample_valid_action(self) -> int:
        valid = self.get_valid_actions()
        if not valid:
            return 0
        return int(np.random.choice(valid))


def _holes(board):
    filled = board > 0
    padded = jnp.pad(filled, ((0, 0), (1, 1), (1, 1)), constant_values=True)
    h = ((~filled) & padded[:, :-2, 1:-1] & padded[:, 2:, 1:-1]
         & padded[:, 1:-1, :-2] & padded[:, 1:-1, 2:])
    return jnp.sum(h, axis=(1, 2)).astype(jnp.int32)


# Jitted once at module scope: `_get_info` runs on every host-facing
# `step()`/`reset()` (the GUI watch loop and play CLI hot path), so a fresh
# `jax.jit` per call would retrace every step.
_holes_jit = jax.jit(_holes)


class BlockBlastEnvFlat(BlockBlastEnv):
    """Flat-observation variant (`block_blast_env.py:326-389`): 64 board +
    3*37 piece one-hots + 3 used flags = 178 values."""

    OBS_SIZE = 64 + 3 * P.NUM_PIECE_TYPES + 3  # 178

    def _build_spaces(self):
        try:
            from gymnasium import spaces
        except ImportError:
            self.observation_space = None
            self.action_space = None
            return
        self.observation_space = spaces.Dict({
            "obs": spaces.Box(0.0, 1.0, (self.OBS_SIZE,), np.float32),
            "action_mask": spaces.Box(0, 1, (ACTION_SPACE_SIZE,), np.int8),
        })
        from gymnasium import spaces as sp
        self.action_space = sp.Discrete(ACTION_SPACE_SIZE)

    def _get_observation(self):
        base = super()._get_observation()
        ids = np.asarray(self.state.piece_ids[0])
        used = np.asarray(self.state.used[0])
        onehots = np.zeros((3, P.NUM_PIECE_TYPES), np.float32)
        for i in range(3):
            if not used[i]:
                onehots[i, ids[i]] = 1.0
        obs = np.concatenate([
            base["board"].reshape(-1),
            onehots.reshape(-1),
            used.astype(np.float32),
        ])
        return {"obs": obs, "action_mask": base["action_mask"]}


class NormalizedRewardWrapper:
    """Return-based reward normalization for a single env
    (`/root/reference/src/environment/wrappers.py:144-196`): running
    discounted return, Welford moment merge, reward / sqrt(var)."""

    def __init__(self, env, gamma: float = 0.99, epsilon: float = 1e-8):
        from .vector import RunningMeanStd

        self.env = env
        self.gamma = gamma
        self.epsilon = epsilon
        self.return_rms = RunningMeanStd()
        self.ret = 0.0

    def reset(self, *args, **kwargs):
        self.ret = 0.0
        return self.env.reset(*args, **kwargs)

    def step(self, action):
        obs, reward, terminated, truncated, info = self.env.step(action)
        self.ret = self.ret * self.gamma + float(reward)
        self.return_rms.update(np.asarray([self.ret]))
        norm = float(reward) / float(
            np.sqrt(self.return_rms.var + self.epsilon)
        )
        if terminated or truncated:
            self.ret = 0.0
        return obs, norm, terminated, truncated, info

    def __getattr__(self, item):
        return getattr(self.env, item)


class FrameStackWrapper:
    """Stack the last k board frames as `obs['board_stack']` (k, 8, 8)
    (`/root/reference/src/environment/wrappers.py:224-280`).

    Reset seeds ALL k frames with the first observation, as the reference
    does, so the early-episode stack never mixes in phantom empty boards.
    Deliberate deviation: the stack is exposed under the separate
    `board_stack` key (the raw `board` stays untouched) instead of
    replacing `board` — downstream code keeps a stable single-frame key
    and opts into the stacked view."""

    def __init__(self, env, num_frames: int = 4):
        self.env = env
        self.num_frames = num_frames
        self.frames = np.zeros((num_frames, 8, 8), np.float32)

    def _obs(self, obs):
        obs = dict(obs)
        obs["board_stack"] = self.frames.copy()
        return obs

    def reset(self, *args, **kwargs):
        obs, info = self.env.reset(*args, **kwargs)
        self.frames[:] = obs["board"]
        return self._obs(obs), info

    def step(self, action):
        obs, reward, terminated, truncated, info = self.env.step(action)
        self.frames = np.roll(self.frames, -1, axis=0)
        self.frames[-1] = obs["board"]
        return self._obs(obs), reward, terminated, truncated, info

    def __getattr__(self, item):
        return getattr(self.env, item)


def make_env(
    seed: Optional[int] = None,
    reward_config: Optional[Dict[str, float]] = None,
    normalize_reward: bool = False,
    frame_stack: int = 1,
):
    """Single-env factory with optional wrappers
    (`/root/reference/src/environment/wrappers.py:283-309`)."""
    env = BlockBlastEnv(seed=seed, reward_config=reward_config)
    if frame_stack > 1:
        env = FrameStackWrapper(env, num_frames=frame_stack)
    if normalize_reward:
        env = NormalizedRewardWrapper(env)
    return env


def register_gym_envs():
    """Register `BlockBlast-v0` / `BlockBlast-Flat-v0`
    (`block_blast_env.py:392-403`)."""
    try:
        import gymnasium as gym
    except ImportError:
        return False
    for env_id, entry in (
        ("BlockBlast-v0", "bbx.env.single:BlockBlastEnv"),
        ("BlockBlast-Flat-v0", "bbx.env.single:BlockBlastEnvFlat"),
    ):
        if env_id not in gym.registry:
            gym.register(id=env_id, entry_point=entry, max_episode_steps=10000)
    return True
