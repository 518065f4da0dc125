"""Environment-layer tests (reference: tests/test_environment.py)."""
import numpy as np
import pytest

from bbx.env import (
    BlockBlastEnv,
    BlockBlastEnvFlat,
    VectorEnv,
    make_vec_env,
    register_gym_envs,
)


@pytest.fixture(scope="module")
def env():
    return BlockBlastEnv(seed=42)


def test_spaces(env):
    obs, info = env.reset(seed=42)
    assert obs["board"].shape == (8, 8) and obs["board"].dtype == np.float32
    assert obs["pieces"].shape == (3, 8, 8)
    assert obs["action_mask"].shape == (192,) and obs["action_mask"].dtype == np.int8
    if env.action_space is not None:
        assert env.action_space.n == 192


def test_seeded_reset_reproducible(env):
    obs1, _ = env.reset(seed=7)
    obs2, _ = env.reset(seed=7)
    np.testing.assert_array_equal(obs1["pieces"], obs2["pieces"])
    np.testing.assert_array_equal(obs1["board"], obs2["board"])


def test_unseeded_resets_differ(env):
    env.reset(seed=3)
    obs1, _ = env.reset()
    obs2, _ = env.reset()
    # Fresh piece streams per episode (bbx default; see single.py:reset).
    assert not np.array_equal(obs1["pieces"], obs2["pieces"])


def test_invalid_action_penalty(env):
    obs, _ = env.reset(seed=42)
    invalid = np.nonzero(obs["action_mask"] == 0)[0]
    obs2, reward, term, trunc, info = env.step(int(invalid[0]))
    assert reward == -10.0
    assert not term and not trunc
    assert info["invalid_action"]
    np.testing.assert_array_equal(obs2["board"], obs["board"])


def test_mask_matches_valid_actions(env):
    obs, _ = env.reset(seed=42)
    mask = env.get_action_mask()
    valid = env.get_valid_actions()
    assert mask.sum() == len(valid)
    assert all(mask[a] for a in valid)
    a = env.sample_valid_action()
    assert mask[a]


def test_episode_terminates_under_random_play(env):
    env.reset(seed=1)
    done = False
    for _ in range(5000):
        _, _, done, _, info = env.step(env.sample_valid_action())
        if done:
            break
    assert done
    assert info["score"] > 0


def test_action_codec(env):
    assert env._action_to_move(0) == (0, 0, 0)
    assert env._action_to_move(64) == (1, 0, 0)
    assert env._action_to_move(63) == (0, 7, 7)
    assert env._move_to_action(2, 7, 7) == 191


def test_flat_env_obs_size():
    env = BlockBlastEnvFlat(seed=0)
    obs, _ = env.reset(seed=0)
    # 64 board + 3*37 one-hots + 3 used = 178 (tests/test_environment.py:268).
    assert obs["obs"].shape == (178,)
    assert obs["action_mask"].shape == (192,)
    used_pieces = obs["obs"][64:64 + 111].reshape(3, 37)
    assert (used_pieces.sum(axis=1) == 1).all()


def test_ansi_render():
    env = BlockBlastEnv(render_mode="ansi", seed=0)
    env.reset(seed=0)
    text = env.render()
    assert "Score: 0" in text
    assert "Available pieces" in text


def test_gym_registration():
    ok = register_gym_envs()
    if not ok:
        pytest.skip("gymnasium unavailable")
    import gymnasium as gym
    genv = gym.make("BlockBlast-v0")
    obs, info = genv.reset(seed=5)
    assert obs["board"].shape == (8, 8)
    a = genv.unwrapped.sample_valid_action()
    obs, reward, term, trunc, info = genv.step(a)
    assert np.isfinite(reward)


class TestVectorEnv:
    def test_shapes(self):
        venv = VectorEnv(num_envs=6, seed=0)
        obs = venv.reset()
        assert obs["board"].shape == (6, 8, 8)
        assert obs["pieces"].shape == (6, 3, 8, 8)
        assert obs["action_mask"].shape == (6, 192)
        masks = venv.get_action_masks()
        assert masks.shape == (6, 192) and masks.any(axis=1).all()

    def test_step_and_autoreset(self):
        venv = VectorEnv(num_envs=6, seed=0)
        venv.reset()
        rng = np.random.default_rng(0)
        for _ in range(200):
            acts = venv.sample_valid_actions(rng)
            obs, rewards, dones, infos = venv.step(acts)
            assert rewards.shape == (6,)
            assert infos["score"].shape == (6,)
            # auto-reset: every lane still has valid moves
            assert venv.get_action_masks().any(axis=1).all()

    def test_wrappers(self):
        venv = make_vec_env(num_envs=4, seed=0, normalize_rewards=True,
                            frame_stack=3)
        obs = venv.reset()
        assert obs["board_stack"].shape == (4, 3, 8, 8)
        acts = venv.sample_valid_actions(np.random.default_rng(0))
        obs, rewards, dones, infos = venv.step(acts)
        assert np.isfinite(rewards).all()
        assert obs["board_stack"].shape == (4, 3, 8, 8)


def test_make_env_factory_with_wrappers():
    """Single-env factory + wrappers (`wrappers.py:283-309` analogue)."""
    from bbx.env import make_env

    env = make_env(seed=5, normalize_reward=True, frame_stack=3)
    obs, info = env.reset()
    assert obs["board_stack"].shape == (3, 8, 8)
    import numpy as _np

    # Reset seeds every frame with the first observation (reference
    # `wrappers.py:224-280` convention; round-5 advisor fix).
    for f in obs["board_stack"]:
        _np.testing.assert_array_equal(f, obs["board"])
    mask = obs["action_mask"]
    import numpy as np

    a = int(np.nonzero(mask)[0][0])
    obs2, r, term, trunc, info2 = env.step(a)
    assert obs2["board_stack"].shape == (3, 8, 8)
    assert np.isfinite(r)
    # normalized reward differs from the raw shaped reward in general
    assert isinstance(term, (bool, np.bool_)) or term in (0, 1)
