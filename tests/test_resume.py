"""Exact checkpoint/resume: (train k, save, train k) == (train 2k).

The checkpoint carries params, batch stats, optimizer state, counters, the
host RNG key, and the full env fleet state (`PPOTrainer._payload`), so a
resumed run continues the exact trajectory of an uninterrupted one —
unlike the reference, which restores only weights+optimizer and parses the
step from the filename (`/root/reference/scripts/train.py:128-135`).
"""
import numpy as np
import pytest

from bbx.agent.trainer import PPOTrainer

CFG = {
    "training": {"num_envs": 8, "rollout_steps": 8, "batch_size": 32,
                 "total_timesteps": 512},
    "ppo": {"num_epochs": 2, "final_learning_rate": 1e-4,
            "final_entropy_coef": 0.0},
    "network": {"conv_channels": [8, 8], "fc_hidden": [32, 16],
                "compute_dtype": "float32"},
}


def _tree_equal(a, b, path=""):
    import jax
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_exact_resume(tmp_path):
    a = PPOTrainer(CFG, seed=5)
    for _ in range(2):
        a.iterate()
    path = a.save(str(tmp_path), "mid")
    cont = [{k: float(v) for k, v in a.iterate().items()} for _ in range(2)]

    b = PPOTrainer(CFG, seed=5)
    b.load(path)
    assert b.global_step == 2 * 64
    res = [{k: float(v) for k, v in b.iterate().items()} for _ in range(2)]

    for m_cont, m_res in zip(cont, res):
        for k in m_cont:
            assert m_cont[k] == pytest.approx(m_res[k], rel=1e-6), (
                f"metric {k} diverged after resume: "
                f"{m_cont[k]} vs {m_res[k]}"
            )
    _tree_equal(a.train_state.params, b.train_state.params)
    _tree_equal(a.train_state.opt_state, b.train_state.opt_state)
    import dataclasses
    for f in dataclasses.fields(a.env_state):
        if f.name == "rng":
            continue
        np.testing.assert_array_equal(
            np.asarray(getattr(a.env_state, f.name)),
            np.asarray(getattr(b.env_state, f.name)),
            err_msg=f"env_state.{f.name}",
        )


def test_sidecar_and_extra_roundtrip(tmp_path):
    a = PPOTrainer(CFG, seed=9)
    a.iterate()
    a.save(str(tmp_path), "x", extra={"best_score": 123.0,
                                      "tracker_scores": np.arange(3.0)})
    b = PPOTrainer(CFG, seed=9)
    b.load(str(tmp_path / "x"))
    assert b._loaded_extra["best_score"] == 123.0
    np.testing.assert_array_equal(b._loaded_extra["tracker_scores"],
                                  np.arange(3.0))
