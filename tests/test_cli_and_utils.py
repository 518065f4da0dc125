"""CLI-surface, logging, config, renderer, and auxiliary-subsystem tests."""
import json
import os

import numpy as np
import pytest

from bbx.render import (
    render_board,
    render_board_with_placement,
    render_game_state,
    render_piece,
    render_pieces,
)
from bbx.utils.config import DEFAULT_CONFIG, load_config, save_config
from bbx.utils.logging import Logger, MetricsTracker, TensorBoardLogger


def test_renderer_board():
    g = np.zeros((8, 8), np.uint8)
    g[0, 0] = 1
    text = render_board(g)
    assert "█" in text and "·" in text
    assert text.count("\n") >= 8


def test_renderer_pieces_and_ghost():
    assert "□" in render_piece(0)
    text = render_pieces([0, 5, 17], [False, True, False])
    assert "(USED)" in text and "[0]" in text
    g = np.zeros((8, 8), np.uint8)
    ok = render_board_with_placement(g, 17, 0, 0)  # O piece at origin: valid
    assert "○" in ok
    g[0, 0] = 1
    bad = render_board_with_placement(g, 17, 0, 0)
    assert "✗" in bad


def test_render_game_state():
    text = render_game_state(np.zeros((8, 8), np.uint8), [0, 1, 2],
                             [False, False, True], score=42, moves=3)
    assert "Score: 42" in text and "USED" in text


def test_config_roundtrip(tmp_path):
    cfg = load_config(None)
    assert cfg["ppo"]["learning_rate"] == pytest.approx(3e-4)
    cfg["training"]["num_envs"] = 123
    path = str(tmp_path / "c.yaml")
    save_config(cfg, path)
    cfg2 = load_config(path)
    assert cfg2["training"]["num_envs"] == 123
    # Defaults deep-merge under user overrides.
    partial = str(tmp_path / "p.yaml")
    with open(partial, "w") as f:
        f.write("training:\n  num_envs: 7\n")
    cfg3 = load_config(partial)
    assert cfg3["training"]["num_envs"] == 7
    assert cfg3["ppo"]["gamma"] == 0.99


def test_jsonl_logger(tmp_path):
    lg = Logger(str(tmp_path), "t", console=False)
    lg.log({"a": 1.0, "b": 2}, step=10)
    lg.log({"a": 3.0}, step=20)
    assert lg.get_mean("a") == 2.0
    assert lg.get_recent("a", 1) == [3.0]
    with open(lg.log_file) as f:
        rows = [json.loads(line) for line in f]
    assert rows[0]["step"] == 10 and rows[0]["a"] == 1.0
    summary_path = lg.save_summary()
    with open(summary_path) as f:
        summary = json.load(f)
    assert summary["a"]["max"] == 3.0


def test_metrics_tracker():
    mt = MetricsTracker(window_size=3)
    for v in (1, 2, 3, 4):
        mt.add("x", v)
    assert mt.get_mean("x") == 3.0  # rolling window drops the 1
    assert mt.get_last("x") == 4.0
    assert mt.get_stats("x")["min"] == 2.0


def test_tb_logger_noop(tmp_path):
    tb = TensorBoardLogger(str(tmp_path), enabled=True)
    tb.log_scalar("x", 1.0, 1)  # must not raise, writer or not
    tb.close()


def test_device_utils():
    from bbx.utils.device import get_device, get_device_info, set_seed

    dev = get_device()
    info = get_device_info()
    assert info["num_devices"] >= 1
    key = set_seed(0)
    assert key is not None


def test_model_utils():
    import jax.numpy as jnp
    import jax.random as jr
    from bbx.models import BlockBlastNetwork
    from bbx.models.utils import EarlyStopping, get_model_summary

    es = EarlyStopping(patience=2, mode="max")
    assert not es(1.0) and not es(0.5) and es(0.4)
    es.reset()
    assert es.best is None

    net = BlockBlastNetwork(conv_channels=(4, 4), fc_hidden=(8,),
                            dtype=jnp.float32)
    v = net.init({"params": jr.key(0), "dropout": jr.key(0)},
                 jnp.zeros((1, 8, 8)), jnp.zeros((1, 3, 8, 8)), train=False)
    s = get_model_summary(v["params"])
    assert "total parameters" in s


def test_policy_agent_api():
    from bbx.agent import PolicyAgent

    agent = PolicyAgent()
    obs = {
        "board": np.zeros((8, 8), np.float32),
        "pieces": np.zeros((3, 8, 8), np.float32),
        "action_mask": np.ones(192, np.float32),
    }
    a, info = agent.select_action(obs, deterministic=True)
    assert 0 <= a < 192
    assert set(info) == {"log_prob", "entropy", "value"}
    batch = {
        "board": np.zeros((4, 8, 8), np.float32),
        "pieces": np.zeros((4, 3, 8, 8), np.float32),
        "action_mask": np.ones((4, 192), np.float32),
    }
    acts, logps, values = agent.select_actions(batch)
    assert acts.shape == (4,) and values.shape == (4,)
    assert agent.get_values(batch).shape == (4,)


def test_gui_module_imports_headless():
    """The GUI module must import (and its queue plumbing work) without a
    display; only tk.Tk() needs X."""
    import queue
    import gui.app as app

    q = queue.Queue()
    red = app.OutputRedirector(q, "log")
    red.write("hello\n")
    red.flush()
    assert q.get_nowait() == ("log", "hello\n")


def test_cli_entry_points_importable():
    from bbx.cli import benchmark, evaluate, play, train  # noqa: F401

    assert callable(train.main)
    assert callable(evaluate.main)
    assert callable(play.main)
    assert callable(benchmark.main)


def test_profiling_phase_timer():
    from bbx.utils.profiling import PhaseTimer

    pt = PhaseTimer()
    with pt.phase("a"):
        pass
    with pt.phase("a"):
        pass
    s = pt.summary()
    assert s["a"]["count"] == 2
    assert "phase timing" in pt.report()


def test_iteration_flops_counts_scan_trips():
    """MFU FLOP count must scale scanned bodies by their trip counts.

    XLA's cost_analysis() reports a lax.scan body once regardless of trip
    count, so the naive lowering of the whole train iteration undercounts
    by ~(rollout_steps + epochs*minibatches)x.  Pin that _iteration_flops
    exceeds the naive number by a wide margin (regression guard for the
    round-3 fix)."""
    from bbx.agent.trainer import PPOTrainer, _iteration_flops

    cfg = {
        "training": {"num_envs": 8, "rollout_steps": 16, "batch_size": 32},
        "ppo": {"num_epochs": 4},
        "network": {
            "conv_channels": [8, 16],
            "fc_hidden": [32],
            "use_batch_norm": True,
            "use_residual": True,
            "compute_dtype": "float32",
        },
    }
    tr = PPOTrainer(cfg, seed=0)
    analytic = _iteration_flops(tr)
    assert analytic is not None and analytic > 0

    import jax

    cost = tr._train_iter.lower(
        tr.train_state, tr.env_state, jax.random.key(0)
    ).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    naive = float(cost.get("flops", 0.0))
    # rollout scans 16 forwards, update scans 4 epochs x 4 minibatches of
    # fwd+bwd; the analytic count must be several times the body-once one.
    assert analytic > 3.0 * naive
