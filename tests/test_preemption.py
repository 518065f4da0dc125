"""Preemption-signal checkpointing (SURVEY.md §5).

A training subprocess receives SIGTERM mid-run (the TPU-pod preemption
signal), saves `final` + `latest` at the next iteration boundary, and exits
cleanly.  Resuming from that checkpoint and continuing must reproduce an
uninterrupted run's trajectory metric-for-metric at the same global steps —
the preempted save is a full-state checkpoint, not a best-effort dump.
"""
import json
import os
import signal
import subprocess
import sys
import time

import pytest

from bbx.agent.trainer import PPOTrainer

CFG = {
    "training": {"num_envs": 8, "rollout_steps": 8, "batch_size": 32,
                 "total_timesteps": 64 * 40},
    "ppo": {"num_epochs": 2},
    "network": {"conv_channels": [8, 8], "fc_hidden": [32, 16],
                "compute_dtype": "float32"},
    "logging": {"log_interval": 1, "save_interval": 0, "eval_interval": 0},
}
SEED = 11
TOTAL_ITERS = 12  # uninterrupted arm length (batch 64 steps per iter)

_CHILD = """
import json, sys
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 8)
sys.path.insert(0, {repo!r})
from bbx.agent.trainer import train
cfg = json.loads(open({cfg_path!r}).read())
train(cfg, seed={seed})
print('CLEAN_EXIT', flush=True)
"""


def test_sigterm_checkpoint_then_exact_resume(tmp_path):
    cfg = json.loads(json.dumps(CFG))
    cfg["paths"] = {"checkpoint_dir": str(tmp_path / "ckpt"),
                    "log_dir": str(tmp_path / "logs")}
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    script = tmp_path / "child.py"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script.write_text(_CHILD.format(repo=repo, cfg_path=str(cfg_path),
                                    seed=SEED))

    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    proc = subprocess.Popen(
        [sys.executable, "-u", str(script)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
    )
    # Wait until a few iterations have logged, then preempt.
    seen = 0
    deadline = time.time() + 540
    lines = []
    while seen < 3 and time.time() < deadline:
        line = proc.stdout.readline()
        if not line:
            break
        lines.append(line)
        if line.startswith("step="):
            seen += 1
    assert seen >= 3, "child produced no progress:\n" + "".join(lines)[-4000:]
    proc.send_signal(signal.SIGTERM)
    rest, _ = proc.communicate(timeout=540)
    out = "".join(lines) + rest
    assert proc.returncode == 0, f"child did not exit cleanly:\n{out[-4000:]}"
    assert "SIGTERM received" in out, out[-4000:]
    assert "CLEAN_EXIT" in out, out[-4000:]
    for name in ("final", "latest"):
        assert os.path.isdir(os.path.join(cfg["paths"]["checkpoint_dir"],
                                          name)), f"{name} missing"

    # Uninterrupted arm: same seed, TOTAL_ITERS iterations.
    a = PPOTrainer(CFG, seed=SEED)
    series = {}
    for _ in range(TOTAL_ITERS):
        m = {k: float(v) for k, v in a.iterate().items()}
        series[a.global_step] = m

    # Preempted arm: resume from the SIGTERM checkpoint and continue.
    b = PPOTrainer(CFG, seed=SEED)
    b.load(os.path.join(cfg["paths"]["checkpoint_dir"], "final"))
    assert 0 < b.global_step < TOTAL_ITERS * 64, (
        f"preempted at step {b.global_step}; arm lengths don't overlap"
    )
    matched = 0
    while b.global_step < TOTAL_ITERS * 64:
        m = {k: float(v) for k, v in b.iterate().items()}
        ref = series[b.global_step]
        for k in ref:
            assert m[k] == pytest.approx(ref[k], rel=1e-6, abs=1e-7), (
                f"step {b.global_step} metric {k} diverged after preemption "
                f"resume: {m[k]} vs {ref[k]}"
            )
        matched += 1
    assert matched >= 2
