"""Real multi-process `jax.distributed` test (SURVEY.md §4).

Forks 2 OS processes that form a process group through a local coordinator
(2 virtual CPU devices each, 4 global), run PPOTrainer with per-host env
shards (`host_env_slice`), and verify the global train-iteration metrics
match a single-process run of the identical configuration — the
parallelism changes where data lives, not what is computed.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "_mp_worker.py")

# Keys that must match the single-process run exactly (integer-exact game
# outcomes) or within float tolerance (reduction-order-sensitive losses).
_EXACT = ("episodes", "mean_score", "max_score", "mean_length")
_CLOSE = ("policy_loss", "value_loss", "entropy", "total_loss",
          "approx_kl", "clip_fraction", "mean_return", "invalid_frac")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_reference():
    from bbx.agent.trainer import PPOTrainer

    cfg = {
        "training": {"num_envs": 16, "rollout_steps": 8, "batch_size": 32,
                     "total_timesteps": 256},
        "ppo": {"num_epochs": 2},
        "network": {"conv_channels": [8, 8], "fc_hidden": [32, 16],
                    "compute_dtype": "float32"},
    }
    trainer = PPOTrainer(cfg, seed=3)
    m1 = {k: float(v) for k, v in trainer.iterate().items()}
    m2 = {k: float(v) for k, v in trainer.iterate().items()}
    return {"iter1": m1, "iter2": m2}


def test_two_process_training_matches_single_process():
    nproc = 2
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), str(nproc), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(nproc)
    ]
    outs = [p.communicate(timeout=560)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"

    result_line = [ln for ln in outs[0].splitlines()
                   if ln.startswith("RESULT ")]
    assert result_line, f"no RESULT from worker 0:\n{outs[0][-4000:]}"
    mp = json.loads(result_line[0][len("RESULT "):])

    ref = _single_process_reference()
    for it in ("iter1", "iter2"):
        for k in _EXACT:
            assert mp[it][k] == pytest.approx(ref[it][k], abs=1e-4), (
                f"{it}.{k}: multiprocess {mp[it][k]} vs single {ref[it][k]}"
            )
        for k in _CLOSE:
            np.testing.assert_allclose(
                mp[it][k], ref[it][k], rtol=2e-3, atol=2e-4,
                err_msg=f"{it}.{k}",
            )
