"""Real multi-process `jax.distributed` tests (SURVEY.md §4, §2.8).

Forks 2 OS processes that form a process group through a local coordinator
(2 virtual CPU devices each, 4 global) and run PPOTrainer at a
production-ish shape (256 envs, the real conv stack) with per-host env
shards (`host_env_slice`).  Verifies:

  1. the global train-iteration metrics match a single-process run of the
     identical configuration — the parallelism changes where data lives,
     not what is computed;
  2. exact resume through the COLLECTIVE save/load path: k iterations,
     `save` (env-fleet allgather + primary-only write), a FRESH trainer
     restored with `load` (per-host re-sharding), k more iterations ==
     the uninterrupted continuation, metric for metric.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from mp_config import K_ITERS, MP_CFG

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


def _single_process_series():
    from bbx.agent.trainer import PPOTrainer

    trainer = PPOTrainer(MP_CFG, seed=3)
    return [{k: float(v) for k, v in trainer.iterate().items()}
            for _ in range(2 * K_ITERS)]


@pytest.fixture(scope="module")
def mp_result(tmp_path_factory):
    nproc = 2
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["BBX_MP_CKPT"] = str(tmp_path_factory.mktemp("mp_ckpt"))
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), str(nproc), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(nproc)
    ]
    outs = [p.communicate(timeout=1100)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"

    result_line = [ln for ln in outs[0].splitlines()
                   if ln.startswith("RESULT ")]
    assert result_line, f"no RESULT from worker 0:\n{outs[0][-4000:]}"
    return json.loads(result_line[0][len("RESULT "):])


def test_two_process_training_matches_single_process(mp_result):
    series_mp = mp_result["head"] + mp_result["cont"]
    series_sp = _single_process_series()
    for i, (mp, sp) in enumerate(zip(series_mp, series_sp)):
        for k in _EXACT:
            assert mp[k] == pytest.approx(sp[k], abs=1e-4), (
                f"iter{i}.{k}: multiprocess {mp[k]} vs single {sp[k]}"
            )
        for k in _CLOSE:
            np.testing.assert_allclose(
                mp[k], sp[k], rtol=2e-3, atol=2e-4,
                err_msg=f"iter{i}.{k}",
            )


def test_two_process_save_resume_exact(mp_result):
    """(k iters, collective save, fresh trainers, load, k iters) must equal
    the uninterrupted continuation on every metric — the multi-process
    checkpoint path restores params, optimizer, counters, RNG key, and the
    per-host env shards exactly."""
    for i, (cont, res) in enumerate(zip(mp_result["cont"], mp_result["res"])):
        assert set(cont) == set(res)
        for k in cont:
            assert cont[k] == pytest.approx(res[k], rel=1e-6, abs=1e-7), (
                f"iter{i}.{k} diverged after multi-process resume: "
                f"{cont[k]} vs {res[k]}"
            )
