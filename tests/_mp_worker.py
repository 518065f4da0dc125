"""Worker process for the multi-process `jax.distributed` test.

Launched by `tests/test_multiprocess.py` as N separate OS processes that
form a real process group via a local coordinator, each owning 2 virtual
CPU devices.  Runs PPOTrainer with per-host env shards and prints the
global metrics of a train iteration as JSON (process 0 only).

Usage: python _mp_worker.py <process_id> <num_processes> <port>
"""
import json
import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/bbx-jax-cache-mp")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bbx.parallel.distributed import (  # noqa: E402
    global_env_count,
    host_env_slice,
    initialize_multihost,
    is_primary,
)

assert initialize_multihost(f"localhost:{port}", nproc, pid)
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 2 * nproc, jax.devices()
assert is_primary() == (pid == 0)

# Per-host env shard bookkeeping.
start, count = host_env_slice(16)
assert count == 16 // nproc and start == pid * count
assert global_env_count(count) == 16

from bbx.agent.trainer import PPOTrainer  # noqa: E402

CFG = {
    "training": {"num_envs": 16, "rollout_steps": 8, "batch_size": 32,
                 "total_timesteps": 256},
    "ppo": {"num_epochs": 2},
    "network": {"conv_channels": [8, 8], "fc_hidden": [32, 16],
                "compute_dtype": "float32"},
}

trainer = PPOTrainer(CFG, seed=3)
m1 = {k: float(v) for k, v in trainer.iterate().items()}

# Multi-process checkpoint round-trip: save is a collective (the env fleet
# is sharded across hosts and must be allgathered), load re-shards the
# restored fleet per host.  iter2 after save+load must equal iter2 without.
import tempfile  # noqa: E402

ckpt_dir = os.environ.get("BBX_MP_CKPT", tempfile.gettempdir())
trainer.save(ckpt_dir, f"mp_roundtrip_{port}")
trainer.load(os.path.join(ckpt_dir, f"mp_roundtrip_{port}"))

m2 = {k: float(v) for k, v in trainer.iterate().items()}

if pid == 0:
    print("RESULT " + json.dumps({"iter1": m1, "iter2": m2}), flush=True)
