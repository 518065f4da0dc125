"""Worker process for the multi-process `jax.distributed` tests.

Launched by `tests/test_multiprocess.py` as N separate OS processes that
form a real process group via a local coordinator, each owning 2 virtual
CPU devices.  Runs PPOTrainer with per-host env shards at a production-ish
shape (256 envs, the real conv stack) and prints the global metrics of
every train iteration as JSON (process 0 only):

  * iters 1..k on a trainer, then a COLLECTIVE `save`;
  * iters k+1..2k continuing on the same trainer ("cont");
  * iters k+1..2k on a FRESH trainer restored with `load` ("res").

The test asserts cont == res (exact resume through the multi-process
collective save/load path) and that the full series matches a
single-process run of the identical config.

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
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/bbx-jax-cache-mp5")

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

# Establish the Gloo collective context while the two processes are still
# in lockstep: every cross-process rendezvous that creates a context has a
# hard 30s deadline, and the trainer-init / train-iteration compiles can
# skew the workers apart by minutes on a busy 2-core host.  The barrier
# runs before any heavy compile, when arrival skew is seconds.
from jax.experimental import multihost_utils  # noqa: E402

multihost_utils.sync_global_devices("bbx_mp_context_warmup")

from bbx.agent.trainer import PPOTrainer  # noqa: E402
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from mp_config import K_ITERS, MP_CFG  # noqa: E402

# Per-host env shard bookkeeping.
n_envs = MP_CFG["training"]["num_envs"]
start, count = host_env_slice(n_envs)
assert count == n_envs // nproc and start == pid * count
assert global_env_count(count) == n_envs

import jax.random as jr  # noqa: E402


def _precompile(tr):
    """AOT-compile the train iteration BEFORE any cross-process execution.

    Every new executable's first run creates a Gloo communicator with a
    hard 30s rendezvous deadline, and the big compile can skew the two
    workers apart by minutes; compiling ahead of time (purely local) and
    re-synchronizing at a barrier keeps every rendezvous within seconds.
    """
    lowered = tr._train_iter.lower(tr.train_state, tr.env_state, jr.key(0))
    tr._train_iter = lowered.compile()


trainer = PPOTrainer(MP_CFG, seed=3)
_precompile(trainer)
multihost_utils.sync_global_devices("bbx_mp_pre_train")

head = [{k: float(v) for k, v in trainer.iterate().items()}
        for _ in range(K_ITERS)]

ckpt_dir = os.environ.get("BBX_MP_CKPT", "/tmp")
name = f"mp_resume_{port}"
trainer.save(ckpt_dir, name)

cont = [{k: float(v) for k, v in trainer.iterate().items()}
        for _ in range(K_ITERS)]

# Fresh trainer, restored through the collective load path.
fresh = PPOTrainer(MP_CFG, seed=999)  # wrong seed on purpose: load must win
fresh.load(os.path.join(ckpt_dir, name))
_precompile(fresh)
multihost_utils.sync_global_devices("bbx_mp_pre_resume")
assert fresh.global_step == K_ITERS * MP_CFG["training"]["batch_size"]
res = [{k: float(v) for k, v in fresh.iterate().items()}
       for _ in range(K_ITERS)]

if pid == 0:
    print("RESULT " + json.dumps(
        {"head": head, "cont": cont, "res": res}), flush=True)
