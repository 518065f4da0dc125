"""Throughput probes for the round-5 distillation run config (TPU).

Measures full train-iteration steps/s at candidate (num_envs, search_topk,
minibatch, epochs) combinations so the long run's horizon can be budgeted.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

from bbx.agent.trainer import PPOTrainer


def probe(num_envs, topk, mb, epochs=4, frac=0.75, iters=3):
    cfg = {
        "training": {"num_envs": num_envs, "rollout_steps": 128,
                     "batch_size": mb, "total_timesteps": 10**9},
        "ppo": {"num_epochs": epochs, "rollout_search_frac": frac,
                "final_rollout_search_frac": 0.0, "bc_coef": 0.5,
                "final_bc_coef": 0.0, "search_topk": topk},
    }
    t_build = time.perf_counter()
    tr = PPOTrainer(cfg, seed=0)
    m = tr.iterate()
    jax.block_until_ready(m)
    compile_s = time.perf_counter() - t_build
    t0 = time.perf_counter()
    for _ in range(iters):
        m = tr.iterate()
    jax.block_until_ready(m)
    dt = time.perf_counter() - t0
    sps = num_envs * 128 * iters / dt
    print(f"envs={num_envs:5d} topk={topk:3d} mb={mb:5d} ep={epochs}: "
          f"{sps:10,.0f} steps/s  (compile+1st {compile_s:.0f}s)", flush=True)
    return sps


if __name__ == "__main__":
    combos = sys.argv[1:] or ["1024,16,4096", "2048,16,8192", "1024,32,4096"]
    for c in combos:
        parts = [int(x) for x in c.split(",")]
        probe(*parts)
