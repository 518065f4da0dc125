"""Benchmark regen drain-tier sizing: rounds x per-round cost trade-off.

Measures the full random-rollout step throughput at a given fleet size for
several (k1, k2) drain-tier configurations by monkeypatching the tier sizes
in `bbx.engine.state.regen_pieces`.

Usage: python scripts_dev/tier_bench.py [num_envs]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import jax.random as jr


def bench(num_envs: int, chunk: int = 64, iters: int = 5) -> float:
    from bbx.engine.state import make_env_keys, reset
    from bbx.engine.step import step, observe
    from bbx.env.vector import sample_valid_actions_device

    keys = make_env_keys(0, num_envs)
    state = jax.jit(reset)(keys)

    @jax.jit
    def run_chunk(state, key):
        def body(state, key_t):
            actions = sample_valid_actions_device(
                key_t, observe(state)["action_mask"])
            out = step(state, actions, auto_reset=True)
            return out.state, out.reward.sum()
        ks = jr.split(key, chunk)
        state, rewards = jax.lax.scan(body, state, ks)
        return state, rewards.sum()

    key = jr.key(1)
    key, k = jr.split(key)
    state, _ = run_chunk(state, k)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(iters):
        key, k = jr.split(key)
        state, _ = run_chunk(state, k)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    return num_envs * chunk * iters / dt


def main():
    num_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    import bbx.engine.solvability as SV
    import bbx.engine.state as S

    for k1, k2 in ((128, 32), (512, 64), (1024, 128), (2048, 128)):
        S._TIER_K1, S._TIER_K2 = k1, k2
        # The exact-verdict compaction inside `solvable` must not re-split
        # the tier buffer, or wide tiers degenerate to SCREEN_LANES rounds.
        SV.SCREEN_LANES = max(512, k1)
        jax.clear_caches()
        sps = bench(num_envs)
        print(f"k1={k1:5d} k2={k2:4d} screen={SV.SCREEN_LANES:5d}  "
              f"{sps:,.0f} steps/s", flush=True)


if __name__ == "__main__":
    main()
