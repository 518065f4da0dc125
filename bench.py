"""Headline benchmark: vectorized env throughput (env-steps/second).

Counterpart of the reference's vectorized-env benchmark
(`/root/reference/scripts/benchmark.py:101-144`) and its measured training
throughput of ~180 env-steps/s over 64 Python envs (report §4.1,
BASELINE.md).  Here the fleet of environments steps on-device under one
jitted scan with a random-valid-action policy.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import time

# Persistent compilation cache: the step program is large and the TPU
# tunnel's remote compile is slow; cache compiled executables across runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import jax.random as jr

BASELINE_ENV_STEPS_PER_SEC = 180.0  # reference, consumer CPU (BASELINE.md)


def main():
    from bbx.engine.state import make_env_keys, reset
    from bbx.engine.step import step
    from bbx.env.vector import sample_valid_actions_device

    num_envs = int(os.environ.get("BBX_BENCH_ENVS", 16384))
    chunk = int(os.environ.get("BBX_BENCH_CHUNK", 64))
    iters = int(os.environ.get("BBX_BENCH_ITERS", 10))

    from bbx.engine.step import observe

    keys = make_env_keys(0, num_envs)
    state = jax.jit(reset)(keys)

    @jax.jit
    def run_chunk(state, key):
        # Carry (state, mask): `step` already returns the next observation,
        # so the action mask is never recomputed outside the step.
        def body(carry, key_t):
            state, mask = carry
            actions = sample_valid_actions_device(key_t, mask)
            out = step(state, actions, auto_reset=True)
            return (out.state, out.obs["action_mask"]), out.reward.sum()
        keys = jr.split(key, chunk)
        carry0 = (state, observe(state)["action_mask"])
        (state, _), rewards = jax.lax.scan(body, carry0, keys)
        return state, rewards.sum()

    key = jr.key(1)
    # Warmup/compile.
    key, k = jr.split(key)
    state, _ = run_chunk(state, k)
    jax.block_until_ready(state)

    t0 = time.perf_counter()
    total = 0.0
    for _ in range(iters):
        key, k = jr.split(key)
        state, r = run_chunk(state, k)
        total += float(r)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0

    steps = num_envs * chunk * iters
    sps = steps / dt
    print(json.dumps({
        "metric": "env_steps_per_sec",
        "value": round(sps, 1),
        "unit": "steps/s",
        "vs_baseline": round(sps / BASELINE_ENV_STEPS_PER_SEC, 1),
    }))


if __name__ == "__main__":
    main()
