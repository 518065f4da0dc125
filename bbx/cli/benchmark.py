"""Benchmark suite (reference: `/root/reference/scripts/benchmark.py`).

Four benchmarks with the same CLI surface:
  * --engine   raw engine stepping (random valid actions, no network)
  * --env      single-env host-API stepping
  * --vec-env  vectorized on-device stepping (the headline number)
  * --network  policy forward latency/throughput across batch sizes
  * --train    full PPO train-iteration throughput
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np


def bench_engine(num_envs: int = 1024, steps: int = 512,
                 iters: int = 4) -> dict:
    """On-device engine stepping, random valid actions
    (`benchmark.py:17-55`'s moves/s, but batched)."""
    from ..engine.state import make_env_keys, reset
    from ..engine.step import observe, step
    from ..env.vector import sample_valid_actions_device

    state = jax.jit(reset)(make_env_keys(0, num_envs))

    @jax.jit
    def run(state, key):
        # Carry (state, mask): `step` already returns the next observation,
        # so the mask is never recomputed outside the step (same loop shape
        # as the headline bench.py — the gate must measure the same work).
        def body(carry, key_t):
            state, mask = carry
            a = sample_valid_actions_device(key_t, mask)
            out = step(state, a, auto_reset=True)
            return (out.state, out.obs["action_mask"]), None
        keys = jr.split(key, steps)
        (state, _), _ = jax.lax.scan(
            body, (state, observe(state)["action_mask"]), keys
        )
        return state

    key = jr.key(0)
    state = run(state, key)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for i in range(iters):
        key, k = jr.split(key)
        state = run(state, k)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    sps = num_envs * steps * iters / dt
    return {"name": "engine", "num_envs": num_envs,
            "env_steps_per_sec": sps}


def bench_single_env(steps: int = 2000) -> dict:
    """Host-API single env round-trip (`benchmark.py:58-98`)."""
    from ..env.single import BlockBlastEnv

    env = BlockBlastEnv(seed=0)
    env.reset(seed=0)
    rng = np.random.default_rng(0)
    # Warmup JIT.
    for _ in range(3):
        env.step(env.sample_valid_action())
    t0 = time.perf_counter()
    for _ in range(steps):
        mask = env.get_action_mask()
        valid = np.nonzero(mask)[0]
        a = int(rng.choice(valid)) if len(valid) else 0
        _, _, done, _, _ = env.step(a)
        if done:
            env.reset()
    dt = time.perf_counter() - t0
    return {"name": "single_env", "env_steps_per_sec": steps / dt}


def bench_vec_env(num_envs: int = 4096, steps: int = 64, iters: int = 10) -> dict:
    """Vectorized on-device stepping (`benchmark.py:101-144`)."""
    r = bench_engine(num_envs=num_envs, steps=steps, iters=iters)
    r["name"] = "vec_env"
    return r


def bench_network(batch_sizes=(1, 8, 32, 128, 512, 4096)) -> dict:
    """Policy forward latency/throughput (`benchmark.py:147-207`)."""
    from ..models import BlockBlastNetwork

    net = BlockBlastNetwork()
    variables = net.init(
        {"params": jr.key(0), "dropout": jr.key(0)},
        jnp.zeros((2, 8, 8)), jnp.zeros((2, 3, 8, 8)), train=False,
    )
    rows = []
    for bs in batch_sizes:
        board = jnp.ones((bs, 8, 8))
        pieces = jnp.ones((bs, 3, 8, 8))
        mask = jnp.ones((bs, 192))
        fwd = jax.jit(lambda b, p, m: net.apply(variables, b, p, m, train=False))
        out = fwd(board, pieces, mask)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        iters = 50
        for _ in range(iters):
            out = fwd(board, pieces, mask)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        rows.append({"batch": bs, "latency_ms": dt * 1e3,
                     "samples_per_sec": bs / dt})
    return {"name": "network", "rows": rows}


def bench_train(num_envs: int = 1024, rollout: int = 64, iters: int = 5) -> dict:
    """Full PPO iteration throughput (env+policy+update), the analogue of the
    reference's measured ~180 steps/s training FPS.

    The minibatch size defaults to `max(2048, num_envs * rollout // 4)`:
    a quarter of the rollout buffer (4 gradient steps per epoch, the
    reference's proportions at its 64-env config) but never below 2048,
    so the MXU stays saturated when the env fleet is small."""
    from ..agent.trainer import PPOTrainer

    config = {
        "training": {"num_envs": num_envs, "rollout_steps": rollout,
                     "batch_size": max(2048, num_envs * rollout // 4)},
        "ppo": {"num_epochs": 10},
    }
    trainer = PPOTrainer(config, seed=0)
    m = trainer.iterate()  # compile
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for _ in range(iters):
        m = trainer.iterate()
    jax.block_until_ready(m)
    dt = time.perf_counter() - t0
    sps = num_envs * rollout * iters / dt
    return {"name": "train", "num_envs": num_envs,
            "train_env_steps_per_sec": sps}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="bbx benchmarks")
    ap.add_argument("--engine", action="store_true")
    ap.add_argument("--env", action="store_true")
    ap.add_argument("--vec-env", action="store_true")
    ap.add_argument("--network", action="store_true")
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--num-envs", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=64,
                    help="steps per chunk for the vectorized benchmarks")
    args = ap.parse_args(argv)

    run_all = args.all or not any(
        (args.engine, args.env, args.vec_env, args.network, args.train)
    )
    results = []
    if args.engine or run_all:
        results.append(bench_engine())
    if args.env or run_all:
        results.append(bench_single_env())
    if args.vec_env or run_all:
        results.append(bench_vec_env(num_envs=args.num_envs, steps=args.steps))
    if args.network or run_all:
        results.append(bench_network())
    if args.train or run_all:
        results.append(bench_train())

    for r in results:
        if r["name"] == "network":
            print("network forward:")
            for row in r["rows"]:
                print(f"  batch {row['batch']:>5}: "
                      f"{row['latency_ms']:.3f} ms  "
                      f"{row['samples_per_sec']:.0f} samples/s")
        else:
            keys = [k for k in r if k != "name"]
            print(f"{r['name']}: " + "  ".join(
                f"{k}={r[k]:,.0f}" if isinstance(r[k], float) else f"{k}={r[k]}"
                for k in keys))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
