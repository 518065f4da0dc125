"""Headline benchmark: vectorized env throughput (env-steps/second).

Counterpart of the reference's vectorized-env benchmark
(`/root/reference/scripts/benchmark.py:101-144`) and its measured training
throughput of ~180 env-steps/s over 64 Python envs (report §4.1,
BASELINE.md).  Here the fleet of environments steps on-device under one
jitted scan with a random-valid-action policy.

Self-validating methodology, hardened round 5 after the round-4 driver
artifact was invalidated by a tunnel hiccup (`jax.block_until_ready`
returned before the computation ran, yielding windows ~1000x the real
rate):
  * every chunk is synchronized on a HOST-FETCHED SCALAR (the window's
    reward sum) — the bytes cannot exist on the host unless the device
    actually ran the program, unlike a device-array readiness flag;
  * windows implying < 50 us per fused 64-step chunk (physically
    impossible on any current chip) are discarded and re-timed in-process;
  * gross outliers (>2x / <0.5x the running median) are likewise dropped
    and replaced, up to a bounded retry budget;
  * several independently timed windows, median + spread reported, and a
    loud failure if the surviving windows still disagree by more than 20%.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""
import json
import os
import statistics
import sys
import time

# Persistent compilation cache: the step program is large and the TPU
# tunnel's remote compile is slow; cache compiled executables across runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

BASELINE_ENV_STEPS_PER_SEC = 180.0  # reference, consumer CPU (BASELINE.md)
MAX_REL_SPREAD = 0.20
# No chip runs a fused 64-step chunk over thousands of envs in under 50 us;
# a faster "measurement" means the tunnel lied about completion.
MIN_SEC_PER_CHUNK = 50e-6


def robust_rates(time_window, steps_per_window, num_windows=5, max_extra=5,
                 min_window_sec=0.0):
    """Collect per-window throughput rates, discarding broken measurements.

    `time_window()` runs one timing window and returns its wall-clock
    duration in seconds.  Windows shorter than `min_window_sec` are
    physically impossible (the experimental 'axon' TPU tunnel has been
    observed to report completion before execution, BENCH_r04) and are
    discarded outright; once three windows exist, any rate outside
    [0.5x, 2x] of the running median is dropped as a gross outlier.  Both
    kinds are re-timed from a budget of `max_extra` extra windows.

    Returns (rates, info) where info counts what was discarded — the caller
    decides whether the surviving spread is acceptable.
    """
    rates = []
    info = {"impossible_windows": 0, "outlier_windows": 0, "timed_windows": 0}
    budget = num_windows + max_extra
    while len(rates) < num_windows and info["timed_windows"] < budget:
        info["timed_windows"] += 1
        dt = time_window()
        if dt < min_window_sec:
            info["impossible_windows"] += 1
            continue
        rates.append(steps_per_window / dt)
        if len(rates) >= 3:
            med = statistics.median(rates)
            keep = [r for r in rates if 0.5 * med <= r <= 2.0 * med]
            info["outlier_windows"] += len(rates) - len(keep)
            rates = keep
    return rates, info


def main():
    import jax
    import jax.random as jr

    from bbx.engine.state import make_env_keys, reset
    from bbx.engine.step import observe, step
    from bbx.env.vector import sample_valid_actions_device

    # Fleet-size sweep on the one v5e chip (round 4, after the demand-sized
    # regen tail): 8192 -> 1.575M steps/s (3.0% spread), 16384 -> 1.687M
    # (1.2%), 32768 -> 1.495M (1.9%).  Round 3 peaked at 8192 (1.05M) and
    # fell past it because every tail retry round paid a fleet-width exact
    # pass; with straggler rounds served from a fixed 64-slot buffer the
    # curve is flat-topped at 16384.
    num_envs = int(os.environ.get("BBX_BENCH_ENVS", 16384))
    chunk = int(os.environ.get("BBX_BENCH_CHUNK", 64))
    windows = int(os.environ.get("BBX_BENCH_WINDOWS", 5))
    iters = int(os.environ.get("BBX_BENCH_ITERS", 2))  # chunks per window

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
    # Warmup: compile + move the fleet into a realistic mid-game state mix.
    key, k = jr.split(key)
    state, r = run_chunk(state, k)
    float(r)

    ctx = {"key": key, "state": state}

    def time_window():
        t0 = time.perf_counter()
        for _ in range(iters):
            ctx["key"], k = jr.split(ctx["key"])
            ctx["state"], r = run_chunk(ctx["state"], k)
            # Host-fetched scalar: forces real completion of the chunk (a
            # device-array readiness flag has been observed to lie on the
            # axon tunnel; literal bytes on the host cannot).
            float(r)
        return time.perf_counter() - t0

    rates, info = robust_rates(
        time_window, num_envs * chunk * iters, num_windows=windows,
        min_window_sec=iters * MIN_SEC_PER_CHUNK,
    )

    med = statistics.median(rates) if rates else 0.0
    spread = (max(rates) - min(rates)) / med if rates else float("inf")
    result = {
        "metric": "env_steps_per_sec",
        "value": round(med, 1),
        "unit": "steps/s",
        "vs_baseline": round(med / BASELINE_ENV_STEPS_PER_SEC, 1),
        "windows": [round(r, 1) for r in rates],
        "rel_spread": round(spread, 3),
        "num_envs": num_envs,
        "chunk": chunk,
        "device": jax.devices()[0].device_kind,
        **info,
    }
    if len(rates) < 3 or spread > MAX_REL_SPREAD:
        print(json.dumps({**result, "error":
                          f"only {len(rates)} plausible windows, spread "
                          f"{spread:.1%} (gate {MAX_REL_SPREAD:.0%}) — the "
                          f"axon TPU tunnel returned inconsistent timings "
                          f"even after {info['timed_windows']} attempts; "
                          f"rerun"}))
        sys.exit(1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
