"""Policy evaluation (reference: `/root/reference/scripts/evaluate.py`).

Instead of the reference's sequential per-episode loop, all N episodes run
as parallel env lanes on-device (auto_reset=False); the host polls until
every lane terminates.  Reports the same statistics: mean/std/min/max/median
score, lengths, lines, combos, and percentiles.
"""
from __future__ import annotations

import argparse
import json
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

from ..engine.state import make_env_keys, reset
from ..engine.step import RewardConfig, observe, step
from ..models import distributions as D


# Jitted lane-stepping runners, keyed by everything that changes the traced
# program.  This is THE eval loop: both the CLI and PPOTrainer.evaluate call
# it (round-5 unification — two divergent copies is how greedy/stochastic
# mix-ups happen), and in-training evals must not retrace every call.
_RUNNER_CACHE: Dict[Any, Any] = {}


def _eval_runner(network, reward_config, deterministic, lookahead, chunk,
                 gamma, topk):
    cache_key = (network, reward_config, deterministic, lookahead, chunk,
                 gamma, topk)
    if cache_key in _RUNNER_CACHE:
        return _RUNNER_CACHE[cache_key]

    if lookahead:
        from ..agent.lookahead import lookahead_actions

    @jax.jit
    def run_chunk(variables, state, key):
        def body(state, key_t):
            if lookahead:
                action = lookahead_actions(
                    network, variables, state, key_t,
                    reward_config=reward_config, gamma=gamma, topk=topk,
                )
            else:
                obs = observe(state)
                logits, _ = network.apply(
                    variables, obs["board"], obs["pieces"],
                    obs["action_mask"], train=False,
                )
                action = (D.mode(logits) if deterministic
                          else D.sample(key_t, logits))
            out = step(state, action, reward_config, auto_reset=False)
            return out.state, None

        keys = jr.split(key, chunk)
        state, _ = jax.lax.scan(body, state, keys)
        return state

    _RUNNER_CACHE[cache_key] = run_chunk
    return run_chunk


def evaluate_policy(
    network,
    variables,
    num_episodes: int = 100,
    deterministic: bool = True,
    seed: int = 42,
    max_steps: int = 10_000,
    chunk: int = 64,
    progress: bool = False,
    lookahead: bool = False,
    gamma: float = 0.99,
    reward_config: RewardConfig | None = None,
    topk: int = 0,
) -> Dict[str, Any]:
    """Run `num_episodes` full episodes in parallel lanes; return statistics
    (`evaluate.py:23-117`).

    `lookahead=True` switches from the raw policy to policy+1-ply value
    search (`bbx.agent.lookahead`) — a beyond-the-reference eval mode whose
    results must be labeled as such, never mixed with raw-policy numbers.
    (`topk` bounds its candidate set; 0 simulates all 192 actions.)
    """
    rc = reward_config or RewardConfig()
    run_chunk = _eval_runner(network, rc, deterministic, lookahead, chunk,
                             gamma, topk)

    state = jax.jit(reset)(make_env_keys(seed, num_episodes))
    key = jr.key(seed + 1)
    steps_done = 0
    while steps_done < max_steps:
        key, k = jr.split(key)
        state = run_chunk(variables, state, k)
        steps_done += chunk
        done = np.asarray(state.done)
        if progress:
            print(f"  eval: {done.sum()}/{num_episodes} episodes finished "
                  f"after {steps_done} steps", flush=True)
        if done.all():
            break

    # Aggregate over COMPLETED episodes only: a lane still alive at
    # max_steps holds a lower bound on its final score, which would bias
    # the mean down exactly when the policy survives long.  Truncated lanes
    # are counted separately instead of silently mixed in.
    done = np.asarray(state.done)
    sel = done if done.any() else np.ones_like(done)
    scores = np.asarray(state.score, np.float64)[sel]
    lengths = np.asarray(state.moves, np.float64)[sel]
    lines = np.asarray(state.lines_total, np.float64)[sel]
    combos = np.asarray(state.max_streak, np.float64)[sel]
    pct = {f"p{p}": float(np.percentile(scores, p))
           for p in (10, 25, 50, 75, 90, 95, 99)}
    return {
        "num_episodes": num_episodes,
        "deterministic": deterministic,
        "lookahead": lookahead,
        "completed": int(done.sum()),
        "truncated": int((~done).sum()),
        "score_mean": float(scores.mean()),
        "score_std": float(scores.std()),
        "score_min": float(scores.min()),
        "score_max": float(scores.max()),
        "score_median": float(np.median(scores)),
        "length_mean": float(lengths.mean()),
        "length_std": float(lengths.std()),
        "lines_mean": float(lines.mean()),
        "max_combo_mean": float(combos.mean()),
        "percentiles": pct,
    }


def print_results(r: Dict[str, Any]) -> None:
    print("=" * 50)
    print(f"Evaluation over {r['num_episodes']} episodes "
          f"({'deterministic' if r['deterministic'] else 'stochastic'})")
    print("-" * 50)
    print(f"Score:  mean {r['score_mean']:.1f} ± {r['score_std']:.1f}  "
          f"min {r['score_min']:.0f}  median {r['score_median']:.0f}  "
          f"max {r['score_max']:.0f}")
    print(f"Length: mean {r['length_mean']:.1f} ± {r['length_std']:.1f}")
    print(f"Lines:  mean {r['lines_mean']:.2f}   "
          f"Max combo: mean {r['max_combo_mean']:.2f}")
    print("Percentiles: " + "  ".join(
        f"{k}={v:.0f}" for k, v in r["percentiles"].items()))
    print("=" * 50)


def load_variables_from_checkpoint(path: str):
    from ..utils.checkpoints import load_checkpoint

    payload = load_checkpoint(path)
    variables = {"params": payload["params"]}
    if payload.get("batch_stats"):
        variables["batch_stats"] = payload["batch_stats"]
    return variables


def config_for_checkpoint(checkpoint: str, config_path: Optional[str] = None):
    """Resolve the config to rebuild a checkpoint's network: an explicit
    YAML wins, else the `<checkpoint>.config.json` sidecar written at save
    time, else defaults."""
    import os

    from ..utils.config import load_config

    if config_path:
        return load_config(config_path)
    sidecar = os.path.abspath(checkpoint) + ".config.json"
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            cfg = load_config(None)
            cfg.update(json.load(f))
            return cfg
    return load_config(None)


def main(argv=None) -> int:
    from ..agent.trainer import _network_from_config

    ap = argparse.ArgumentParser(description="Evaluate a trained agent")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--config", default=None)
    ap.add_argument("--episodes", type=int, default=100)
    ap.add_argument("--deterministic", action="store_true")
    ap.add_argument("--lookahead", action="store_true",
                    help="policy+1-ply value search (beyond-the-reference "
                         "mode; report as search-assisted, not raw policy)")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--output", default=None, help="JSON results path")
    ap.add_argument("--render", action="store_true",
                    help="after the stats, replay a few episodes with ASCII "
                         "rendering (reference `scripts/evaluate.py:37`; the "
                         "parallel eval lanes themselves can't render)")
    ap.add_argument("--render-games", type=int, default=2,
                    help="episodes to render with --render")
    args = ap.parse_args(argv)

    cfg = config_for_checkpoint(args.checkpoint, args.config)
    network = _network_from_config(cfg.get("network", {}))
    variables = load_variables_from_checkpoint(args.checkpoint)
    results = evaluate_policy(
        network, variables, num_episodes=args.episodes,
        deterministic=args.deterministic, seed=args.seed, progress=True,
        lookahead=args.lookahead,
    )
    print_results(results)
    if args.output:
        with open(args.output, "w") as f:
            json.dump(results, f, indent=2)
        print(f"results written to {args.output}")
    if args.render:
        from .play import watch

        watch(args.checkpoint, args.config, games=args.render_games,
              delay=0.0, deterministic=args.deterministic, seed=args.seed)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
