"""Round-4 final evaluation battery: greedy / stochastic / 1-ply lookahead.

Runs 100-episode evaluations of the given checkpoints on the attached chip
and writes one JSON per (checkpoint, mode) into docs/.

Usage: python scripts_dev/final_evals.py ckpt_name=path [ckpt2=path ...]
"""
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bbx.agent.trainer import _network_from_config  # noqa: E402
from bbx.cli.evaluate import (  # noqa: E402
    config_for_checkpoint,
    evaluate_policy,
    load_variables_from_checkpoint,
)

SEED = 777
EPISODES = 100

for arg in sys.argv[1:]:
    name, path = arg.split("=", 1)
    cfg = config_for_checkpoint(path)
    network = _network_from_config(cfg.get("network", {}))
    variables = load_variables_from_checkpoint(path)
    for mode, kw in (
        ("greedy", dict(deterministic=True)),
        ("stoch", dict(deterministic=False)),
        ("lookahead", dict(deterministic=True, lookahead=True)),
    ):
        r = evaluate_policy(
            network, variables, num_episodes=EPISODES, seed=SEED,
            chunk=64, max_steps=4096, **kw,
        )
        out = os.path.join("docs", f"{name}_eval_{mode}.json")
        with open(out, "w") as f:
            json.dump(r, f, indent=2)
        print(f"{name} {mode}: mean {r['score_mean']:.1f} "
              f"median {r['score_median']:.1f} max {r['score_max']:.0f} "
              f"len {r['length_mean']:.1f} completed {r['completed']} "
              f"-> {out}", flush=True)
