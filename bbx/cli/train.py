"""Training CLI (reference: `run_train.py` + `scripts/train.py`)."""
from __future__ import annotations

import argparse


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Train the Block Blast PPO agent")
    ap.add_argument("--config", default="config/default.yaml")
    ap.add_argument("--resume", default=None, help="checkpoint to resume from")
    ap.add_argument("--seed", type=int, default=None,
                    help="overrides training.seed from the config (default 42)")
    ap.add_argument("--total-timesteps", type=int, default=None)
    ap.add_argument("--profile", action="store_true",
                    help="per-phase timing, MFU estimate, one trace dump")
    args = ap.parse_args(argv)

    import os

    import jax

    # Persistent compile cache: repeated launches at the same shapes skip
    # the minutes-long first compile (bench.py does the same).
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR",
                       os.path.join(os.getcwd(), ".jax_cache")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    from ..agent.trainer import train
    from ..parallel.distributed import initialize_multihost
    from ..utils.config import load_config

    initialize_multihost()
    config = load_config(args.config)
    stats = train(
        config,
        resume_path=args.resume,
        seed=args.seed,
        total_timesteps=args.total_timesteps,
        profile=args.profile,
    )
    # With in-run eval enabled, `best` is gated on eval score and the
    # rollout-mean best stays -inf; report whichever gate was active.
    if stats["best_eval"] > float("-inf"):
        best = f"best eval score {stats['best_eval']:.1f}"
    else:
        best = f"best avg score {stats['best_score']:.1f}"
    print(f"done: {stats['global_step']:,} steps in "
          f"{stats['elapsed_sec']:.1f}s "
          f"({stats['steps_per_sec']:.0f} steps/s), {best}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
