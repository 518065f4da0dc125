#!/usr/bin/env python
"""Self-contained minimal trainer (reference: `/root/reference/stable_train.py`).

A compact console-only loop with fixed hyperparameters and resumable
checkpoints (`checkpoints/quick_trained` / `checkpoints/extended_trained`),
for quick experiments outside the YAML config system.
"""
import argparse
import os
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2_000_000)
    ap.add_argument("--envs", type=int, default=32)
    ap.add_argument("--extended", action="store_true",
                    help="use the extended checkpoint name")
    args = ap.parse_args()

    from bbx.agent.trainer import PPOTrainer

    config = {
        "training": {"num_envs": args.envs, "rollout_steps": 64,
                     "batch_size": 512},
        "ppo": {"num_epochs": 4},
    }
    trainer = PPOTrainer(config, seed=0)
    name = "extended_trained" if args.extended else "quick_trained"
    ckpt = os.path.join("checkpoints", name)
    if os.path.isdir(ckpt):
        trainer.load(ckpt)
        print(f"resumed {name} at step {trainer.global_step:,}")

    per_iter = trainer.ppo.batch_size
    t0 = time.time()
    try:
        while trainer.global_step < args.steps:
            m = trainer.iterate()
            it = trainer.global_step // per_iter
            if it % 20 == 0:
                done = trainer.global_step
                rate = done / max(time.time() - t0, 1e-9)
                eta = (args.steps - done) / max(rate, 1e-9)
                print(f"step {done:>10,} | {rate:,.0f} sps | "
                      f"score {float(m['mean_score']):8.1f} | "
                      f"ent {float(m['entropy']):.3f} | eta {eta/60:.1f}m",
                      flush=True)
    except KeyboardInterrupt:
        pass
    finally:
        trainer.save("checkpoints", name)
        print(f"saved checkpoints/{name} at step {trainer.global_step:,}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
