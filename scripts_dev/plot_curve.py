"""Plot the parity-run learning curve from a training JSONL log.

Usage: python scripts_dev/plot_curve.py logs/parity/ppo_*.jsonl out.png
"""
import glob
import json
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt


def main():
    pattern = sys.argv[1] if len(sys.argv) > 1 else "logs/parity/ppo_*.jsonl"
    out = sys.argv[2] if len(sys.argv) > 2 else "docs/parity_curve.png"
    path = sorted(glob.glob(pattern))[-1]
    rows = [json.loads(line) for line in open(path)]
    steps = [r["step"] / 1e6 for r in rows]

    fig, axes = plt.subplots(1, 3, figsize=(13, 3.6))
    panels = (
        ("avg_score", "average episode score", axes[0]),
        ("entropy", "policy entropy", axes[1]),
        ("avg_length", "episode length (moves)", axes[2]),
    )
    for key, label, ax in panels:
        ax.plot(steps, [r[key] for r in rows], lw=1.2, color="#2563eb")
        ax.set_xlabel("env steps (millions)")
        ax.set_title(label, fontsize=10)
        ax.grid(alpha=0.3)
    ref = {
        "avg_score": [(0, 439.0), (17.4, 4021.0)],
        "entropy": [(0, 1.58), (17.4, 0.07)],
        "avg_length": [(0, 14.5), (17.4, 41.9)],
    }
    for key, label, ax in panels:
        xs, ys = zip(*ref[key])
        ax.scatter(xs, ys, marker="x", color="#dc2626", zorder=3,
                   label="reference (report Table 2)")
        ax.legend(fontsize=8)
    fig.suptitle(
        "bbx parity run: reference recipe (64 envs, 17.4M steps) on one TPU chip",
        fontsize=11,
    )
    fig.tight_layout()
    import os

    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    fig.savefig(out, dpi=140)
    print(f"wrote {out} ({len(rows)} log rows, final score "
          f"{rows[-1]['avg_score']:.1f})")


if __name__ == "__main__":
    main()
