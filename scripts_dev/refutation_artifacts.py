"""Build the round-4 refutation artifacts: per-seed summaries + overlay plot.

Inputs: the reference-code rerun JSONL (docs/refrun/), bbx's 64-env replay
JSONLs (docs/parity_17M_bf16.jsonl and logs/refrecipe/*.jsonl).
Outputs: docs/refrecipe_seed*.summary.json and docs/refutation_overlay.png.
"""
import glob
import json
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def rows(path):
    out = []
    for line in open(path):
        try:
            r = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "avg_score" in r:
            out.append(r)
    return out


# ---- per-seed summaries ------------------------------------------------
seed_logs = {}  # seed -> jsonl path (mtime order matches launch order)
launch = {0: 7, 1: 123, 2: 2024}
paths = sorted(glob.glob("logs/refrecipe/ppo_*.jsonl"))
for i, p in enumerate(paths):
    if i in launch:
        seed_logs[launch[i]] = p

summaries = {}
for seed, p in seed_logs.items():
    rs = rows(p)
    if not rs:
        continue
    last = rs[-1]
    summary = {
        "seed": seed,
        "recipe": "reference published recipe (64 envs, 17.4M steps, "
                  "constant lr 3e-4 / entropy 0.01, 10 epochs)",
        "final_step": last["step"],
        "rolling_mean_score_at_end": last["avg_score"],
        "rolling_mean_length_at_end": last["avg_length"],
        "max_rolling_mean_score": max(r["avg_score"] for r in rs),
        "log": p,
    }
    out = f"docs/refrecipe_seed{seed}.summary.json"
    with open(out, "w") as f:
        json.dump(summary, f, indent=2)
    summaries[seed] = summary
    print(out, "->", summary["rolling_mean_score_at_end"])

# ---- overlay plot ------------------------------------------------------
REF = "#3b6fb6"     # reference code rerun (blue)
BBX = "#e07b39"     # bbx replays of the same recipe (orange)
INK = "#3a3a3a"
MUT = "#8a8a8a"

fig, ax = plt.subplots(figsize=(8.6, 5.2), dpi=150)
fig.patch.set_facecolor("white")
ax.set_facecolor("white")

ref = rows("docs/refrun/ref_code_rerun.jsonl")
ax.plot([r["step"] for r in ref], [r["avg_score"] for r in ref],
        color=REF, lw=2, label="reference code, rerun (CPU, this host)")
for extra in sorted(glob.glob("docs/refrun/ref_code_rerun2*.jsonl")):
    rs = rows(extra)
    ax.plot([r["step"] for r in rs], [r["avg_score"] for r in rs],
            color=REF, lw=1.4, alpha=0.55)

b42 = rows("docs/parity_17M_bf16.jsonl")
ax.plot([r["step"] for r in b42], [r["avg_score"] for r in b42],
        color=BBX, lw=2, label="bbx, same recipe (seeds 42/7/123/2024)")
for seed, p in seed_logs.items():
    rs = rows(p)
    ax.plot([r["step"] for r in rs], [r["avg_score"] for r in rs],
            color=BBX, lw=1.4, alpha=0.55)

# Round-5 numerics-hardening arm: the same recipe at float32 compute
# (config/refrecipe_f32.yaml) — rules out "bf16 hid the magic".
F32 = "#3f9b6e"
if os.path.exists("docs/refrecipe_f32.jsonl"):
    rs = rows("docs/refrecipe_f32.jsonl")
    ax.plot([r["step"] for r in rs], [r["avg_score"] for r in rs],
            color=F32, lw=1.8,
            label="bbx, same recipe at float32 compute (seed 42)")
    lf = rs[-1]
    ax.annotate(f"f32 → {lf['avg_score']:.0f}",
                (lf["step"], lf["avg_score"]),
                textcoords="offset points", xytext=(6, -16), fontsize=9,
                color=INK)

ax.axhline(4021, color=MUT, lw=1.5, ls=(0, (5, 4)))
ax.text(2.1e7, 4021 * 0.93, "reference report's claimed final mean (4,021)",
        color=INK, fontsize=9, ha="right", va="top")

last = b42[-1]
ax.annotate(f"seed 42 → {last['avg_score']:.0f}",
            (last["step"], last["avg_score"]),
            textcoords="offset points", xytext=(-8, 10),
            ha="right", fontsize=9, color=INK)
lr = ref[-1]
ax.annotate(f"ref code @ {lr['step']/1e3:.0f}k → {lr['avg_score']:.0f}",
            (lr["step"], lr["avg_score"]),
            textcoords="offset points", xytext=(6, -14), fontsize=9,
            color=INK)

ax.set_xscale("log")
ax.set_xlim(8e3, 2.2e7)
ax.set_ylim(0, 4600)
ax.set_xlabel("environment steps (log scale)", color=INK)
ax.set_ylabel("rolling mean episode score (window 100)", color=INK)
ax.set_title("The published recipe, run by both implementations, "
             "lands at ~1.1–1.4k — not 4,021", color=INK, fontsize=11)
ax.grid(True, which="both", color="#e8e8e8", lw=0.6)
ax.tick_params(colors=INK)
for s in ax.spines.values():
    s.set_color("#cccccc")
ax.legend(loc="upper left", fontsize=9, frameon=False)
fig.tight_layout()
fig.savefig("docs/refutation_overlay.png")
print("wrote docs/refutation_overlay.png")
