#!/usr/bin/env python
"""Quick performance gate (reference: `/root/reference/quick_bench.py`).

The reference requires >= 10,000 raw engine moves/s on its CPU engine; this
gate is a REGRESSION BOUND for the TPU engine at its demonstrated-peak
fleet size.  bench.py (pipelined, reward-forced windows) measures 1.69M
env-steps/s on one v5e chip at 16,384 envs; THIS script's plainer
bench_engine timing loop measures 1.22M on the same hardware (per-run
dispatch overhead included).  The gate passes at ~75% of the latter, so a
real >25% regression on this path fails while run-to-run variance does not.
"""
import sys

GATE_MOVES_PER_SEC = 900_000     # ~75% of the 1.22M measured via this path
NUM_ENVS = 16_384                # the bench's flat-top fleet size


def main() -> int:
    from bbx.cli.benchmark import bench_engine

    r = bench_engine(num_envs=NUM_ENVS, steps=64)
    sps = r["env_steps_per_sec"]
    ok = sps >= GATE_MOVES_PER_SEC
    print(f"engine: {sps:,.0f} moves/s @ {NUM_ENVS} envs "
          f"({'PASS' if ok else 'FAIL'} — gate {GATE_MOVES_PER_SEC:,})")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
