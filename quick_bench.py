#!/usr/bin/env python
"""Quick performance gate (reference: `/root/reference/quick_bench.py`).

The reference requires >= 10,000 raw engine moves/s on CPU; the TPU-native
gate is 1,000x that on-device.
"""
import sys

GATE_MOVES_PER_SEC = 10_000_000


def main() -> int:
    from bbx.cli.benchmark import bench_engine

    r = bench_engine(num_envs=4096, steps=64)
    sps = r["env_steps_per_sec"]
    ok = sps >= GATE_MOVES_PER_SEC
    print(f"engine: {sps:,.0f} moves/s "
          f"({'PASS' if ok else 'FAIL'} — gate {GATE_MOVES_PER_SEC:,})")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
