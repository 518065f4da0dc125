"""Device management and seeding (reference: `/root/reference/src/utils/
device.py`).

The reference picks between CUDA/ROCm/MPS/CPU with smoke tests; on JAX the
platform is chosen by the runtime, so this module reports and sanity-checks
rather than selects.
"""
from __future__ import annotations

import random
from typing import Any, Dict, Optional

import jax
import numpy as np


def get_device() -> jax.Device:
    """The default accelerator device (first of `jax.devices()`), after a
    smoke-test matmul (the reference's CUDA smoke test, `device.py:53-63`)."""
    dev = jax.devices()[0]
    x = jax.device_put(np.ones((8, 8), np.float32), dev)
    y = (x @ x).block_until_ready()
    assert float(y[0, 0]) == 8.0
    return dev


def set_seed(seed: int) -> jax.Array:
    """Seed host-side RNGs and return the root JAX key
    (`device.py:74-90`).  JAX itself is functional — the returned key is the
    on-device stream."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.key(seed)


def get_device_info() -> Dict[str, Any]:
    """Platform/topology summary (`device.py:93-118`)."""
    devs = jax.devices()
    return {
        "platform": devs[0].platform,
        "device_kind": devs[0].device_kind,
        "num_devices": len(devs),
        "num_processes": jax.process_count(),
        "process_index": jax.process_index(),
        "devices": [str(d) for d in devs],
    }


def memory_stats(device: Optional[jax.Device] = None) -> Dict[str, Any]:
    """Per-device memory statistics where the backend exposes them
    (`device.py:121-138`)."""
    dev = device or jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if not stats:
        return {}
    out = {}
    for k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
        if k in stats:
            out[k] = stats[k]
            out[k.replace("bytes", "gb")] = stats[k] / 1e9
    return out


def clear_memory() -> None:
    """Drop cached compilations/buffers where possible (`device.py:141-148`)."""
    jax.clear_caches()
