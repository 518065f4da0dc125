"""Test configuration: run on a virtual 8-device CPU mesh.

Must set the XLA flags before jax is imported anywhere (SURVEY.md §4: the
multi-device test strategy for the TPU build).
"""
import os
import sys

# Hard-set (not setdefault): the ambient environment pins JAX_PLATFORMS to
# the TPU plugin, and tests must never contend for the single TPU tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/bbx-jax-cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The sandbox boot hook (`sitecustomize.py` on sys.path) imports jax and
# registers the TPU-tunnel PJRT plugin at *interpreter startup*, so the env
# vars above are read too late.  Override via jax.config after import — the
# backend client itself is not initialized until first use, so this still
# takes effect and pins the suite to an 8-device virtual CPU platform.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def reference_src():
    """Path to the reference implementation's `src/`, for differential tests.

    Returns None (tests skip) if the reference tree is unavailable.
    """
    path = "/root/reference/src"
    if not os.path.isdir(path):
        return None
    return path
