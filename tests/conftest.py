"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Tests never require TPU hardware; multi-chip sharding is validated on
virtual CPU devices (the driver separately dry-runs the multi-chip path).
These env vars must be set before jax initializes its backends, which is
why they live at conftest import time.

Exception: SV_GOLDEN=1 (the golden e2e accuracy gate) leaves the real
device enabled — run it as `SV_GOLDEN=1 pytest tests/test_golden_e2e.py`
on its own, not mixed into the full suite.
"""

import os

_GOLDEN = os.environ.get("SV_GOLDEN") == "1"

if not _GOLDEN:
    # Force, not setdefault: the axon sitecustomize exports JAX_PLATFORMS=axon.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

# The axon sitecustomize imports jax at interpreter start, which pins the
# platform before this file runs — the env var alone is then too late.
# jax.config.update works any time before backend initialization.
import jax  # noqa: E402

if not _GOLDEN:
    jax.config.update("jax_platforms", "cpu")

import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

# Persistent XLA compile cache — jit compiles dominate test wall time on
# this 1-core host; caching makes re-runs fast.
from sudoku_vision_tpu.utils import jax_cache  # noqa: E402

jax_cache.enable(None if _GOLDEN else os.path.join(_REPO, ".jax_cache_cpu"))
