"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Tests never require TPU hardware; multi-chip sharding is validated on
virtual CPU devices (the driver separately dry-runs the multi-chip path).
These env vars must be set before jax initializes its backends, which is
why they live at conftest import time.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
