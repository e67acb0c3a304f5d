"""Mesh + sharding helpers.

Design (scaling-book recipe): pick a mesh, annotate shardings on inputs
and params, let XLA insert the collectives; collectives ride ICI inside a
pod slice. Axes:
  * "data"  — frame/batch axis: serving fans frames across chips (pure
    throughput, no cross-chip traffic except at the edges), training does
    standard DP with psum gradient reduction (inserted by XLA from the
    shardings).
  * "model" — tensor-parallel axis for the classifier's dense/conv
    channel dimensions (tiny model, but the axis demonstrates and tests
    the mechanism end-to-end so bigger heads drop in later).
"""

from __future__ import annotations

import math
import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              data: Optional[int] = None,
              model: int = 1) -> Mesh:
    """Build a ("data", "model") mesh over the first n devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.array(devices[:n]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def shard_batch(mesh: Mesh, x, axis: int = 0):
    """Place an array batch-sharded along the data axis."""
    spec = [None] * x.ndim
    spec[axis] = "data"
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def param_sharding_rules(mesh: Mesh, params):
    """Tensor-parallel sharding rules for the CNN param tree.

    Dense kernels (in, out) shard their output dim over "model"; conv
    kernels (kh, kw, cin, cout) shard cout over "model" when divisible.
    Everything else is replicated. Returns a pytree of NamedSharding.
    """
    model_size = mesh.shape["model"]

    def rule(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        is_kernel = names and names[-1] == "kernel"
        if is_kernel and leaf.ndim >= 2 and leaf.shape[-1] % model_size == 0:
            spec = [None] * (leaf.ndim - 1) + ["model"]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def apply_shardings(tree, shardings):
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)
