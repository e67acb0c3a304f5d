"""Histogram kernels (256-bin, fixed shape — jit/TPU friendly)."""

from __future__ import annotations

import jax.numpy as jnp


def histogram256(x: jnp.ndarray) -> jnp.ndarray:
    """256-bin histogram of a uint8 image; returns int32 (256,).

    Uses bincount with static length so the shape is compile-time fixed.
    """
    return jnp.bincount(x.reshape(-1).astype(jnp.int32), length=256)


def histogram256_batched(x: jnp.ndarray) -> jnp.ndarray:
    """Per-image histograms for (N, ...) uint8 input -> (N, 256) int32.

    Implemented as one flat bincount over offset bin ids (bin + 256*i) —
    a single segment-sum instead of N scatters.
    """
    n = x.shape[0]
    flat = x.reshape(n, -1).astype(jnp.int32)
    offsets = (jnp.arange(n, dtype=jnp.int32) * 256)[:, None]
    return jnp.bincount(
        (flat + offsets).reshape(-1), length=n * 256
    ).reshape(n, 256)
