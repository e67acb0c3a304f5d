"""Morphology: erode/dilate/open/close as windowed min/max.

Parity target: cv2.erode/dilate/morphologyEx with rectangular structuring
elements (the reference uses MORPH_CLOSE/MORPH_OPEN cleanup, reference
cv/preprocess_v2.py:178, and a large-kernel close for illumination
normalization, cv/preprocess_v2.py:40). cv2 border for erode uses +inf
padding (replicate is equivalent at image edges for max/min with
rectangular kernels); we pad with the identity element, which matches.

Implemented as separable reduce_window chains (rect kernels separate into
1-D min/max passes) — maps to VPU pooling, no gathers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _sep_window_reduce(x: jnp.ndarray, ksize: int, op: str) -> jnp.ndarray:
    # cv2 anchor is ksize//2, so even kernels pad asymmetrically.
    pad_b = ksize // 2
    pad_a = ksize - 1 - pad_b
    if op == "max":
        init, fn = 0, jax.lax.max
    else:
        init, fn = 255, jax.lax.min
    xi = x.astype(jnp.int32)
    ndim = xi.ndim
    dims_h = [1] * (ndim - 1) + [ksize]
    dims_v = [1] * (ndim - 2) + [ksize, 1]
    y = jax.lax.reduce_window(
        xi, init, fn, tuple(dims_h), (1,) * ndim,
        [(0, 0)] * (ndim - 1) + [(pad_b, pad_a)])
    y = jax.lax.reduce_window(
        y, init, fn, tuple(dims_v), (1,) * ndim,
        [(0, 0)] * (ndim - 2) + [(pad_b, pad_a), (0, 0)])
    return y.astype(jnp.uint8)


def dilate(x: jnp.ndarray, ksize: int = 3) -> jnp.ndarray:
    """Windowed max over ksize x ksize (cv2.dilate, rect kernel)."""
    return _sep_window_reduce(x, ksize, "max")


def erode(x: jnp.ndarray, ksize: int = 3) -> jnp.ndarray:
    """Windowed min over ksize x ksize (cv2.erode, rect kernel)."""
    return _sep_window_reduce(x, ksize, "min")


def open_(x: jnp.ndarray, ksize: int = 3) -> jnp.ndarray:
    """Erosion then dilation (cv2.MORPH_OPEN): removes small speckles."""
    return dilate(erode(x, ksize), ksize)


def close_(x: jnp.ndarray, ksize: int = 3) -> jnp.ndarray:
    """Dilation then erosion (cv2.MORPH_CLOSE): fills small holes."""
    return erode(dilate(x, ksize), ksize)


def morphological_cleanup(
    x: jnp.ndarray, close_ksize: int = 3, open_ksize: int = 2
) -> jnp.ndarray:
    """Close-then-open binary cleanup (reference cv/preprocess_v2.py:178)."""
    y = close_(x, close_ksize)
    if open_ksize > 1:
        y = open_(y, open_ksize)
    return y
