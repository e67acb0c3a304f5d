"""Bilinear resize with cv2 INTER_LINEAR bit-exact arithmetic for uint8.

OpenCV's 8-bit INTER_LINEAR path is fixed point: source coordinates are
computed as float32 (dx+0.5)*scale - 0.5, tap weights are rounded to 11-bit
fixed point (scale 2048), the horizontal pass accumulates in int32, and the
vertical pass uses the SSE "mulhi" rounding: rows are shifted right by 4,
multiplied high-half (>>16) by the vertical weights, summed, then rounded
with (+2)>>2. Verified bit-exact against cv2.resize in
tests/test_ops_parity.py.

Used by cell extraction (reference cv/extract.py:13 resizes each ~40px cell
crop to 28x28 for the CNN). Batched over leading axes; gathers are 1-D
per-axis (separable), which XLA lowers to cheap dynamic-slice rows.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def _axis_plan(src: int, dst: int) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Static per-axis gather indices + fixed-point weights (cv2-exact)."""
    scale = src / dst
    f = ((np.arange(dst) + 0.5) * scale - 0.5).astype(np.float32)
    s = np.floor(f).astype(np.int64)
    r = (f - s).astype(np.float32)
    i0 = np.clip(s, 0, src - 1)
    i1 = np.clip(s + 1, 0, src - 1)
    w0 = np.rint((np.float32(1.0) - r) * 2048).astype(np.int32)
    w1 = np.rint(r * 2048).astype(np.int32)
    return i0, i1, w0, w1


def resize_bilinear_u8(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """cv2.resize(INTER_LINEAR)-exact resize of uint8 (..., H, W)."""
    h, w = x.shape[-2], x.shape[-1]
    oh, ow = out_hw
    xi0, xi1, wx0, wx1 = _axis_plan(w, ow)
    yi0, yi1, wy0, wy1 = _axis_plan(h, oh)
    s = x.astype(jnp.int32)
    # Horizontal pass: int32 accumulator, no descale (matches cv2).
    hx = jnp.take(s, jnp.asarray(xi0), axis=-1) * jnp.asarray(wx0) + \
         jnp.take(s, jnp.asarray(xi1), axis=-1) * jnp.asarray(wx1)
    row0 = jnp.take(hx, jnp.asarray(yi0), axis=-2)
    row1 = jnp.take(hx, jnp.asarray(yi1), axis=-2)
    # Vertical pass: cv2's SSE rounding ((row>>4)*w)>>16, sum, (+2)>>2.
    wy0c = jnp.asarray(wy0)[:, None]
    wy1c = jnp.asarray(wy1)[:, None]
    mh = ((row0 >> 4) * wy0c) >> 16
    mh1 = ((row1 >> 4) * wy1c) >> 16
    return ((mh + mh1 + 2) >> 2).astype(jnp.uint8)


def resize_bilinear_f32(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Float bilinear resize with half-pixel centers (no fixed point)."""
    h, w = x.shape[-2], x.shape[-1]
    oh, ow = out_hw
    xi0, xi1, wx0, wx1 = _axis_plan(w, ow)
    yi0, yi1, wy0, wy1 = _axis_plan(h, oh)
    s = x.astype(jnp.float32)
    fx1 = jnp.asarray(wx1, jnp.float32) / 2048.0
    fy1 = jnp.asarray(wy1, jnp.float32)[:, None] / 2048.0
    hx = jnp.take(s, jnp.asarray(xi0), axis=-1) * (1 - fx1) + \
         jnp.take(s, jnp.asarray(xi1), axis=-1) * fx1
    return jnp.take(hx, jnp.asarray(yi0), axis=-2) * (1 - fy1) + \
           jnp.take(hx, jnp.asarray(yi1), axis=-2) * fy1
