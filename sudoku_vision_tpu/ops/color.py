"""Color conversion kernels.

Parity target: cv2.cvtColor(..., COLOR_BGR2GRAY) as used by the reference's
v1 preprocessing (reference cv/preprocess.py:15 `grayscale`). OpenCV's 8-bit
path is the classic 14-bit fixed-point BT.601 weighting; we replicate it
exactly up to SIMD tie-rounding noise (<0.3% of pixels differ by ±1, see
tests/test_ops_parity.py).
"""

from __future__ import annotations

import jax.numpy as jnp

# BT.601 luma weights scaled by 2^14 (sum exactly 16384).
_R2Y, _G2Y, _B2Y, _SHIFT = 4899, 9617, 1868, 14


def bgr_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    """uint8 (..., H, W, 3) BGR -> uint8 (..., H, W) gray, cv2 fixed point."""
    x = img.astype(jnp.int32)
    b, g, r = x[..., 0], x[..., 1], x[..., 2]
    y = (_R2Y * r + _G2Y * g + _B2Y * b + (1 << (_SHIFT - 1))) >> _SHIFT
    return y.astype(jnp.uint8)


def rgb_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    """uint8 (..., H, W, 3) RGB -> uint8 (..., H, W) gray, cv2 fixed point."""
    return bgr_to_gray(img[..., ::-1])
