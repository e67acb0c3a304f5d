"""v1 preprocessing: grayscale -> Gaussian blur -> adaptive threshold.

Same contract as the reference v1 chain (reference cv/preprocess.py:57
preprocess_for_grid_detection: grayscale :15, 5x5 blur :22, adaptive
Gaussian threshold block 11 C=2 BINARY_INV :32) as one fused device
function — everything stays in HBM/VMEM, no host hops.
"""

from __future__ import annotations

import jax.numpy as jnp

from sudoku_vision_tpu import ops


def preprocess_for_grid_detection(img: jnp.ndarray) -> jnp.ndarray:
    """uint8 (H, W, 3) BGR or (H, W) gray -> binary uint8 (H, W), ink=255."""
    gray = ops.bgr_to_gray(img) if img.ndim == 3 else img
    blurred = ops.gaussian_blur_u8(gray, 5)
    return ops.adaptive_threshold(blurred, 11, 2, method="gaussian",
                                  invert=True)
