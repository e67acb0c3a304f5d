"""Thresholding kernels: adaptive (Gaussian/mean), Otsu, Sauvola.

Parity targets (verified in tests/test_ops_parity.py):
  * cv2.adaptiveThreshold(u8, 255, ADAPTIVE_THRESH_GAUSSIAN_C|MEAN_C,
    THRESH_BINARY|BINARY_INV, block, C) — the reference's main binarizer
    (reference cv/preprocess.py:32 with block=11 C=2 BINARY_INV; cell
    preproc reference ml/datasets.py:18 with BINARY). OpenCV computes the
    local mean with BORDER_REPLICATE and compares src > mean - C.
  * cv2.threshold(..., THRESH_OTSU) — bit-exact threshold selection.
  * Sauvola T = mean * (1 + k*(std/R - 1)) — the reference implements this
    directly (reference cv/preprocess_v2.py:152); R=128, k configurable.
"""

from __future__ import annotations

import jax.numpy as jnp

from sudoku_vision_tpu.ops.filters import (
    box_filter_sum,
    box_mean_var_f32,
    gaussian_kernel_fixed,
    sep_filter_int,
)
from sudoku_vision_tpu.ops.hist import histogram256


def adaptive_threshold(
    x: jnp.ndarray,
    block_size: int = 11,
    c: float = 2.0,
    method: str = "gaussian",
    invert: bool = True,
    maxval: int = 255,
) -> jnp.ndarray:
    """cv2.adaptiveThreshold parity for uint8 (..., H, W).

    invert=True  -> THRESH_BINARY_INV (ink becomes white on black)
    invert=False -> THRESH_BINARY
    """
    xi = x.astype(jnp.int32)
    if method == "gaussian":
        taps = gaussian_kernel_fixed(block_size, 0.0)
        acc = sep_filter_int(x, taps, border="replicate")
        mean = (acc + (1 << 15)) >> 16
    elif method == "mean":
        s = box_filter_sum(x, block_size, border="replicate")
        area = block_size * block_size
        mean = (2 * s + area) // (2 * area)
    else:
        raise ValueError(f"unknown method {method!r}")
    above = xi > mean - int(c)
    hi = jnp.uint8(0 if invert else maxval)
    lo = jnp.uint8(maxval if invert else 0)
    return jnp.where(above, hi, lo)


def otsu_threshold(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Otsu threshold for a uint8 image. Returns (thresh_scalar, binary).

    Threshold selection is cv2-exact: maximize between-class variance,
    first argmax wins; binary is THRESH_BINARY (x > t -> 255).
    """
    hist = histogram256(x).astype(jnp.float32)
    bins = jnp.arange(256, dtype=jnp.float32)
    total = hist.sum()
    sum_all = (bins * hist).sum()
    w_b = jnp.cumsum(hist)  # class-0 weight at threshold i (inclusive)
    sum_b = jnp.cumsum(bins * hist)
    w_f = total - w_b
    valid = (w_b > 0) & (w_f > 0)
    mean_b = jnp.where(w_b > 0, sum_b / w_b, 0.0)
    mean_f = jnp.where(w_f > 0, (sum_all - sum_b) / w_f, 0.0)
    between = jnp.where(valid, w_b * w_f * (mean_b - mean_f) ** 2, -1.0)
    t = jnp.argmax(between).astype(jnp.int32)
    binary = jnp.where(x.astype(jnp.int32) > t, jnp.uint8(255), jnp.uint8(0))
    return t, binary


def otsu_threshold_inv(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Otsu with THRESH_BINARY_INV output (x <= t -> 255)."""
    t, b = otsu_threshold(x)
    return t, jnp.uint8(255) - b


def sauvola_threshold(
    x: jnp.ndarray,
    window: int = 25,
    k: float = 0.2,
    r: float = 128.0,
    invert: bool = True,
) -> jnp.ndarray:
    """Sauvola local threshold T = m*(1 + k*(s/R - 1)); uint8 binary out.

    Mirrors the reference's hand-rolled Sauvola (reference
    cv/preprocess_v2.py:152): document-style binarization robust to
    uneven illumination.
    """
    mean, var = box_mean_var_f32(x, window, border="replicate")
    std = jnp.sqrt(var)
    t = mean * (1.0 + k * (std / r - 1.0))
    above = x.astype(jnp.float32) > t
    hi = jnp.uint8(0 if invert else 255)
    lo = jnp.uint8(255 if invert else 0)
    return jnp.where(above, hi, lo)


def threshold_binary(
    x: jnp.ndarray, thresh: float, maxval: int = 255, invert: bool = False
) -> jnp.ndarray:
    """cv2.threshold(THRESH_BINARY / THRESH_BINARY_INV) parity."""
    above = x.astype(jnp.float32) > thresh
    hi = jnp.uint8(0 if invert else maxval)
    lo = jnp.uint8(maxval if invert else 0)
    return jnp.where(above, hi, lo)
