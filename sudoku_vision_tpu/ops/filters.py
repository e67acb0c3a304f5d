"""Separable filters: Gaussian blur and box filters.

Parity targets (verified in tests/test_ops_parity.py):
  * cv2.GaussianBlur(u8, (k,k), 0) — bit-exact. OpenCV's 8-bit path rounds
    the Gaussian kernel to 8-bit fixed point with the center tap adjusted so
    the taps sum to exactly 256, convolves in int, and descales once with
    (acc + 2^15) >> 16. Border is BORDER_REFLECT_101.
  * cv2.boxFilter(u8, ddepth=CV_8U, normalize=True, BORDER_REPLICATE) — the
    mean filter inside cv2.adaptiveThreshold(..., ADAPTIVE_THRESH_MEAN_C).

Used by the reference's preprocessing (reference cv/preprocess.py:22 blur,
cv/preprocess_v2.py:132 adaptive threshold). Implemented as K-tap
slice-multiply-accumulate chains — VPU-friendly, no gather, no conv op, so
XLA fuses the whole preprocess stage into a handful of elementwise loops.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def gaussian_kernel_fixed(ksize: int, sigma: float = 0.0) -> tuple[int, ...]:
    """OpenCV 8-bit fixed-point Gaussian taps (sum exactly 256).

    sigma <= 0 uses OpenCV's default sigma = 0.3*((ksize-1)*0.5 - 1) + 0.8;
    ksize <= 7 with sigma <= 0 uses OpenCV's small binomial tables (which the
    formula below reproduces for k in {3, 5} after fixed-point rounding).
    """
    small_tab = {
        1: [1.0],
        3: [0.25, 0.5, 0.25],
        5: [0.0625, 0.25, 0.375, 0.25, 0.0625],
        7: [0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125],
    }
    if sigma <= 0 and ksize in small_tab:
        k = np.asarray(small_tab[ksize])
    else:
        if sigma <= 0:
            sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
        half = (ksize - 1) / 2.0
        xs = np.arange(ksize, dtype=np.float64) - half
        k = np.exp(-(xs * xs) / (2.0 * sigma * sigma))
        k /= k.sum()
    ki = np.round(k * 256.0).astype(np.int64)
    ki[ksize // 2] += 256 - ki.sum()  # force exact sum for lossless descale
    return tuple(int(v) for v in ki)


def _pad2d(x: jnp.ndarray, pad: int, border: str) -> jnp.ndarray:
    mode = {"reflect101": "reflect", "replicate": "edge"}[border]
    cfg = [(0, 0)] * (x.ndim - 2) + [(pad, pad), (pad, pad)]
    return jnp.pad(x, cfg, mode=mode)


def sep_filter_int(
    x: jnp.ndarray, taps: tuple[int, ...], border: str = "reflect101",
    max_abs_in: int | None = None,
) -> jnp.ndarray:
    """Separable integer filter; returns the raw int32 accumulator.

    Correlates the last two axes with `taps` (odd length). The caller is
    responsible for descaling.

    Engine dispatch: small maps (detect-pyramid scale) with a provable
    exactness bound route to the MXU band-matmul engine
    (ops/bandconv.py — bit-identical, ~3x faster at 912x684, measured in
    tools/profile_detect.py); everything else runs the K-slice-MAC VPU
    chain. max_abs_in defaults to 255 for uint8 inputs; pass it
    explicitly for wider inputs that are still small enough to qualify.
    """
    h, w = x.shape[-2], x.shape[-1]
    if max_abs_in is None and x.dtype == jnp.uint8:
        max_abs_in = 255
    s = sum(abs(t) for t in taps)
    # Band engine needs non-negative taps (its base-256 digit split is
    # sign-free); every current pipeline kernel (Gaussian, box) is.
    if (max_abs_in is not None and max_abs_in * s * s < (1 << 24)
            and max(h, w) <= 1024 and all(t >= 0 for t in taps)):
        from sudoku_vision_tpu.ops.bandconv import band_filter_int

        return band_filter_int(x, tuple(taps), border, max_abs_in)
    k = len(taps)
    pad = k // 2
    xp = _pad2d(x.astype(jnp.int32), pad, border)
    rows = sum(taps[i] * xp[..., :, i:i + w] for i in range(k))
    out = sum(taps[i] * rows[..., i:i + h, :] for i in range(k))
    return out


def gaussian_blur_u8(
    x: jnp.ndarray, ksize: int = 5, sigma: float = 0.0,
    border: str = "reflect101",
) -> jnp.ndarray:
    """cv2.GaussianBlur-exact blur for uint8 images (..., H, W)."""
    taps = gaussian_kernel_fixed(ksize, sigma)
    acc = sep_filter_int(x, taps, border)
    return ((acc + (1 << 15)) >> 16).astype(jnp.uint8)


def gaussian_blur_f32(
    x: jnp.ndarray, ksize: int, sigma: float = 0.0,
    border: str = "reflect101",
) -> jnp.ndarray:
    """Float Gaussian blur (for quality metrics; no fixed-point rounding)."""
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    half = (ksize - 1) / 2.0
    xs = np.arange(ksize, dtype=np.float64) - half
    k = np.exp(-(xs * xs) / (2.0 * sigma * sigma))
    taps = tuple(float(v) for v in k / k.sum())
    pad = ksize // 2
    xp = _pad2d(x.astype(jnp.float32), pad, border)
    h, w = x.shape[-2], x.shape[-1]
    rows = sum(jnp.float32(taps[i]) * xp[..., :, i:i + w] for i in range(ksize))
    return sum(jnp.float32(taps[i]) * rows[..., i:i + h, :] for i in range(ksize))


def box_filter_sum(
    x: jnp.ndarray, ksize: int, border: str = "replicate"
) -> jnp.ndarray:
    """Windowed sum over a ksize x ksize box (int32), via separable ones."""
    taps = tuple([1] * ksize)
    return sep_filter_int(x, taps, border)


def box_mean_u8(
    x: jnp.ndarray, ksize: int, border: str = "replicate"
) -> jnp.ndarray:
    """cv2.boxFilter(CV_8U, normalize=True) parity: rounded window mean."""
    s = box_filter_sum(x, ksize, border)
    area = ksize * ksize
    # cvRound(sum / area) for positive sums == floor((2*sum + area) / (2*area))
    return ((2 * s + area) // (2 * area)).astype(jnp.uint8)


def box_mean_var_f32(
    x: jnp.ndarray, ksize: int, border: str = "replicate"
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Local mean and variance (float32) — the Sauvola building block."""
    area = float(ksize * ksize)
    xi = x.astype(jnp.int32)
    s1 = sep_filter_int(xi, tuple([1] * ksize), border,
                        max_abs_in=255).astype(jnp.float32)
    s2 = sep_filter_int(xi * xi, tuple([1] * ksize), border,
                        max_abs_in=255 * 255).astype(jnp.float32)
    mean = s1 / area
    var = jnp.maximum(s2 / area - mean * mean, 0.0)
    return mean, var


def laplacian_i32(x: jnp.ndarray) -> jnp.ndarray:
    """cv2.Laplacian 3x3 (aperture 1) kernel [[0,1,0],[1,-4,1],[0,1,0]]."""
    xp = _pad2d(x.astype(jnp.int32), 1, "reflect101")
    h, w = x.shape[-2], x.shape[-1]
    c = xp[..., 1:1 + h, 1:1 + w]
    return (xp[..., 0:h, 1:1 + w] + xp[..., 2:2 + h, 1:1 + w]
            + xp[..., 1:1 + h, 0:w] + xp[..., 1:1 + h, 2:2 + w] - 4 * c)
