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


def pooled_gray(img: jnp.ndarray, f: int) -> jnp.ndarray:
    """Fused BGR->gray + area-average downsample by integer factor ``f``.

    uint8 (H, W, 3) BGR -> uint8 (H//f, W//f) gray reading the
    10-megapixel frame ONCE. Semantics are integer-exact:
        floor((sum_{f x f} (1868*B + 9617*G + 4899*R) + 2^(s-1)) / 2^s),
    s = 14 + 2*log2(f) — round-half-up of the exact fixed-point mean.

    The hot path is `ops.pallas_pool.pooled_gray_packed` on row-packed
    (H, W*3) frames — a Pallas streaming kernel, 0.11 ms/frame,
    bit-identical to this function (pack on HOST: a device-side
    (H,W,3)->(H,W*3) reshape retiles the minor dims at 0.17 ms/frame).
    This XLA formulation serves 3D device-resident inputs and CPU.
    TPU-layout findings behind it (measured, batch-amortized):
      * per-channel reduce_window chains: 0.37 ms/frame (3 strided
        slices of the trailing-3 minor dim, f32 intermediates);
      * reshape-based (H//f, f, W//f, f) pooling: 2.6 ms/frame — a
        reshape that splits the 128-lane minor dim forces a relayout;
      * luma as a dot_general contraction over the channel dim feeding
        ONE strided reduce_window: 0.19 ms/frame (the 10-MP luma
        intermediate is materialized). The contraction keeps the
        (8,128)-tiled H,W dims intact.
    gray/pool and pool/gray commute (both are one weighted mean). The
    luma dot runs in f32 (products <= 255*9617: exact) and the window
    sum in int32 (totals need up to 27 bits), so XLA and Pallas paths
    are bit-identical (tests/test_pallas_pool.py).
    """
    if f == 1:
        return bgr_to_gray(img)
    import jax

    h, w = img.shape[:2]
    w_luma = jnp.array([[_B2Y], [_G2Y], [_R2Y]], jnp.float32)
    y = jax.lax.dot_general(
        img.astype(jnp.float32), w_luma,
        (((2,), (0,)), ((), ())))[..., 0].astype(jnp.int32)
    shift = _SHIFT + 2 * (f.bit_length() - 1) if f & (f - 1) == 0 else None
    p = jax.lax.reduce_window(
        y[:h // f * f, :w // f * f], 0, jax.lax.add, (f, f), (f, f),
        "VALID")
    if shift is not None:
        return ((p + (1 << (shift - 1))) >> shift).astype(jnp.uint8)
    # Non-power-of-two f: same round-half-up in exact integer arithmetic.
    d = f * f * (1 << _SHIFT)
    return ((p + d // 2) // d).astype(jnp.uint8)
