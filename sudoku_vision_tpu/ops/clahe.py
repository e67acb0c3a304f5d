"""CLAHE — contrast-limited adaptive histogram equalization.

Parity target: cv2.createCLAHE(clipLimit, tileGridSize).apply as used by the
reference in two places: big-image contrast enhancement (reference
cv/preprocess_v2.py:122, 8x8 tiles) and the canonical per-cell preprocess
that must match training bit-for-bit (reference ml/datasets.py:18, clip 2.0,
4x4 tiles). Within +/-1 intensity of cv2 on <3% of pixels (interpolation
tie-rounding); see tests/test_ops_parity.py.

TPU design: per-tile histograms via one batched bincount (tile id * 256 +
pixel), clip + redistribute vectorized over all tiles, LUT application as 4
gathers with bilinear tile weights. Requires H, W divisible by the tile
grid (the sudoku pipeline always runs CLAHE on fixed 450/28-px shapes; pad
first if needed).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def clahe(
    x: jnp.ndarray,
    clip_limit: float = 2.0,
    tiles: tuple[int, int] = (8, 8),
) -> jnp.ndarray:
    """CLAHE for uint8 (H, W); pads reflect-101 when not tile-divisible."""
    orig_h, orig_w = x.shape
    ty, tx = tiles
    ph = (ty - orig_h % ty) % ty
    pw = (tx - orig_w % tx) % tx
    if ph or pw:
        x = jnp.pad(x, ((0, ph), (0, pw)), mode="reflect")
    h, w = x.shape
    th, tw = h // ty, w // tx
    area = th * tw
    climit = max(1, int(clip_limit * area / 256.0))

    # Per-tile histograms: comparison-sum instead of scatter (bincount's
    # scatter-add is slow on TPU; an equality-broadcast reduction is pure
    # VPU work and fuses).
    tiles_px = x.reshape(ty, th, tx, tw).transpose(0, 2, 1, 3).reshape(
        ty * tx, area).astype(jnp.int32)
    bins256 = jnp.arange(256, dtype=jnp.int32)
    hist = (tiles_px[:, :, None] == bins256[None, None, :]).sum(
        axis=1, dtype=jnp.int32)

    # Clip and redistribute (cv2 scheme: uniform batch + residual every
    # step-th bin, step = max(1, 256 // residual)).
    excess = jnp.maximum(hist - climit, 0).sum(axis=1, keepdims=True)
    hist = jnp.minimum(hist, climit)
    batch = excess // 256
    resid = excess - batch * 256  # (T, 1) in [0, 255]
    hist = hist + batch
    bins = jnp.arange(256, dtype=jnp.int32)[None, :]
    step = jnp.maximum(1, 256 // jnp.maximum(resid, 1))
    gets_residual = (bins % step == 0) & (bins // step < resid)
    hist = hist + gets_residual.astype(jnp.int32)

    # LUTs: round(cdf * 255 / area).
    cdf = jnp.cumsum(hist, axis=1).astype(jnp.float32)
    luts = jnp.clip(jnp.rint(cdf * (255.0 / area)), 0, 255).astype(
        jnp.int32).reshape(ty, tx, 256)

    # Bilinear interpolation between the 4 surrounding tile LUTs.
    yy = jnp.arange(h, dtype=jnp.float32) / th - 0.5
    xx = jnp.arange(w, dtype=jnp.float32) / tw - 0.5
    y0 = jnp.floor(yy)
    x0 = jnp.floor(xx)
    fy = (yy - y0)[:, None]
    fx = (xx - x0)[None, :]
    y0i = jnp.clip(y0.astype(jnp.int32), 0, ty - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, ty - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, tx - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, tx - 1)

    v = x.astype(jnp.int32)
    flat_luts = luts.reshape(ty * tx, 256)

    def look(tyi, txi):
        tile_id = tyi[:, None] * tx + txi[None, :]
        return jnp.take(flat_luts, tile_id * 256 + v)

    r = (look(y0i, x0i) * (1 - fy) * (1 - fx)
         + look(y0i, x1i) * (1 - fy) * fx
         + look(y1i, x0i) * fy * (1 - fx)
         + look(y1i, x1i) * fy * fx)
    return jnp.rint(r).astype(jnp.uint8)[:orig_h, :orig_w]


def clahe_np_tile_centers(h: int, w: int, tiles: tuple[int, int]) -> np.ndarray:
    """Debug helper: tile center coordinates (for visualization)."""
    ty, tx = tiles
    th, tw = h // ty, w // tx
    cy = np.arange(ty) * th + th / 2.0
    cx = np.arange(tx) * tw + tw / 2.0
    return np.stack(np.meshgrid(cy, cx, indexing="ij"), -1)
