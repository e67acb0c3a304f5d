"""Float64 numpy reference kernels for host-side parity paths.

These mirror the device ops in sudoku_vision_tpu.ops at full double
precision — used to generate golden fixtures and to run the bit-exact
parity mode on host (TPUs have no f64). Verified bit-identical to OpenCV
5.0 in tests/test_ops_parity.py. Not imported by the device pipeline.
"""

from __future__ import annotations

import numpy as np


def warp_perspective_np(
    img: np.ndarray, m: np.ndarray, out_hw: tuple[int, int]
) -> np.ndarray:
    """cv2.warpPerspective(INTER_LINEAR, constant 0) bit-exact, float64.

    m maps src->dst (cv2 convention); inverted here in float64.
    """
    oh, ow = out_hw
    m_inv = np.linalg.inv(np.asarray(m, np.float64))
    xs, ys = np.meshgrid(np.arange(ow), np.arange(oh))
    den = m_inv[2, 0] * xs + m_inv[2, 1] * ys + m_inv[2, 2]
    # cv2 materializes the inverse map as float32 before remapping.
    sx = ((m_inv[0, 0] * xs + m_inv[0, 1] * ys + m_inv[0, 2]) / den
          ).astype(np.float32).astype(np.float64)
    sy = ((m_inv[1, 0] * xs + m_inv[1, 1] * ys + m_inv[1, 2]) / den
          ).astype(np.float32).astype(np.float64)
    h, w = img.shape
    x0 = np.floor(sx).astype(np.int64)
    y0 = np.floor(sy).astype(np.int64)
    fx = sx - x0
    fy = sy - y0
    s = img.astype(np.float64)
    acc = np.zeros((oh, ow), np.float64)
    for dy in (0, 1):
        for dx in (0, 1):
            xx = x0 + dx
            yy = y0 + dy
            inb = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
            pix = np.where(inb, s[np.clip(yy, 0, h - 1), np.clip(xx, 0, w - 1)], 0.0)
            wgt = (fy if dy else 1 - fy) * (fx if dx else 1 - fx)
            acc += pix * wgt
    return np.clip(np.rint(acc), 0, 255).astype(np.uint8)
