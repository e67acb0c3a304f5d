"""81-cell extraction + model-input preprocessing, fully on device.

Reference contract: warp to 450x450, split 9x9 with a 10% margin crop,
resize each cell to 28x28 (reference cv/extract.py:13), Otsu-based empty
detection with a <2% ink-ratio rule (cv/extract.py:59), and the canonical
CNN input preproc CLAHE(2.0, 4x4) -> adaptive threshold(11, 2) -> invert
-> scale (reference ml/datasets.py:18, pipeline/run.py:73 — training and
inference MUST share this).

TPU design: the warp+crop+resize chain is one fused gather
(ops.warp_extract_cells); the 81 cells then ride a single (81, 28, 28)
batch through CLAHE/threshold/normalize — the reference's 81-iteration
Python loop (run.py:122-150) becomes one vectorized op chain.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sudoku_vision_tpu import ops
from sudoku_vision_tpu.ops.hist import histogram256_batched


def extract_cells(
    img_gray: jnp.ndarray,
    m_inv: jnp.ndarray,
    warp_size: int = 450,
    cell_size: int = 28,
    margin_frac: float = 0.10,
) -> jnp.ndarray:
    """(H, W) u8 + inverse homography -> (81, 28, 28) u8 cell images."""
    return ops.warp_extract_cells(
        img_gray, m_inv, warp_size, cell_size, margin_frac)


def cells_empty_mask(
    cells: jnp.ndarray, ink_thresh: float = 0.02, border_frac: float = 0.15
) -> jnp.ndarray:
    """Otsu + ink-ratio empty-cell detection (reference cv/extract.py:59).

    cells: (81, S, S) uint8. The interior (border cropped by border_frac)
    is Otsu-binarized (dark ink -> 1); a cell is empty when the ink
    fraction is below ink_thresh.
    """
    n, s, _ = cells.shape
    b = int(s * border_frac)
    inner = cells[:, b:s - b, b:s - b]
    hists = histogram256_batched(inner).astype(jnp.float32)
    bins = jnp.arange(256, dtype=jnp.float32)
    total = hists.sum(axis=1, keepdims=True)
    sum_all = (bins * hists).sum(axis=1, keepdims=True)
    w_b = jnp.cumsum(hists, axis=1)
    sum_b = jnp.cumsum(bins * hists, axis=1)
    w_f = total - w_b
    valid = (w_b > 0) & (w_f > 0)
    mean_b = jnp.where(w_b > 0, sum_b / w_b, 0.0)
    mean_f = jnp.where(w_f > 0, (sum_all - sum_b) / w_f, 0.0)
    between = jnp.where(valid, w_b * w_f * (mean_b - mean_f) ** 2, -1.0)
    t = jnp.argmax(between, axis=1).astype(jnp.int32)  # (81,)
    ink = inner.astype(jnp.int32) <= t[:, None, None]  # dark pixels
    ink_ratio = ink.mean(axis=(1, 2), dtype=jnp.float32)
    # Degenerate flat cells (otsu invalid) are empty.
    flat = (between.max(axis=1) <= 0)
    return jnp.logical_or(ink_ratio < ink_thresh, flat)


def preprocess_cells_for_model(cells: jnp.ndarray) -> jnp.ndarray:
    """Canonical CNN input preproc for (81, 28, 28) u8 cells.

    CLAHE(2.0, 4x4 tiles) -> adaptive gaussian threshold(11, 2, BINARY) ->
    invert -> [0,1] -> normalize to [-1,1]; returns float32 (81, 28, 28, 1).
    Matches reference ml/datasets.py:18 + pipeline/run.py:146 normalize.
    """
    cl = jax.vmap(lambda c: ops.clahe(c, 2.0, (4, 4)))(cells)
    th = ops.adaptive_threshold(cl, 11, 2, method="gaussian", invert=False)
    inv = (255 - th.astype(jnp.int32)).astype(jnp.float32) / 255.0
    norm = (inv - 0.5) / 0.5
    return norm[..., None]
