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
    cells: jnp.ndarray,
    ink_thresh: float = 0.02,
    border_frac: float = 0.15,
    min_ink_depth: float = 45.0,
) -> jnp.ndarray:
    """Ink-ratio empty-cell detection (reference cv/extract.py:59 rule:
    <2% ink pixels -> empty).

    cells: (81, S, S) uint8. The reference Otsu-binarizes the interior; an
    Otsu split misfires on faint show-through ghosts (thin paper), so ink
    is defined contrast-relatively instead: pixels at least
    `min_ink_depth` darker than the cell's median. Real print is dark;
    ghosts and paper grain are not.
    """
    n, s, _ = cells.shape
    b = int(s * border_frac)
    inner = cells[:, b:s - b, b:s - b]
    med = jnp.median(inner.astype(jnp.float32).reshape(n, -1), axis=1)
    ink = inner.astype(jnp.float32) < (med - min_ink_depth)[:, None, None]
    ink_ratio = ink.mean(axis=(1, 2), dtype=jnp.float32)
    return ink_ratio < ink_thresh


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
