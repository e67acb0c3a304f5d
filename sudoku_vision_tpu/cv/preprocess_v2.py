"""Robust multi-strategy preprocessing (v2).

Capability parity with reference cv/preprocess_v2.py: illumination
normalization via large-kernel morphological close + divide (:40), glare
detection — saturated highlights over >1% of the frame (:63), shadow
detection via local-mean contrast (:82), shadow removal by
dilate+blur+divide (:105), CLAHE (:122), three thresholders — adaptive
(:132), Otsu (:146), Sauvola (:152) — morphological cleanup (:178), and
a multi-strategy selector scoring the binaries by closeness to the ~10%
expected ink ratio (:247, scorer :285).

TPU design: ALL strategies run unconditionally inside one jit graph and
the winner is selected with arithmetic (argmax over scores) — the
reference's Python fallback cascade becomes a branchless select, so the
whole thing vmaps over a frame batch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from sudoku_vision_tpu.ops.clahe import clahe
from sudoku_vision_tpu.ops.filters import gaussian_blur_u8
from sudoku_vision_tpu.ops.morphology import close_, dilate, morphological_cleanup
from sudoku_vision_tpu.ops.threshold import (
    adaptive_threshold, otsu_threshold_inv, sauvola_threshold,
)


class PreprocessResult(NamedTuple):
    """Fixed-shape result (reference PreprocessResult dataclass :21)."""

    binary: jnp.ndarray          # chosen binary, ink = 255
    strategy: jnp.ndarray        # () int32: 0=adaptive, 1=otsu, 2=sauvola
    scores: jnp.ndarray          # (3,) float32 per-strategy score
    has_glare: jnp.ndarray       # () bool
    has_shadow: jnp.ndarray      # () bool
    normalized: jnp.ndarray      # illumination-normalized grayscale


def normalize_illumination(gray: jnp.ndarray, ksize: int = 31) -> jnp.ndarray:
    """Estimate background with a large morphological close, divide it out
    (reference preprocess_v2.py:40)."""
    bg = close_(gray, ksize).astype(jnp.float32)
    norm = gray.astype(jnp.float32) / jnp.maximum(bg, 1.0) * 255.0
    return jnp.clip(jnp.rint(norm), 0, 255).astype(jnp.uint8)


def detect_glare(gray: jnp.ndarray, intensity: int = 250,
                 area_frac: float = 0.01) -> jnp.ndarray:
    """Saturated highlights over >1% of the frame
    (reference preprocess_v2.py:63)."""
    return (gray >= intensity).mean(dtype=jnp.float32) > area_frac


def detect_shadow(gray: jnp.ndarray, block: int = 51,
                  contrast: float = 0.25) -> jnp.ndarray:
    """Strong local-mean contrast = shadowed regions
    (reference preprocess_v2.py:82)."""
    local = gaussian_blur_u8(gray, block if block % 2 else block + 1)
    mean = gray.astype(jnp.float32).mean()
    dark = local.astype(jnp.float32) < mean * (1.0 - contrast)
    return dark.mean(dtype=jnp.float32) > 0.05


def remove_shadow(gray: jnp.ndarray) -> jnp.ndarray:
    """Dilate + blur background estimate, divide out
    (reference preprocess_v2.py:105)."""
    bg = dilate(gray, 7)
    bg = gaussian_blur_u8(bg, 21)
    norm = gray.astype(jnp.float32) / jnp.maximum(
        bg.astype(jnp.float32), 1.0) * 255.0
    return jnp.clip(jnp.rint(norm), 0, 255).astype(jnp.uint8)


def apply_clahe(gray: jnp.ndarray, clip: float = 2.0,
                tiles: tuple[int, int] = (8, 8)) -> jnp.ndarray:
    """CLAHE contrast enhancement (reference preprocess_v2.py:122)."""
    return clahe(gray, clip, tiles)


def _score_binary(binary: jnp.ndarray,
                  target_ink: float = 0.10) -> jnp.ndarray:
    """Score by closeness of the ink ratio to ~10%
    (reference preprocess_v2.py:285)."""
    ink = (binary > 0).mean(dtype=jnp.float32)
    return 1.0 - jnp.abs(ink - target_ink) / target_ink


def preprocess_multi_strategy(gray: jnp.ndarray) -> PreprocessResult:
    """Glare/shadow-aware multi-threshold preprocessing with arithmetic
    strategy selection (reference preprocess_v2.py:247)."""
    glare = detect_glare(gray)
    shadow = detect_shadow(gray)
    base = normalize_illumination(gray)
    # Shadow removal applied branchlessly where shadow was detected.
    desha = remove_shadow(base)
    work = jnp.where(shadow, desha, base)
    work = apply_clahe(work)
    work = gaussian_blur_u8(work, 5)

    cand_adaptive = adaptive_threshold(work, 11, 2, invert=True)
    _, cand_otsu = otsu_threshold_inv(work)
    cand_sauvola = sauvola_threshold(work, 25, 0.2, invert=True)
    cands = jnp.stack([
        morphological_cleanup(cand_adaptive, 3, 1),
        morphological_cleanup(cand_otsu, 3, 1),
        morphological_cleanup(cand_sauvola, 3, 1),
    ])
    scores = jnp.stack([_score_binary(c) for c in cands])
    best = jnp.argmax(scores).astype(jnp.int32)
    binary = cands[best]
    return PreprocessResult(binary=binary, strategy=best, scores=scores,
                            has_glare=glare, has_shadow=shadow,
                            normalized=work)


def preprocess_cell(cell: jnp.ndarray) -> jnp.ndarray:
    """Per-cell preproc: CLAHE + adaptive threshold + invert
    (reference preprocess_v2.py:311); see also
    cv.extract.preprocess_cells_for_model for the batched model-input
    version."""
    enhanced = clahe(cell, 2.0, (4, 4))
    return adaptive_threshold(enhanced, 11, 2, invert=True)
