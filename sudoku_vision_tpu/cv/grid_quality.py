"""On-device grid-quality assessment (pre-compute gating).

Capability parity with reference cv/grid_quality.py: five 0-100 metrics —
sharpness = Laplacian variance / 10 (:47), contrast = 2.5-97.5 percentile
spread / 2 (:64), completeness = grid-line pixel coverage along the 20
expected lines in the warped binary (:88), geometry = side-length spread +
corner-angle deviation from 90 deg (:143), size = per-cell pixel size
piecewise score (:186) — combined with weights .25/.15/.25/.20/.15 (:257)
into an overall score with acceptable >= 50 / good >= 70 thresholds (:37)
and textual feedback (:309).

All metrics are jnp reductions over the warped grid — they ride the same
jit graph as perception, so gating costs nothing extra on host.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from sudoku_vision_tpu.ops.filters import laplacian_i32
from sudoku_vision_tpu.ops.threshold import adaptive_threshold

WEIGHTS = {
    "sharpness": 0.25,
    "contrast": 0.15,
    "completeness": 0.25,
    "geometry": 0.20,
    "size": 0.15,
}


class QualityScore(NamedTuple):
    overall: jnp.ndarray       # () float32 0-100
    sharpness: jnp.ndarray
    contrast: jnp.ndarray
    completeness: jnp.ndarray
    geometry: jnp.ndarray
    size: jnp.ndarray
    # 6th, UNWEIGHTED metric (not part of `overall`, which keeps the
    # reference's 5-metric formula): line selectivity — how much more
    # ink sits ON the 20 expected grid lines than at mid-cell bands.
    # A true sudoku grid is highly selective (lines ~100% covered,
    # mid-cell bands carry only digit strokes); moiré from photographed
    # screens covers both equally, which is exactly the failure the
    # 5 reference metrics cannot see (round-2 tail: a moiré quad scored
    # overall 88). Gated separately in pipeline/run_v2.py.
    selectivity: jnp.ndarray

    @property
    def is_acceptable(self):
        return self.overall >= 50.0

    @property
    def is_good(self):
        return self.overall >= 70.0


def compute_sharpness(warped_gray: jnp.ndarray) -> jnp.ndarray:
    """Laplacian variance / 10, capped at 100 (reference :47)."""
    lap = laplacian_i32(warped_gray).astype(jnp.float32)
    return jnp.minimum(jnp.var(lap) / 10.0, 100.0)


def compute_contrast(warped_gray: jnp.ndarray) -> jnp.ndarray:
    """Percentile spread (2.5-97.5) / 2, capped at 100 (reference :64)."""
    x = warped_gray.astype(jnp.float32).reshape(-1)
    lo = jnp.percentile(x, 2.5)
    hi = jnp.percentile(x, 97.5)
    return jnp.minimum((hi - lo) / 2.0, 100.0)


def compute_completeness(warped_gray: jnp.ndarray) -> jnp.ndarray:
    """Fraction of expected grid-line pixels present (reference :88).

    Samples the binarized warped grid along the 10 horizontal + 10
    vertical expected line positions (each +-1 px band) and scores the
    hit rate.
    """
    s = warped_gray.shape[0]
    binary = adaptive_threshold(warped_gray, 11, 2, invert=True)
    ink = (binary > 0).astype(jnp.float32)
    cell = s // 9
    idx = jnp.clip(jnp.arange(10) * cell, 0, s - 1)
    rows = jnp.stack([ink[jnp.clip(idx + d, 0, s - 1), :]
                      for d in (-1, 0, 1)]).max(axis=0)
    cols = jnp.stack([ink[:, jnp.clip(idx + d, 0, s - 1)]
                      for d in (-1, 0, 1)]).max(axis=0)
    coverage = (rows.mean() + cols.mean()) / 2.0
    return jnp.minimum(coverage * 125.0, 100.0)  # 80% coverage -> 100


def compute_selectivity(warped_gray: jnp.ndarray) -> jnp.ndarray:
    """Line-selectivity 0-100: on-line ink coverage minus mid-cell ink
    coverage, relative to on-line coverage.

    On-bands: ±2 px around the 10+10 expected grid-line positions in the
    warped binary (the same lattice compute_completeness samples).
    Off-bands: ±2 px around the 9+9 mid-cell positions, where a real
    grid has only digit strokes, while screen moiré keeps the same
    stripe coverage it has on-line (at least one stripe family is
    pitch-incommensurate with the cell lattice).

    Round-3 calibration (6 goldens + 52 e2e scenes + 16 fresh screens):
    legit quads score 33.5-72; CORRECTLY-detected screen grids 29-44
    (their mid-cell bands are moiré-polluted yet the pipeline solves
    them); the degenerate stripe-lattice quad scores exactly 0. So this
    metric separates garbage quads from everything solvable, not
    "screens" from "paper" — gate accordingly (run_v2 uses 20).
    """
    s = warped_gray.shape[0]
    binary = adaptive_threshold(warped_gray, 11, 2, invert=True)
    ink = (binary > 0).astype(jnp.float32)
    cell = s // 9

    def band_coverage(positions: jnp.ndarray) -> jnp.ndarray:
        rows = jnp.stack([ink[jnp.clip(positions + d, 0, s - 1), :]
                          for d in (-2, -1, 0, 1, 2)]).max(axis=0)
        cols = jnp.stack([ink[:, jnp.clip(positions + d, 0, s - 1)]
                          for d in (-2, -1, 0, 1, 2)]).max(axis=0)
        return (rows.mean() + cols.mean()) / 2.0

    on = band_coverage(jnp.clip(jnp.arange(10) * cell, 0, s - 1))
    off = band_coverage(jnp.arange(9) * cell + cell // 2)
    sel = (on - off) / jnp.maximum(on, 1e-6)
    return jnp.clip(sel, 0.0, 1.0) * 100.0


def compute_geometry(corners: jnp.ndarray) -> jnp.ndarray:
    """Side-length uniformity + right angles (reference :143)."""
    c = corners.astype(jnp.float32)
    sides = jnp.stack([c[(i + 1) % 4] - c[i] for i in range(4)])
    lengths = jnp.linalg.norm(sides, axis=1)
    mean_len = lengths.mean()
    len_score = jnp.maximum(
        0.0, 100.0 - 200.0 * jnp.std(lengths) / jnp.maximum(mean_len, 1.0))
    # Angles between consecutive sides.
    def angle(i):
        a = sides[i]
        b = -sides[(i - 1) % 4]
        cosv = jnp.dot(a, b) / jnp.maximum(
            jnp.linalg.norm(a) * jnp.linalg.norm(b), 1e-6)
        return jnp.degrees(jnp.arccos(jnp.clip(cosv, -1.0, 1.0)))
    angles = jnp.stack([angle(i) for i in range(4)])
    ang_dev = jnp.abs(angles - 90.0).mean()
    ang_score = jnp.maximum(0.0, 100.0 - 4.0 * ang_dev)
    return (len_score + ang_score) / 2.0


def compute_size_score(corners: jnp.ndarray) -> jnp.ndarray:
    """Per-cell pixel size piecewise score (reference :186):
    cells below ~15 px are unreadable, 30-80 px is ideal."""
    c = corners.astype(jnp.float32)
    sides = jnp.stack([c[(i + 1) % 4] - c[i] for i in range(4)])
    cell_px = jnp.linalg.norm(sides, axis=1).mean() / 9.0
    return jnp.clip(
        jnp.where(cell_px < 15.0, cell_px * (50.0 / 15.0),
                  jnp.where(cell_px < 30.0,
                            50.0 + (cell_px - 15.0) * (50.0 / 15.0),
                            100.0)),
        0.0, 100.0)


def assess_grid_quality(
    warped_gray: jnp.ndarray, corners: jnp.ndarray
) -> QualityScore:
    """Weighted overall score (reference cv/grid_quality.py:228)."""
    sharp = compute_sharpness(warped_gray)
    contr = compute_contrast(warped_gray)
    compl_ = compute_completeness(warped_gray)
    geom = compute_geometry(corners)
    size = compute_size_score(corners)
    sel = compute_selectivity(warped_gray)
    overall = (WEIGHTS["sharpness"] * sharp + WEIGHTS["contrast"] * contr
               + WEIGHTS["completeness"] * compl_
               + WEIGHTS["geometry"] * geom + WEIGHTS["size"] * size)
    return QualityScore(overall, sharp, contr, compl_, geom, size, sel)


def get_user_feedback(score) -> list[str]:
    """Actionable feedback strings (reference cv/grid_quality.py:309).
    Host-side: takes a QualityScore of concrete floats."""
    msgs = []
    if float(score.sharpness) < 40:
        msgs.append("Image is blurry — hold the camera steady")
    if float(score.contrast) < 40:
        msgs.append("Low contrast — improve lighting")
    if float(score.completeness) < 50:
        msgs.append("Grid lines are broken — move closer or adjust angle")
    if float(score.geometry) < 50:
        msgs.append("Grid is skewed — shoot more straight-on")
    if float(score.size) < 50:
        msgs.append("Grid too small — move closer")
    if float(score.selectivity) < 25:
        msgs.append("Striped interference (photographed screen?) — "
                    "grid lines are indistinct from the texture")
    if not msgs:
        msgs.append("Grid quality is good")
    return msgs
