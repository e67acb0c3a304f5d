"""Multi-strategy grid detection with a confidence-ranked cascade (v2).

Capability parity with reference cv/grid_v2.py: detect_grid (:401) runs a
cascade of strategies with descending confidence, validates candidate
quads (angles 45-135 deg, side ratio <= 2, is_valid_quadrilateral :64),
estimates the rotation angle (:346), and reports which method won
(GridDetectionResult :23 — corners, confidence, method, rotation_angle,
is_partial).

TPU redesign: the reference's sequential Python fallbacks (contour ->
Hough -> rotate-and-retry -> Harris+RANSAC) become FOUR strategies that
all run unconditionally inside one jit graph, each producing a quad +
validity; the final pick is arithmetic (highest-confidence valid quad):

  0 (conf .9): line-lattice CC on the standard adaptive binary
               (cv/grid.py machinery — already rotation-tolerant to
               +-45 deg, subsuming the reference's rotation retry);
  1 (conf .8): relaxed line-lattice — half opening length, denser angle
               bank — recovers broken/faint grid lines (the Hough
               fallback's role);
  2 (conf .7): line-lattice on the multi-strategy v2 binary
               (illumination/shadow robust input);
  3 (conf .6): ink-blob extreme points without the line constraint
               (the Harris/RANSAC last resort's role).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from sudoku_vision_tpu.cv.grid import (
    _avg_pool, _extreme_corners, grid_region_from_lattice, line_lattice_hv,
)
from sudoku_vision_tpu.ops.filters import gaussian_blur_u8
from sudoku_vision_tpu.ops.threshold import adaptive_threshold

METHODS = ("lattice", "lattice_relaxed", "lattice_v2bin", "ink_blob")
_CONFIDENCE = jnp.asarray([0.9, 0.8, 0.7, 0.6], jnp.float32)


class GridDetectionResult(NamedTuple):
    corners: jnp.ndarray        # (4, 2) float32 tl,tr,br,bl (full-res)
    found: jnp.ndarray          # () bool
    confidence: jnp.ndarray     # () float32 (0 when not found)
    method: jnp.ndarray         # () int32 index into METHODS
    rotation_angle: jnp.ndarray  # () float32 degrees (top edge vs horizontal)
    is_partial: jnp.ndarray     # () bool — quad valid but low line fill
    area_frac: jnp.ndarray      # () float32
    all_valid: jnp.ndarray      # (4,) bool per-strategy validity


def is_valid_quadrilateral(corners: jnp.ndarray,
                           min_angle: float = 45.0,
                           max_angle: float = 135.0,
                           max_side_ratio: float = 2.0) -> jnp.ndarray:
    """Angle + side-ratio validation (reference cv/grid_v2.py:64)."""
    c = corners.astype(jnp.float32)
    sides = jnp.stack([c[(i + 1) % 4] - c[i] for i in range(4)])
    lengths = jnp.linalg.norm(sides, axis=1)
    ratio = lengths.max() / jnp.maximum(lengths.min(), 1e-3)

    def angle(i):
        a = sides[i]
        b = -sides[(i - 1) % 4]
        cosv = jnp.dot(a, b) / jnp.maximum(
            jnp.linalg.norm(a) * jnp.linalg.norm(b), 1e-6)
        return jnp.degrees(jnp.arccos(jnp.clip(cosv, -1.0, 1.0)))

    angles = jnp.stack([angle(i) for i in range(4)])
    return ((angles >= min_angle).all() & (angles <= max_angle).all()
            & (ratio <= max_side_ratio) & (lengths.min() > 1.0))


def detect_rotation_angle(corners: jnp.ndarray) -> jnp.ndarray:
    """Rotation of the top edge vs horizontal, degrees
    (reference cv/grid_v2.py:346 uses median Hough angle; the quad's top
    edge carries the same information once corners are known)."""
    d = corners[1] - corners[0]
    return jnp.degrees(jnp.arctan2(d[1], d[0]))


def _quad_from_mask(comp: jnp.ndarray, ds: float, gh: int, gw: int):
    """Extreme-point quad + stats from a detect-scale component mask."""
    corners_small = _extreme_corners(comp)
    corners = corners_small * ds + (ds - 1) / 2.0
    x, y = corners[:, 0], corners[:, 1]
    area2 = jnp.abs(
        (x[0] * y[1] - x[1] * y[0]) + (x[1] * y[2] - x[2] * y[1])
        + (x[2] * y[3] - x[3] * y[2]) + (x[3] * y[0] - x[0] * y[3]))
    area_frac = area2 / 2.0 / jnp.float32(gh * gw)
    fill = jnp.sum(comp).astype(jnp.float32) * ds * ds / jnp.maximum(
        area2 / 2.0, 1.0)
    return corners, area_frac, fill


def _best_component(lat_h: jnp.ndarray, lat_v: jnp.ndarray,
                    density_window: int = 61):
    """Grid-region isolation via two-family line-density (see
    grid.grid_region_from_lattice — one-shot, no label propagation)."""
    comp = grid_region_from_lattice(lat_h, lat_v, density_window)
    return comp, jnp.any(comp)


def detect_grid(
    gray: jnp.ndarray,
    detect_width: int = 950,
    min_area_frac: float = 0.06,
) -> GridDetectionResult:
    """Confidence-ranked cascade (reference cv/grid_v2.py:401)."""
    gh, gw = gray.shape
    ds = max(1, round(max(gh, gw) / detect_width))
    small = jnp.clip(jnp.rint(_avg_pool(gray, ds)), 0, 255).astype(jnp.uint8)
    binary = adaptive_threshold(
        gaussian_blur_u8(small, 5), 11, 2, method="gaussian", invert=True)

    # Strategy inputs.
    lat0 = line_lattice_hv(binary, 31)
    lat1 = line_lattice_hv(binary, 15, tuple(range(-45, 46, 3)))
    from sudoku_vision_tpu.cv.preprocess_v2 import preprocess_multi_strategy

    v2bin = preprocess_multi_strategy(small).binary
    lat2 = line_lattice_hv(v2bin, 31)
    ink = (binary > 0).astype(jnp.int32)

    quads, valids, areas, fills = [], [], [], []
    for pair in (lat0, lat1, lat2, (ink, ink)):
        comp, found_any = _best_component(*pair)
        corners, area_frac, fill = _quad_from_mask(comp, float(ds), gh, gw)
        ok = (found_any & (area_frac >= min_area_frac)
              & is_valid_quadrilateral(corners))
        quads.append(corners)
        valids.append(ok)
        areas.append(area_frac)
        fills.append(fill)

    quads_a = jnp.stack(quads)          # (4, 4, 2)
    valids_a = jnp.stack(valids)        # (4,)
    areas_a = jnp.stack(areas)
    fills_a = jnp.stack(fills)

    score = jnp.where(valids_a, _CONFIDENCE, 0.0)
    best = jnp.argmax(score).astype(jnp.int32)
    found = valids_a[best]
    corners = quads_a[best]
    return GridDetectionResult(
        corners=corners,
        found=found,
        confidence=jnp.where(found, _CONFIDENCE[best], 0.0),
        method=best,
        rotation_angle=detect_rotation_angle(corners),
        is_partial=jnp.logical_and(found, fills_a[best] < 0.08),
        area_frac=areas_a[best],
        all_valid=valids_a,
    )
