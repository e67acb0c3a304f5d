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
    _avg_pool, _coarse_labels, _extreme_corners, line_lattice,
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


def _best_component(mask_small: jnp.ndarray, coarse: int, cc_iters: int):
    """CC + plausibility scoring (shared with v1 detect_grid semantics)."""
    h, w = mask_small.shape
    f = max(1, -(-max(h, w) // coarse))
    ch, cw = h // f, w // f
    coarse_mask = jax.lax.reduce_window(
        mask_small[:ch * f, :cw * f].astype(jnp.int32), 0, jax.lax.max,
        (f, f), (f, f), "VALID") > 0
    labels = _coarse_labels(coarse_mask, cc_iters)
    n = ch * cw
    flat = labels.reshape(-1)
    counts = jnp.bincount(flat, length=n + 1).at[0].set(0)
    ys = jax.lax.broadcasted_iota(jnp.int32, (ch, cw), 0).reshape(-1)
    xs = jax.lax.broadcasted_iota(jnp.int32, (ch, cw), 1).reshape(-1)
    x_max = jax.ops.segment_max(xs, flat, num_segments=n + 1)
    x_min = jax.ops.segment_min(xs, flat, num_segments=n + 1)
    y_max = jax.ops.segment_max(ys, flat, num_segments=n + 1)
    y_min = jax.ops.segment_min(ys, flat, num_segments=n + 1)
    bw = (x_max - x_min + 1).astype(jnp.float32)
    bh = (y_max - y_min + 1).astype(jnp.float32)
    bbox_frac = (bw * bh) / float(ch * cw)
    aspect = bw / jnp.maximum(bh, 1.0)
    plausible = ((counts > 0) & (bbox_frac >= 0.10)
                 & (aspect >= 0.4) & (aspect <= 2.5))
    on_border = ((ys == 0) | (ys == ch - 1) | (xs == 0) | (xs == cw - 1))
    touches = jax.ops.segment_max(
        on_border.astype(jnp.int32), flat, num_segments=n + 1) > 0
    s_int = jnp.where(plausible & ~touches, counts, 0)
    s_any = jnp.where(plausible, counts, 0)
    score = jnp.where(jnp.any(s_int > 0), s_int, s_any)
    best = jnp.argmax(score).astype(jnp.int32)
    comp_coarse = labels == best
    comp = jnp.repeat(jnp.repeat(comp_coarse, f, axis=0), f, axis=1)
    comp = jnp.pad(comp, ((0, h - ch * f), (0, w - cw * f)))
    comp = jnp.logical_and(comp, mask_small > 0)
    return comp, score[best] > 0


def detect_grid(
    gray: jnp.ndarray,
    detect_width: int = 950,
    min_area_frac: float = 0.10,
) -> GridDetectionResult:
    """Confidence-ranked cascade (reference cv/grid_v2.py:401)."""
    gh, gw = gray.shape
    ds = max(1, round(max(gh, gw) / detect_width))
    small = jnp.clip(jnp.rint(_avg_pool(gray, ds)), 0, 255).astype(jnp.uint8)
    binary = adaptive_threshold(
        gaussian_blur_u8(small, 5), 11, 2, method="gaussian", invert=True)

    # Strategy inputs.
    lat0 = line_lattice(binary, 31)
    lat1 = line_lattice(binary, 15, tuple(range(-45, 46, 3)))
    from sudoku_vision_tpu.cv.preprocess_v2 import preprocess_multi_strategy

    v2bin = preprocess_multi_strategy(small).binary
    lat2 = line_lattice(v2bin, 31)
    ink = (binary > 0).astype(jnp.int32)

    quads, valids, areas, fills = [], [], [], []
    for mask in (lat0, lat1, lat2, ink):
        comp, found_any = _best_component(mask, 304, 768)
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
