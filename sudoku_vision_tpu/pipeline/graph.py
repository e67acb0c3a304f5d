"""The fused perception graph: decoded frame -> 81 digit logits.

This is the TPU-native replacement for the reference's CV+ML stages
(reference pipeline/run.py:244 run_pipeline: preprocess -> detect ->
warp -> extract -> 81 single-sample CNN calls): everything between the
uint8 frame in HBM and the (81, 10) logit tensor is ONE jit graph — no
host round-trips, no per-cell Python loop. Batched variants vmap the
whole graph over a frame axis.

Outputs are fixed-shape; detection failure is a boolean in the result,
never an exception (XLA-friendly control flow).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from sudoku_vision_tpu import ops
from sudoku_vision_tpu.cv.extract import (
    cells_empty_mask,
    extract_cells,
    preprocess_cells_for_model,
    refine_boundaries,
)
from sudoku_vision_tpu.cv.grid import GridDetection, detect_grid_full


class PerceptionOutput(NamedTuple):
    logits: jnp.ndarray        # (81, 10) float32
    probs: jnp.ndarray         # (81, 10) float32 softmax
    digits: jnp.ndarray        # (81,) int32 argmax with empty override
    confidence: jnp.ndarray    # (81,) float32 max prob (1.0 for empty cells)
    empty_mask: jnp.ndarray    # (81,) bool
    corners: jnp.ndarray       # (4, 2) float32
    grid_found: jnp.ndarray    # () bool
    cells: jnp.ndarray         # (81, 28, 28) uint8 raw cell crops
    orientation: jnp.ndarray   # () int32 quarter-turns CCW applied (0..3)
    boundaries_y: jnp.ndarray  # (10,) float32 refined warp-space rows
    boundaries_x: jnp.ndarray  # (10,) float32 refined warp-space cols


def perceive(
    img: jnp.ndarray,
    model,
    variables,
    warp_size: int = 450,
    cell_size: int = 28,
    temperature=None,
    use_clahe: bool = True,
    detect_width: int = 950,
    cell_width: int = 950,
    sample_mode: str = "scanline",
    orient: str = "fixed",
    packed_bgr: bool = False,
    detect_strategy: int = 0,
    aux17=None,
) -> PerceptionOutput:
    """Full perception for one uint8 frame (H, W, 3) BGR or (H, W) gray.

    packed_bgr=True takes the frame as ROW-PACKED BGR (H, W*3) uint8 —
    the raw decoder byte order, a free np.reshape on host — and routes
    the gray+pool stage through the Pallas streaming kernel
    (ops/pallas_pool.py). This is the hot serving layout: a
    device-side (H, W, 3) -> (H, W*3) reshape would retile the minor
    dims at 0.17 ms/frame, so batched callers (bench.py, serve,
    video) pack on host instead.

    orient="auto" adds full 360-deg rotation coverage: the line-lattice
    detector is rotation-complete (the two perpendicular line families
    always fold into its +-45-deg bank), but a photo rotated beyond
    +-45 deg warps to an upright grid whose DIGITS are rotated by a
    quarter-turn multiple. Auto mode classifies all four quarter-turn
    readings of the warped grid in one CNN batch (4x81 cells — grid
    positions and glyph pixels rotate together) and keeps the reading
    with the highest mean digit confidence; digits, probs, empty mask,
    cells and corners are all returned in the chosen upright frame.
    This replaces the reference's rotate-and-rerun strategy
    (reference cv/grid_v2.py:346-372, limited to small angles) with a
    single fixed-shape graph. Cost: 3 extra CNN passes on an (81, 28,
    28) batch — negligible next to detection.

    Detection and cell sampling can run at SEPARATE pyramid scales:
    detection only needs the grid lines resolvable, while cell crops
    need <2 px sampling stride or nearest-neighbor taps alias thin
    strokes away (measured: digits collapse at stride ~2.4). Both
    default to 950 px: a 720-px detect level (57% of the per-pixel
    cost) was A/B-tested and rejected for now — at 730 px the glyph
    gaps of header text close under pooling and the text becomes a
    lattice-crossing blob that steals the top-left extreme point on
    goldens 4/5 (and the facing page's grid bridges the region flood);
    see PLAN.md round-2 notes before retrying. (Half-scale-everything
    was likewise rejected: grid lines drop below 1 px at ds=8 and the
    lattice collapses.)

    detect_strategy selects the grid detector (cv/grid_v2.py's cascade,
    reference cv/grid_v2.py:401): 0 = primary line-lattice (the hot
    path), 1 = relaxed lattice (short openings, dense angle bank — for
    broken/faint lines), 2 = lattice on the multi-strategy v2 binary
    (illumination/shadow), 3 = Harris+RANSAC. All lattice strategies run
    through detect_grid_full, so the dark-ink/interior-line gates and
    peel_stolen_corners hardening apply uniformly. run_v2 drives 1-3 as
    a host-side fallback chain on found=False; each strategy is its own
    cached jit (cold-path compile, zero hot-path cost).
    """
    strategy_kw = {}
    if detect_strategy in (1, 2):
        from sudoku_vision_tpu.cv.grid_v2 import STRATEGY_PARAMS

        strategy_kw = STRATEGY_PARAMS[detect_strategy]
    if img.ndim == 3 or packed_bgr:
        if packed_bgr:
            assert img.ndim == 2 and img.shape[1] % 3 == 0, img.shape
            gh, gw = img.shape[0], img.shape[1] // 3
            from sudoku_vision_tpu.ops.pallas_pool import \
                pooled_gray_packed

            def pool(x, f):
                return pooled_gray_packed(x, f)
        else:
            gh, gw = img.shape[:2]
            pool = ops.pooled_gray
        ds_det0 = max(1, round(max(gh, gw) / detect_width))
        ds_cell = max(1, round(max(gh, gw) / cell_width))
        gray_det = pool(img, ds_det0)
        # The detector's constants were calibrated on ~950-px pooled
        # frames; rescale them by the ACHIEVED pooling ratio vs that
        # baseline (for small inputs both targets give ds=1 — the image
        # is untouched and the constants must be too).
        ds_calib = max(1, round(max(gh, gw) / 950.0))
        if detect_strategy == 3:
            from sudoku_vision_tpu.cv.grid_v2 import detect_grid_harris_small

            det, lat_h, lat_v, ds_inner = (
                detect_grid_harris_small(gray_det), None, None, 1)
        else:
            det, lat_h, lat_v, ds_inner, _ = detect_grid_full(
                gray_det, calib_scale=ds_calib / ds_det0, **strategy_kw)
        ds_det = ds_det0 * ds_inner
        # Cells sample a finer level (XLA CSEs the two pools if equal).
        small = (gray_det if ds_cell == ds_det0
                 else pool(img, ds_cell))
        ds = ds_cell
        # Corners come back in gray_det coords; lift to full-res.
        det = det._replace(
            corners=det.corners * float(ds_det0) + (ds_det0 - 1) / 2.0)
    else:
        if detect_strategy == 3:
            from sudoku_vision_tpu.cv.grid import _avg_pool
            from sudoku_vision_tpu.cv.grid_v2 import detect_grid_harris_small

            gh, gw = img.shape
            ds_det = max(1, round(max(gh, gw) / detect_width))
            small = jnp.clip(jnp.rint(_avg_pool(img, ds_det)),
                             0, 255).astype(jnp.uint8)
            det, lat_h, lat_v = detect_grid_harris_small(small), None, None
            det = det._replace(
                corners=det.corners * float(ds_det) + (ds_det - 1) / 2.0)
        else:
            det, lat_h, lat_v, ds_det, small = detect_grid_full(
                img, **strategy_kw)
        ds = ds_det
    m = ops.homography_from_corners(det.corners, (warp_size, warp_size))
    m_inv = jnp.linalg.inv(m)
    # Snap cell boundaries to the detected grid lines (page-curvature
    # fix) — lattice strategies only; Harris has no lattices, so cells
    # fall back to uniform boundaries.
    if lat_h is None:
        b_y = b_x = None
    else:
        b_y, b_x = refine_boundaries(lat_h, lat_v, m_inv, ds_det, warp_size)
    # Sample cells from the detect-scale image: at 28px per ~40px cell it
    # loses nothing, and gathers from a table that fits VMEM run far
    # faster than random access into the 10-megapixel frame.
    # x_small = (x_full - (ds-1)/2) / ds (pixel-center alignment of the
    # area-averaged pyramid level): fold into the projective rows.
    off = (ds - 1) / 2.0
    m_inv_small = jnp.stack([
        (m_inv[0] - off * m_inv[2]) / ds,
        (m_inv[1] - off * m_inv[2]) / ds,
        m_inv[2],
    ])
    cells = extract_cells(small, m_inv_small, warp_size, cell_size,
                          boundaries_y=b_y, boundaries_x=b_x,
                          sample_mode=sample_mode)
    empty = cells_empty_mask(cells)
    x = preprocess_cells_for_model(cells, use_clahe)

    def apply_model(inp):
        return model.apply(variables, inp, temperature=temperature) \
            if _accepts_temperature(model) else model.apply(variables, inp)

    corners = det.corners
    orientation = jnp.int32(0)
    if orient == "auto":
        s = cell_size

        def quarter_turns(arr81, k):
            """Rotate grid positions AND glyph pixels together by k CCW.

            A photo rotated 90k deg clockwise warps to rot90^k of the
            upright grid, so one rot90 over the (9, 9) cell axes plus
            one over the pixel axes recovers the upright reading.
            """
            g = arr81.reshape((9, 9) + arr81.shape[1:])
            g = jnp.rot90(g, k, axes=(0, 1))
            if g.ndim >= 4:
                g = jnp.rot90(g, k, axes=(2, 3))
            return g.reshape(arr81.shape)

        xs = jnp.concatenate([quarter_turns(x, k) for k in range(4)])
        logits4 = apply_model(xs).reshape(4, 81, 10)
        probs4 = jax.nn.softmax(logits4, axis=-1)
        empty4 = jnp.stack([quarter_turns(empty, k) for k in range(4)])
        # Mean best DIGIT-class probability over non-empty cells:
        # "confidently empty" readings of rotated glyphs must not score.
        nz = (~empty4).astype(jnp.float32)
        score = (probs4[..., 1:].max(-1) * nz).sum(-1) \
            / jnp.maximum(nz.sum(-1), 1.0)
        orientation = jnp.argmax(score).astype(jnp.int32)
        logits = jnp.take(logits4, orientation, axis=0)
        probs = jnp.take(probs4, orientation, axis=0)
        empty = jnp.take(empty4, orientation, axis=0)
        cells = jnp.take(
            jnp.stack([quarter_turns(cells, k) for k in range(4)]),
            orientation, axis=0)
        # corners[0] must be the image point of the upright grid's tl:
        # after k quarter-turns that is image-frame corner k (tl->tr->..).
        corners = jnp.take(
            jnp.stack([jnp.roll(det.corners, -k, axis=0)
                       for k in range(4)]), orientation, axis=0)
        x_sel = jnp.take(xs.reshape((4, 81) + xs.shape[1:]),
                         orientation, axis=0)
        # Boundaries must rotate WITH the upright reading (they pair
        # with the rolled corners for perceive_at): after k CCW
        # quarter-turns, upright[r, c] = orig rot90^k, so upright row
        # boundary i maps from the original column boundary 9-i
        # mirrored across the warp (and analogously per k).
        if b_y is not None:
            ws = jnp.float32(warp_size)
            byv = jnp.stack([b_y, ws - b_x[::-1], ws - b_y[::-1], b_x])
            bxv = jnp.stack([b_x, b_y, ws - b_x[::-1], ws - b_y[::-1]])
            b_y = jnp.take(byv, orientation, axis=0)
            b_x = jnp.take(bxv, orientation, axis=0)
        probs = blend_17(probs, x_sel, aux17)
        if aux17 is not None:
            # keep logits consistent with the blended probs (same
            # softmax, same argmax) — a consumer recomputing
            # probabilities from logits must not silently revert the
            # 1v7 re-split
            logits = jnp.log(probs)
    else:
        logits = apply_model(x)
        probs = jax.nn.softmax(logits, axis=-1)
        probs = blend_17(probs, x, aux17)
        if aux17 is not None:
            logits = jnp.log(probs)   # consistency (see auto branch)
    raw_digits = jnp.argmax(probs, axis=-1).astype(jnp.int32)
    digits = jnp.where(empty, 0, raw_digits)
    conf = jnp.where(empty, 1.0, probs.max(axis=-1))
    nominal = jnp.arange(10, dtype=jnp.float32) * (warp_size / 9.0)
    return PerceptionOutput(
        logits=logits, probs=probs, digits=digits, confidence=conf,
        empty_mask=empty, corners=corners, grid_found=det.found,
        cells=cells, orientation=orientation,
        boundaries_y=nominal if b_y is None else b_y,
        boundaries_x=nominal if b_x is None else b_x)


def blend_17(probs: jnp.ndarray, x: jnp.ndarray, aux17,
             conf_gate: float = 0.7) -> jnp.ndarray:
    """Low-confidence {1,7} reads get their joint probability mass
    re-split by the 1-vs-7 specialist (ml/disambig17.py).

    Gated hard: only cells whose TOP class is 1 or 7 below `conf_gate`
    are touched, and only the mass already on classes 1+7 moves —
    every other read (and every other class probability) is
    bit-identical, so the flagship's calibrated behavior cannot
    regress outside the marginal set this targets (the standing
    handwritten 1->7 wrong-solve tail; see the module docstring's
    negative-result history of flagship fine-tunes).

    MEASURED NEGATIVE — do not widen the gate to confident-specialist
    disagreements: a variant that also fired when the specialist's
    posterior was >= 0.9 (to catch the flagship's systematic
    handwritten 1->7 at conf 0.97, golden scene_033 cell 6, which it
    DID fix) flipped true screen-rendered 7s to 1s — a domain the
    print+stroke-trained specialist never saw — costing sweep 7000
    130->127/130 (three screen scenes) and golden e2e 52->51 solved
    with 4 new 7->1 confusions. The low-confidence-only gate keeps
    every sweep perfect (7000 130/130, 90210 129/130 with s099 fixed,
    81521 32/32, e2e 52/52); the one confident flagship error left is
    recovered downstream by solver escalation."""
    if aux17 is None:
        return probs
    model17, vars17 = aux17
    q = jax.nn.softmax(model17.apply(vars17, x), axis=-1)[..., 0]
    top = jnp.argmax(probs, axis=-1)
    blend = (((top == 1) | (top == 7))
             & (probs.max(axis=-1) < conf_gate))
    mass = probs[..., 1] + probs[..., 7]
    p1 = jnp.where(blend, mass * q, probs[..., 1])
    p7 = jnp.where(blend, mass * (1.0 - q), probs[..., 7])
    return probs.at[..., 1].set(p1).at[..., 7].set(p7)


def _accepts_temperature(model) -> bool:
    import inspect

    try:
        return "temperature" in inspect.signature(model.__call__).parameters
    except (TypeError, ValueError):
        return False


def perceive_batch(imgs: jnp.ndarray, model, variables, **kw):
    """vmap of perceive over a leading frame axis (N, H, W[, 3])."""
    return jax.vmap(lambda im: perceive(im, model, variables, **kw))(imgs)


def perceive_at(
    img: jnp.ndarray,
    corners: jnp.ndarray,
    boundaries_y: jnp.ndarray,
    boundaries_x: jnp.ndarray,
    model,
    variables,
    warp_size: int = 450,
    cell_size: int = 28,
    temperature=None,
    use_clahe: bool = True,
    cell_width: int = 950,
    sample_mode: str = "scanline",
    packed_bgr: bool = False,
    aux17=None,
) -> PerceptionOutput:
    """Perception with detection SKIPPED: warp -> extract -> CNN from
    corners + refined boundaries produced by a previous full
    ``perceive`` of the same scene.

    The temporal-reuse fast path for streaming sessions: once the
    corner stabilizer is locked and the motion gate is quiet, the
    corners CANNOT have moved — yet detection (the most expensive
    stage, ~40% of the frame budget) was re-run on every frame. The
    reference built exactly this state machine (reference
    cv/stabilizer.py:161 Kalman lock, :251 MotionDetector pause,
    ios ScanPipeline.swift:245 3-stable-frames gate) but never used it
    to skip work. Sessions fall back to the full graph on motion,
    instability, or a digits change (serve.server.ScanSession).

    Fixed orientation only: a locked scene's orientation was resolved
    at lock time; orient="auto" engines keep the full graph. When fed
    the ROLLED corners + rotated boundaries an auto perceive returns
    (orientation != 0), pass sample_mode="bilinear": the default
    scanline extractor assumes a near-axis-aligned warp and cannot
    represent a quarter-turned homography
    (tests/test_orientation.py::test_auto_orient_boundaries_pair...).
    """
    if img.ndim == 3 or packed_bgr:
        if packed_bgr:
            assert img.ndim == 2 and img.shape[1] % 3 == 0, img.shape
            gh, gw = img.shape[0], img.shape[1] // 3
            from sudoku_vision_tpu.ops.pallas_pool import \
                pooled_gray_packed

            def pool(x, f):
                return pooled_gray_packed(x, f)
        else:
            gh, gw = img.shape[:2]
            pool = ops.pooled_gray
        ds = max(1, round(max(gh, gw) / cell_width))
        small = pool(img, ds)
    else:
        from sudoku_vision_tpu.cv.grid import _avg_pool

        gh, gw = img.shape
        ds = max(1, round(max(gh, gw) / cell_width))
        small = jnp.clip(jnp.rint(_avg_pool(img, ds)),
                         0, 255).astype(jnp.uint8)

    corners = jnp.asarray(corners, jnp.float32)
    m = ops.homography_from_corners(corners, (warp_size, warp_size))
    m_inv = jnp.linalg.inv(m)
    off = (ds - 1) / 2.0
    m_inv_small = jnp.stack([
        (m_inv[0] - off * m_inv[2]) / ds,
        (m_inv[1] - off * m_inv[2]) / ds,
        m_inv[2],
    ])
    b_y = jnp.asarray(boundaries_y, jnp.float32)
    b_x = jnp.asarray(boundaries_x, jnp.float32)
    cells = extract_cells(small, m_inv_small, warp_size, cell_size,
                          boundaries_y=b_y, boundaries_x=b_x,
                          sample_mode=sample_mode)
    empty = cells_empty_mask(cells)
    x = preprocess_cells_for_model(cells, use_clahe)
    logits = (model.apply(variables, x, temperature=temperature)
              if _accepts_temperature(model)
              else model.apply(variables, x))
    probs = jax.nn.softmax(logits, axis=-1)
    probs = blend_17(probs, x, aux17)
    if aux17 is not None:
        logits = jnp.log(probs)       # consistency (see perceive)
    raw_digits = jnp.argmax(probs, axis=-1).astype(jnp.int32)
    digits = jnp.where(empty, 0, raw_digits)
    conf = jnp.where(empty, 1.0, probs.max(axis=-1))
    return PerceptionOutput(
        logits=logits, probs=probs, digits=digits, confidence=conf,
        empty_mask=empty, corners=corners,
        grid_found=jnp.bool_(True), cells=cells,
        orientation=jnp.int32(0), boundaries_y=b_y, boundaries_x=b_x)
