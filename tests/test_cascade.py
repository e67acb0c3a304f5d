"""Detection-cascade tests: the v2 multi-strategy detector and its
wiring as run_v2's host-side fallback chain.

The scenes are constructed so the PRIMARY detector genuinely fails
(dashed grid lines break the 31-px morphological opening) and a
specific fallback strategy recovers — the failure mode the cascade
exists for (reference cv/grid_v2.py:401: contour -> Hough -> rotation
-> Harris/RANSAC, each bringing different physics).
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from sudoku_vision_tpu.cv.grid import detect_grid_full
from sudoku_vision_tpu.cv.grid_v2 import (
    METHODS,
    STRATEGY_PARAMS,
    detect_grid,
    detect_grid_harris,
    is_valid_quadrilateral,
)

SIZE, ORIGIN, PITCH, NLINES = 360, 40, 31, 10
EXTENT = (NLINES - 1) * PITCH  # 279


def solid_grid() -> np.ndarray:
    img = np.full((SIZE, SIZE), 255, np.uint8)
    for i in range(NLINES):
        p = ORIGIN + i * PITCH
        img[p - 1:p + 1, ORIGIN:ORIGIN + EXTENT + 1] = 0
        img[ORIGIN:ORIGIN + EXTENT + 1, p - 1:p + 1] = 0
    return img


def dashed_grid(dash: int, gap: int) -> np.ndarray:
    img = np.full((SIZE, SIZE), 255, np.uint8)
    end = ORIGIN + EXTENT
    for i in range(NLINES):
        p = ORIGIN + i * PITCH
        for s in range(ORIGIN, end, dash + gap):
            e = min(s + dash, end + 1)
            img[p - 1:p + 1, s:e] = 0
            img[s:e, p - 1:p + 1] = 0
        # Cap the line ends: the grid's outer corners must exist as ink
        # (a dash phase that leaves the corner blank is a generator
        # artifact, not a detector failure mode).
        img[p - 1:p + 1, end - dash:end + 1] = 0
        img[end - dash:end + 1, p - 1:p + 1] = 0
    return img


def corners_close(corners, tol=6.0) -> bool:
    expected = np.array([[ORIGIN, ORIGIN],
                         [ORIGIN + EXTENT, ORIGIN],
                         [ORIGIN + EXTENT, ORIGIN + EXTENT],
                         [ORIGIN, ORIGIN + EXTENT]], np.float32)
    return bool(np.abs(np.asarray(corners) - expected).max() <= tol)


def test_harris_detects_clean_grid():
    corners, found = detect_grid_harris(jnp.asarray(solid_grid()))
    assert bool(found)
    assert corners_close(corners)


def test_cascade_prefers_primary_on_clean_grid():
    det = detect_grid(jnp.asarray(solid_grid()))
    assert bool(det.found)
    assert int(det.method) == 0 and METHODS[int(det.method)] == "lattice"
    assert float(det.confidence) == pytest.approx(0.9)
    assert corners_close(det.corners)
    assert bool(is_valid_quadrilateral(det.corners))


def test_relaxed_lattice_recovers_dashed_grid():
    """dash=14/gap=8 kills the 31-px opening but not the 15-px one."""
    img = jnp.asarray(dashed_grid(14, 8))
    assert not bool(detect_grid_full(img)[0].found)
    det1 = detect_grid_full(img, **STRATEGY_PARAMS[1])[0]
    assert bool(det1.found)
    assert corners_close(det1.corners)
    cas = detect_grid(img)
    assert bool(cas.found)
    assert METHODS[int(cas.method)] == "lattice_relaxed"


def test_harris_recovers_when_all_lattices_fail():
    """dash=10/gap=12 breaks even the relaxed opening; corner physics
    (structure tensor) is what survives."""
    img = jnp.asarray(dashed_grid(10, 12))
    for strat in range(3):
        assert not bool(
            detect_grid_full(img, **STRATEGY_PARAMS.get(strat, {}))[0].found)
    cas = detect_grid(img)
    assert bool(cas.found)
    assert METHODS[int(cas.method)] == "harris_ransac"
    assert corners_close(cas.corners, tol=8.0)


def test_run_v2_fallback_chain_recovers():
    """Flagship-path wiring: run_pipeline's host-side retry loop must
    recover the dashed grid via the relaxed-lattice strategy and carry
    the winning method name in the result."""
    from sudoku_vision_tpu.pipeline.run_v2 import PipelineConfig, run_pipeline

    img = dashed_grid(14, 8)
    res = run_pipeline(img, PipelineConfig(auto_orient=False,
                                           check_quality=False))
    assert res.status != "detection_failed"
    assert res.detect_method == "lattice_relaxed"
    assert corners_close(res.corners)

    res0 = run_pipeline(
        img, PipelineConfig(auto_orient=False, check_quality=False,
                            cascade=False))
    assert res0.status == "detection_failed"


def test_run_v2_primary_reports_lattice():
    from sudoku_vision_tpu.pipeline.run_v2 import PipelineConfig, run_pipeline

    res = run_pipeline(solid_grid(), PipelineConfig(auto_orient=False,
                                                    check_quality=False))
    assert res.detect_method == "lattice"
    assert res.status != "detection_failed"
