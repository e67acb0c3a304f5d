"""Full 360-degree rotation coverage (auto-orientation).

The line-lattice detector folds any grid rotation into its +-45-deg
bank, so a quarter-turned photo still detects and warps to an upright
lattice — but the digit glyphs come out rotated by a quarter-turn
multiple. perceive(orient="auto") classifies all four quarter-turn
readings in one CNN batch and keeps the most confident one (replaces
the reference's small-angle rotate-and-rerun, cv/grid_v2.py:346-372,
with full 360-deg coverage).

These tests photograph the SAME square synthetic scene at the four
exact quarter turns (square frame -> one compile serves all four) and
at a "rotated"-category odd angle, asserting the recognized puzzle is
upright-identical every time and that corners map back to the photo's
frame correctly.
"""

import random

import numpy as np
import pytest

from sudoku_vision_tpu.ml.generate_scenes import render_scene

SIZE = (512, 512)


@pytest.fixture(scope="module")
def scene():
    rng = random.Random(11)
    img, truth = render_scene(rng, size=SIZE, category="printed_clean")
    return img, truth


def _truth_grid(truth):
    return np.array([int(c) for c in truth["puzzle"]]).reshape(9, 9)


def _rot_point_ccw(pt, shape, k):
    """Coordinates of pixel (x, y) after np.rot90(img, k)."""
    x, y = pt
    h, w = shape[:2]
    for _ in range(k % 4):
        x, y = y, w - 1 - x
        h, w = w, h
    return np.array([x, y])


@pytest.mark.parametrize("k_img", [0, 1, 2, 3])
def test_quarter_turned_photo_recognized(scene, k_img):
    from sudoku_vision_tpu.pipeline.run_v2 import PipelineConfig, run_pipeline

    img, truth = scene
    photo = np.ascontiguousarray(np.rot90(img, k_img))
    res = run_pipeline(photo, PipelineConfig(check_quality=False))
    assert res.status == "solved", (k_img, res.status, res.error)
    want = _truth_grid(truth)
    got = res.recognized_grid
    mism = int((got != want).sum())
    assert mism == 0, (k_img, got.tolist(), want.tolist())
    # np.rot90 rotates the photo CCW by k_img quarter turns; uprighting
    # takes the complementary CCW reading.
    assert res.orientation == (4 - k_img) % 4, res.orientation
    # corners[0] is the image point of the UPRIGHT grid's top-left.
    tl_want = _rot_point_ccw(np.array(truth["corners"][0]), img.shape, k_img)
    assert np.abs(res.corners[0] - tl_want).max() < 14.0, (
        k_img, res.corners.tolist(), tl_want.tolist())


def test_rotated_category_scene_recognized():
    from sudoku_vision_tpu.pipeline.run_v2 import PipelineConfig, run_pipeline

    rng = random.Random(7)
    img, truth = render_scene(rng, size=SIZE, category="rotated")
    res = run_pipeline(img, PipelineConfig(check_quality=False))
    assert res.status == "solved", (res.status, res.error)
    assert (res.recognized_grid == _truth_grid(truth)).all()
    assert res.orientation != 0  # the odd angle really needed a turn


def test_fixed_mode_reads_sideways_garbage(scene):
    """Control: without auto-orientation a sideways photo must NOT
    silently produce the right answer (otherwise the feature tests
    above prove nothing)."""
    from sudoku_vision_tpu.pipeline.run_v2 import PipelineConfig, run_pipeline

    img, truth = scene
    photo = np.ascontiguousarray(np.rot90(img, 1))
    res = run_pipeline(photo, PipelineConfig(check_quality=False,
                                             auto_orient=False))
    want = _truth_grid(truth)
    assert res.orientation == 0
    assert (res.recognized_grid != want).any()


def test_auto_orient_boundaries_pair_with_rolled_corners(scene):
    """Code-review regression (round 5): PerceptionOutput.boundaries_y/x
    must be returned IN THE UPRIGHT FRAME like corners/cells/digits —
    feeding them with the rolled corners into the detection-free
    perceive_at must reproduce the auto reading (the pairing the
    temporal-reuse fast path is built on)."""
    import jax
    import jax.numpy as jnp

    from sudoku_vision_tpu.pipeline.graph import perceive, perceive_at
    from sudoku_vision_tpu.pipeline.run_v2 import load_model

    model, variables, temperature, _, use_clahe = load_model("v3")
    img, truth = scene
    photo = np.ascontiguousarray(np.rot90(img, 1))
    t = jnp.float32(temperature)
    full = jax.jit(lambda im: perceive(
        im, model, variables, temperature=t, use_clahe=use_clahe,
        orient="auto"))(jnp.asarray(photo))
    assert bool(full.grid_found)
    assert int(full.orientation) == 3
    # sample_mode='bilinear': the scanline extractor assumes a
    # near-axis-aligned warp; a quarter-turn-rolled homography needs
    # the general inverse-map sampler (documented on perceive_at).
    fast = jax.jit(lambda im, c, by, bx: perceive_at(
        im, c, by, bx, model, variables, temperature=t,
        use_clahe=use_clahe, sample_mode="bilinear"))(
        jnp.asarray(photo), full.corners,
        full.boundaries_y, full.boundaries_x)
    np.testing.assert_array_equal(np.asarray(full.digits),
                                  np.asarray(fast.digits))
    want = _truth_grid(truth).reshape(-1)
    got = np.asarray(fast.digits)
    nz = want != 0
    assert (got[nz] == want[nz]).mean() == 1.0
