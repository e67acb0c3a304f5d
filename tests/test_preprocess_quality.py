"""Tests: v2 preprocessing strategies + grid-quality metrics + empty-cell
detection (reference cv/preprocess_v2.py, cv/grid_quality.py,
cv/extract.py:59 capability). Small shapes — CPU-fast."""

import numpy as np

import jax
import jax.numpy as jnp

from sudoku_vision_tpu.cv.extract import cells_empty_mask
from sudoku_vision_tpu.cv.grid_quality import (
    QualityScore, assess_grid_quality, get_user_feedback,
)
from sudoku_vision_tpu.cv.preprocess_v2 import (
    detect_glare, detect_shadow, normalize_illumination,
    preprocess_multi_strategy,
)

RNG = np.random.default_rng(7)


def synth_doc(h=128, w=128, gradient=0.0, glare=False):
    """Paper with dark print stripes; optional illumination gradient."""
    img = np.full((h, w), 225.0)
    img += RNG.normal(0, 3, (h, w))
    for r in range(8, h, 16):
        img[r:r + 2, 8:-8] = 50
    if gradient:
        img *= (1 - gradient * np.linspace(0, 1, w))[None, :]
    if glare:
        img[8:32, 8:48] = 255
    return np.clip(img, 0, 255).astype(np.uint8)


def test_glare_detection():
    assert bool(detect_glare(jnp.asarray(synth_doc(glare=True))))
    assert not bool(detect_glare(jnp.asarray(synth_doc())))


def test_shadow_detection_on_gradient():
    assert bool(detect_shadow(jnp.asarray(synth_doc(gradient=0.7))))
    assert not bool(detect_shadow(jnp.asarray(synth_doc())))


def test_normalize_illumination_flattens_gradient():
    img = synth_doc(gradient=0.5)
    norm = np.asarray(normalize_illumination(jnp.asarray(img)))
    # Background (non-stripe rows) should be much flatter after division.
    bg_rows = norm[4:6, 8:-8].astype(float)
    raw_rows = img[4:6, 8:-8].astype(float)
    assert bg_rows.std() < raw_rows.std() * 0.5


def test_multi_strategy_produces_sane_binary():
    res = jax.jit(preprocess_multi_strategy)(jnp.asarray(synth_doc()))
    binary = np.asarray(res.binary)
    assert set(np.unique(binary)) <= {0, 255}
    ink = (binary > 0).mean()
    assert 0.01 < ink < 0.4
    assert int(res.strategy) in (0, 1, 2)
    assert res.scores.shape == (3,)


def test_quality_scores_ranges_and_feedback():
    # Sharp warped grid with strong lines.
    g = np.full((450, 450), 230, np.uint8)
    for i in range(10):
        t = min(i * 50, 449)
        g[t, :] = 20
        g[:, t] = 20
    corners = jnp.asarray([[100., 100.], [550., 100.],
                           [550., 550.], [100., 550.]])
    score = jax.jit(assess_grid_quality)(jnp.asarray(g), corners)
    assert 0 <= float(score.overall) <= 100
    assert float(score.geometry) > 90      # perfect square
    assert float(score.completeness) > 60  # full grid lines
    assert float(score.selectivity) > 55   # clean grid: highly selective
    fb = get_user_feedback(QualityScore(*[np.float32(v) for v in (
        80, 80, 80, 80, 80, 80, 80)]))
    assert fb == ["Grid quality is good"]
    fb_bad = get_user_feedback(QualityScore(*[np.float32(v) for v in (
        20, 20, 20, 20, 20, 20, 20)]))
    assert len(fb_bad) >= 3
    assert any("interference" in m for m in fb_bad)


def test_selectivity_collapses_on_moire():
    """The screen-moiré failure class (VERDICT r2 #3): stripe families
    whose pitch is incommensurate with the 50-px cell lattice cover the
    expected line positions AND the mid-cell bands, so line selectivity
    collapses — while the 5 reference metrics all pass (round-2 tail
    measured overall 88 on such a frame)."""
    from sudoku_vision_tpu.cv.grid_quality import compute_selectivity

    g = np.full((450, 450), 230, np.uint8)
    for t in range(0, 450, 7):   # horizontal stripes at 7-px pitch
        g[t:t + 2, :] = 40
    for t in range(0, 450, 11):  # vertical stripes at 11-px pitch
        g[:, t:t + 2] = 40
    from sudoku_vision_tpu.pipeline.run_v2 import PipelineConfig

    gate = PipelineConfig().min_selectivity
    sel = float(jax.jit(compute_selectivity)(jnp.asarray(g)))
    assert sel < gate, (sel, gate)

    # Same stripes PLUS a real grid still reads as interference: the
    # off-bands stay stripe-covered.
    for i in range(10):
        t = min(i * 50, 449)
        g[t - 1:t + 1, :] = 20
        g[:, t - 1:t + 1] = 20
    sel = float(jax.jit(compute_selectivity)(jnp.asarray(g)))
    assert sel < 25, sel


def test_empty_mask_separates_digits_from_ghosts():
    cells = np.full((81, 28, 28), 220, np.uint8)
    cells += RNG.integers(-4, 5, cells.shape).astype(np.uint8)
    # cells 0..8: real dark digit strokes
    for i in range(9):
        cells[i, 8:20, 12:16] = 30
    # cells 9..17: faint ghosts (only ~25 below paper)
    for i in range(9, 18):
        cells[i, 8:20, 12:16] = 195
    mask = np.asarray(jax.jit(cells_empty_mask)(jnp.asarray(cells)))
    assert not mask[:9].any()      # digits detected as non-empty
    assert mask[9:18].all()        # ghosts stay empty
    assert mask[18:].all()         # plain paper is empty


def test_empty_mask_rejects_mid_contrast_ghosts_in_normal_light():
    """Advisor regression (round-4 ADVICE #1): a show-through ghost
    25-45 below bright paper must NOT trip the adaptive ink depth —
    adaptation is gated on compressed illumination (dark paper)."""
    cells = np.full((81, 28, 28), 220, np.uint8)
    cells += RNG.integers(-4, 5, cells.shape).astype(np.uint8)
    # cells 0..8: mid-contrast ghosts (35 below paper — inside the
    # (depth_floor, min_ink_depth] band the ungated adaptive cut let in)
    for i in range(9):
        cells[i, 8:20, 10:18] = 185
    # cells 9..17: ghosts right at the old fixed cut (44 below paper)
    for i in range(9, 18):
        cells[i, 8:20, 10:18] = 176
    mask = np.asarray(jax.jit(cells_empty_mask)(jnp.asarray(cells)))
    assert mask.all()              # every cell stays empty


def test_empty_mask_low_light_adaptation_still_admits_strokes():
    """The s077_low_light fix must survive the ghost gate: dark paper
    (median < gate) keeps per-cell contrast adaptation, so compressed
    strokes below the fixed 45 cut still read as ink, while a ghost
    compressed by the same light stays below the floor."""
    cells = np.full((81, 28, 28), 100, np.uint8)   # 0.45x-lit paper
    cells += RNG.integers(-4, 5, cells.shape).astype(np.uint8)
    # cells 0..8: compressed print strokes, depth 35 < 45
    for i in range(9):
        cells[i, 8:20, 12:16] = 65
    # cells 9..17: ghosts compressed along with the light (depth ~20)
    for i in range(9, 18):
        cells[i, 8:20, 10:18] = 80
    mask = np.asarray(jax.jit(cells_empty_mask)(jnp.asarray(cells)))
    assert not mask[:9].any()      # compressed digits still detected
    assert mask[9:18].all()        # compressed ghosts stay empty
    assert mask[18:].all()
