"""Video-chunk pipeline tests (pipeline/video.py).

Covers the iOS-analog live path end-to-end on synthetic clips: the
3-identical-consecutive-grids stability gate (reference ios
ScanPipeline.swift:245 checkStability), gating on detection failures,
the required_stable knob, one solve per stable segment, and the CLI.
Frames are rendered by ml/generate_scenes at the same (480, 640) size
the multichip tests use (shared compile cache).
"""

import numpy as np
import pytest

from sudoku_vision_tpu.ml.generate_scenes import render_scene
from sudoku_vision_tpu.pipeline.video import process_frames

SIZE = (480, 640)
SEED = 20260819


@pytest.fixture(scope="module")
def scene():
    frame, truth = render_scene(SEED, size=SIZE, category="printed_clean")
    return np.asarray(frame), truth


@pytest.fixture(scope="module")
def blank():
    return np.full((*SIZE, 3), 235, np.uint8)


def test_stability_gate_fires_after_three_identical(scene, blank):
    frame, truth = scene
    frames = np.stack([blank, frame, frame, frame, frame, frame])
    res = process_frames(frames, required_stable=3)
    assert res.n_frames == 6
    # found[0] is False; identical reads start at frame 1, so the run
    # reaches 3 at frame 3 — the gate must fire there, not earlier.
    assert res.stable_frame == 3
    assert res.status == "solved"
    assert res.recognized_grid is not None
    expected = np.array([int(c) for c in truth["puzzle"]]).reshape(9, 9)
    assert np.array_equal(res.recognized_grid, expected)
    sol = np.array([int(c) for c in truth["solution"]]).reshape(9, 9)
    assert np.array_equal(res.solved_grid, sol)


def test_unstable_chunk_never_solves(scene, blank):
    frame, _ = scene
    other, _ = render_scene(SEED + 1, size=SIZE, category="printed_clean")
    frames = np.stack([frame, np.asarray(other)] * 3)
    res = process_frames(frames, required_stable=3)
    assert res.stable_frame is None
    assert res.status == "unstable"
    assert res.solved_grid is None
    assert res.per_frame_digits.shape == (6, 81)


def test_required_stable_knob(scene, blank):
    frame, _ = scene
    frames = np.stack([frame, frame, blank, blank, blank, blank])
    # Two identical frames satisfy required_stable=2 at frame 1...
    res2 = process_frames(frames, required_stable=2)
    assert res2.stable_frame == 1
    # ...but not required_stable=3 (the grid disappears afterwards).
    res3 = process_frames(frames, required_stable=3)
    assert res3.stable_frame is None and res3.status == "unstable"


def test_small_jitter_keeps_gate_stable(scene, blank):
    """1-px camera jitter must not break digit-grid equality (the gate
    compares DIGITS, not corners — corner smoothing is the stabilizer's
    job, reference cv/stabilizer.py)."""
    frame, truth = scene
    j1 = np.roll(frame, 1, axis=0)
    j2 = np.roll(frame, 1, axis=1)
    frames = np.stack([blank, frame, j1, j2, frame, j1])
    res = process_frames(frames, required_stable=3)
    assert res.stable_frame == 3
    assert res.status == "solved"
    expected = np.array([int(c) for c in truth["puzzle"]]).reshape(9, 9)
    assert np.array_equal(res.recognized_grid, expected)


def test_cli_roundtrip(tmp_path, scene, blank):
    from sudoku_vision_tpu.pipeline.video import main
    from sudoku_vision_tpu.utils.imageio import save_image

    frame, _ = scene
    paths = []
    for i, f in enumerate([blank, frame, frame, frame, frame, frame]):
        p = tmp_path / f"f{i}.png"
        save_image(str(p), f)
        paths.append(str(p))
    assert main(paths) == 0
