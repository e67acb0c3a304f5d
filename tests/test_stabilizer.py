"""Stabilizer + motion detector tests (reference cv/stabilizer.py
capability: outlier rejection, min-detection stability gate, Kalman
smoothing, scan over frame batches)."""

import numpy as np

from sudoku_vision_tpu.cv.stabilizer import (
    GridStabilizer, MotionDetector, stabilize_sequence,
)

BASE = np.array([[10., 10.], [100., 12.], [98., 102.], [12., 99.]],
                np.float32)


def test_stability_requires_min_detections():
    st = GridStabilizer(min_detections=3)
    r1 = st.update(BASE)
    assert not r1.is_stable
    r2 = st.update(BASE + 0.5)
    assert not r2.is_stable
    r3 = st.update(BASE + 1.0)
    assert r3.is_stable


def test_outlier_rejected():
    st = GridStabilizer(max_jump=50.0)
    st.update(BASE)
    st.update(BASE + 1.0)
    jumped = BASE + 200.0
    r = st.update(jumped)
    assert r.rejected
    # Smoothed corners stay near the pre-jump position.
    assert np.abs(np.asarray(r.corners) - BASE).max() < 20


def test_smoothing_converges_to_observations():
    st = GridStabilizer()
    target = BASE + 5.0
    for _ in range(12):
        r = st.update(target)
    assert np.abs(np.asarray(r.corners) - target).max() < 1.0


def test_reset_clears_state():
    st = GridStabilizer(min_detections=3)
    for _ in range(4):
        st.update(BASE)
    st.reset()
    assert not st.update(BASE).is_stable


def test_scan_over_sequence_matches_streaming():
    seq = np.stack([BASE + i for i in range(6)]).astype(np.float32)
    found = np.ones(6, bool)
    batch = stabilize_sequence(seq, found)
    st = GridStabilizer()
    stream = [st.update(seq[i]) for i in range(6)]
    np.testing.assert_allclose(
        np.asarray(batch.corners)[-1], np.asarray(stream[-1].corners),
        atol=1e-4)
    assert bool(np.asarray(batch.is_stable)[-1]) == stream[-1].is_stable


def test_motion_detector_gates_on_change():
    md = MotionDetector(threshold=5.0)
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, (240, 320), np.uint8)
    assert md.update(frame) is False          # first frame: no motion
    assert md.update(frame) is False          # static scene
    moved = np.roll(frame, 40, axis=1)
    assert md.update(moved) is True           # large shift -> motion
