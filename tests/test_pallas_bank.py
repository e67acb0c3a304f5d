"""Bit-parity of the VMEM-resident packed line bank (ops/pallas_bank.py)
against the production XLA formulation (cv/grid.py's packed bank).

Runs the Pallas kernel in interpret mode on CPU (conftest forces the
CPU platform). The real-TPU outcome (2026-08-21): the monolithic
kernel never returns from the Mosaic compile service, but the
per-angle split variant compiles, is BIT-IDENTICAL to the XLA bank on
the real chip, and races it to a wash — so the production path stays
XLA and this module is the executed negative-result record (see
STATUS in ops/pallas_bank.py). Inputs here are structured masks
(lines at several angles) AND adversarial random ink, at a
non-128-multiple width so the lane-pad masking is exercised.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from sudoku_vision_tpu.cv.grid import (
    _directional_open_packed, _pack_bits, _unpack_bits, _window_or_packed,
)
from sudoku_vision_tpu.ops.pallas_bank import (
    _offsets, _shift_plan, line_bank_packed_pallas,
    line_bank_packed_pallas_split,
)

ANGLES = tuple(range(-45, 46, 15))  # coarse bank: keeps interpret fast
LENGTH = 31


def xla_bank(packed, length, angles):
    """The production formulation (cv/grid.py::_line_lattice_hv_packed
    body, minus the pack/unpack ends)."""
    import math

    thick_h = _window_or_packed(packed, 3, 1)
    thick_v = _window_or_packed(packed, 3, 2)
    lat_h = jnp.zeros_like(packed)
    lat_v = jnp.zeros_like(packed)
    for a in angles:
        s = math.tan(math.radians(a))
        lat_h = lat_h | _directional_open_packed(
            thick_h, s, length, vertical=False)
        lat_v = lat_v | _directional_open_packed(
            thick_v, s, length, vertical=True)
    return lat_h, lat_v


def scene_mask(h, w, seed):
    """Synthetic ink: a grid of lines + a skewed line + random specks."""
    rng = np.random.default_rng(seed)
    m = np.zeros((h, w), np.uint8)
    for y in range(10, h, 37):
        m[y, 5:w - 5] = 1
    for x in range(12, w, 41):
        m[8:h - 8, x] = 1
    # ~20-degree line
    for t in range(min(h, w) - 20):
        y, x = 10 + t, 10 + int(round(t * 0.36))
        if y < h and x < w:
            m[y, x] = 1
    m |= (rng.random((h, w)) < 0.02).astype(np.uint8)
    # Ink hugging every border (exercises the out-of-frame fills).
    m[0, :] = 1
    m[:, w - 1] = 1
    return m


@pytest.mark.parametrize("hw", [(96, 200), (120, 128)])
def test_bank_bit_parity(hw):
    h, w = hw
    frames = np.stack([scene_mask(h, w, s) for s in range(3)])
    packed = _pack_bits(jnp.asarray(frames, jnp.uint32))
    want_h, want_v = xla_bank(packed, LENGTH, ANGLES)
    got_h, got_v = line_bank_packed_pallas(
        packed, LENGTH, ANGLES, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_h), np.asarray(want_h))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))


def test_split_bank_bit_parity():
    """The per-angle split (the variant that actually compiles on TPU —
    see STATUS in ops/pallas_bank.py) is exactly the monolithic bank:
    splitting a union of per-angle openings over pallas_calls is a pure
    OR re-association."""
    h, w = 96, 200
    frames = np.stack([scene_mask(h, w, s) for s in range(3)])
    packed = _pack_bits(jnp.asarray(frames, jnp.uint32))
    want_h, want_v = xla_bank(packed, LENGTH, ANGLES)
    got_h, got_v = line_bank_packed_pallas_split(
        packed, LENGTH, ANGLES, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_h), np.asarray(want_h))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))


def test_bank_parity_random_ink():
    rng = np.random.default_rng(0)
    frames = (rng.random((2, 64, 150)) < 0.35).astype(np.uint32)
    packed = _pack_bits(jnp.asarray(frames))
    want_h, want_v = xla_bank(packed, 15, (-30, 0, 30))
    got_h, got_v = line_bank_packed_pallas(
        packed, 15, (-30, 0, 30), interpret=True)
    np.testing.assert_array_equal(np.asarray(got_h), np.asarray(want_h))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))


def test_unpack_roundtrip_consistency():
    """The kernel consumes exactly what _pack_bits produces; sanity-pin
    the pack/unpack pair so a layout change there can't silently
    invalidate the parity tests above."""
    rng = np.random.default_rng(1)
    frames = (rng.random((5, 16, 140)) < 0.5).astype(np.uint32)
    packed = _pack_bits(jnp.asarray(frames))
    back = _unpack_bits(packed, 5)
    np.testing.assert_array_equal(np.asarray(back),
                                  frames.astype(np.int8))


def test_shift_plan_matches_grid():
    from sudoku_vision_tpu.cv import grid as G
    import math

    for length in (15, 31):
        shifts = []
        covered = 1
        while covered < length:
            s = min(covered, length - covered)
            shifts.append(s)
            covered += s
        assert _shift_plan(length) == shifts
        offs = _offsets((25,), length, vertical=False)[0]
        s = math.tan(math.radians(25))
        assert offs == [(int(round(k * s)), k) for k in shifts]
