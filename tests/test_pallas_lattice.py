"""Pallas line-bank kernel vs the XLA implementation (interpret mode on
CPU; the compiled path is exercised on TPU in dev runs). Interior pixels
must match exactly; the pallas path conservatively drops lines within
`length` of the right/bottom frame edge (documented difference)."""

import numpy as np

import jax
import jax.numpy as jnp

from sudoku_vision_tpu.cv.grid import line_lattice_hv
from sudoku_vision_tpu.ops.pallas_lattice import (
    _shift_plan, line_lattice_hv_pallas,
)


def test_shift_plan_covers_length():
    for length in (2, 5, 15, 31, 32, 33):
        assert 1 + sum(_shift_plan(length)) == length


def test_pallas_matches_xla_interior():
    rng = np.random.default_rng(0)
    img = np.zeros((64, 128), np.uint8)
    img[40, 10:120] = 255                      # horizontal line
    img[10:60, 60] = 255                       # vertical line
    for r in range(20, 50):                    # slanted line
        img[r, int(90 + 0.35 * (r - 20))] = 255
    img[(rng.random((64, 128)) < 0.02)] = 255  # speckle

    angles = tuple(range(-30, 31, 15))
    ah, av = jax.jit(
        lambda b: line_lattice_hv(b, 15, angles))(jnp.asarray(img))
    bh, bv = line_lattice_hv_pallas(jnp.asarray(img), 15, angles,
                                    interpret=True)
    # Interior (away from right/bottom pad band) must agree exactly.
    sl = (slice(0, 64 - 16), slice(0, 128 - 16))
    np.testing.assert_array_equal(np.asarray(ah)[sl], np.asarray(bh)[sl])
    np.testing.assert_array_equal(np.asarray(av)[sl], np.asarray(bv)[sl])
    # The line survived, the speckle died.
    assert np.asarray(bh)[40, 60] == 1
    assert np.asarray(bv)[40, 60] == 1
