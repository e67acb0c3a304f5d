"""Parity: the Pallas in-row x-pick kernel (ops/pallas_pick.py) equals
direct indexing and the scanline sampler's XLA one-hot einsum path."""

import numpy as np
import pytest

import jax.numpy as jnp

from sudoku_vision_tpu.ops.pallas_pick import pick_columns_u8


@pytest.mark.parametrize("shape", [(2268, 950, 28), (128, 1024, 128),
                                   (100, 64, 28), (7, 131, 5)])
def test_pick_columns_matches_indexing(shape):
    n, w, co = shape
    rng = np.random.default_rng(hash(shape) % 2**32)
    rows = rng.integers(0, 256, (n, w), np.uint8)
    xi = rng.integers(0, w, (n, co), np.int32)
    out = np.asarray(pick_columns_u8(jnp.asarray(rows), jnp.asarray(xi),
                                     interpret=True))
    want = rows[np.arange(n)[:, None], xi].astype(np.float32)
    np.testing.assert_array_equal(out, want)


def test_scanline_pick_paths_agree(monkeypatch):
    """The sampler's Pallas branch (forced via interpret on CPU) equals
    its XLA einsum branch on a realistic warped-cell workload."""
    from sudoku_vision_tpu.ops import pallas_pick
    from sudoku_vision_tpu.ops import warp as warp_mod

    rng = np.random.default_rng(11)
    img = jnp.asarray(rng.integers(0, 256, (512, 480), np.uint8))
    # A plausible mild homography: identity + slight rotation/shift.
    ang = 0.06
    m = np.array([[np.cos(ang), -np.sin(ang), 20.0],
                  [np.sin(ang), np.cos(ang), 12.0],
                  [1e-5, -6e-6, 1.0]])
    m_inv = jnp.asarray(np.linalg.inv(m), jnp.float32)
    xs_pos = warp_mod._cell_sample_positions(450, 28, 0.10)
    gx = jnp.asarray(np.broadcast_to(
        np.tile(xs_pos[:, None, None, :], (1, 9, 1, 1)).reshape(81, 1, 28),
        (81, 28, 28)).reshape(81, 28, 28), jnp.float32)
    gy = jnp.asarray(np.broadcast_to(
        np.repeat(xs_pos[:, None, :, None], 9, 1).reshape(81, 28, 1),
        (81, 28, 28)), jnp.float32)
    den = m_inv[2, 0] * gx + m_inv[2, 1] * gy + m_inv[2, 2]
    sx = (m_inv[0, 0] * gx + m_inv[0, 1] * gy + m_inv[0, 2]) / den
    sy = (m_inv[1, 0] * gx + m_inv[1, 1] * gy + m_inv[1, 2]) / den

    want = np.asarray(warp_mod.scanline_sample_cells_u8(img, sx, sy))

    monkeypatch.setattr(warp_mod, "scanline_sample_cells_u8",
                        warp_mod.scanline_sample_cells_u8)
    # Force the Pallas branch by making on_tpu() true and the kernel
    # run in interpret mode.
    from sudoku_vision_tpu.ops import pallas_lattice

    monkeypatch.setattr(pallas_lattice, "on_tpu", lambda: True)
    monkeypatch.setenv("SV_PALLAS_PICK", "1")
    orig = pallas_pick.pick_columns_u8
    monkeypatch.setattr(
        pallas_pick, "pick_columns_u8",
        lambda rows, xi, interpret=False: orig(rows, xi, interpret=True))
    got = np.asarray(warp_mod.scanline_sample_cells_u8(img, sx, sy))
    np.testing.assert_array_equal(got, want)
