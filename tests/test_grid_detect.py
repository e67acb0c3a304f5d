"""Grid detection tests on small synthetic scenes (CPU-fast).

The golden-image parity lives in the e2e harness (TPU); these tests pin
the detector's building blocks and behavior on drawn grids: lattice
extraction, region isolation, corner accuracy, rotation tolerance,
not-found handling.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sudoku_vision_tpu.cv.grid import (
    detect_grid, line_lattice, order_corners,
)


def draw_grid(h=360, w=360, tl=(40, 40), size=260, rot_deg=0.0,
              line_w=2, noise=0.0, seed=0):
    """Render a synthetic sudoku grid photo (gray, uint8)."""
    rng = np.random.default_rng(seed)
    img = np.full((h, w), 235, np.float32)
    img += rng.normal(0, 3, (h, w))
    c = np.cos(np.radians(rot_deg))
    s = np.sin(np.radians(rot_deg))
    cx, cy = tl[0] + size / 2, tl[1] + size / 2

    def to_img(x, y):
        dx, dy = x - cx, y - cy
        return cx + c * dx - s * dy, cy + s * dx + c * dy

    # draw 10 + 10 lines as dark pixels
    for i in range(10):
        t = tl[0] + i * size / 9
        for u in np.linspace(tl[1], tl[1] + size, size * 2):
            for (x, y) in (to_img(t, u), to_img(u, t)):
                xi, yi = int(round(x)), int(round(y))
                img[max(0, yi - line_w // 2):yi + line_w // 2 + 1,
                    max(0, xi - line_w // 2):xi + line_w // 2 + 1] = 40
    if noise:
        mask = rng.random((h, w)) < noise
        img[mask] = rng.uniform(30, 120, mask.sum())
    return np.clip(img, 0, 255).astype(np.uint8)


def expected_corners(tl, size, rot_deg, h, w):
    c = np.cos(np.radians(rot_deg))
    s = np.sin(np.radians(rot_deg))
    cx, cy = tl[0] + size / 2, tl[1] + size / 2
    pts = []
    for (x, y) in [(tl[0], tl[1]), (tl[0] + size, tl[1]),
                   (tl[0] + size, tl[1] + size), (tl[0], tl[1] + size)]:
        dx, dy = x - cx, y - cy
        pts.append((cx + c * dx - s * dy, cy + s * dx + c * dy))
    return np.array(pts)


@pytest.mark.parametrize("rot", [0.0, 20.0])
def test_detect_drawn_grid(rot):
    img = draw_grid(rot_deg=rot)
    det = jax.jit(detect_grid)(jnp.asarray(img))
    assert bool(det.found), f"rot={rot}"
    want = expected_corners((40, 40), 260, rot, 360, 360)
    got = np.asarray(det.corners)
    err = np.abs(order_corners(jnp.asarray(want)) - got).max()
    assert err < 12, f"rot={rot} err={err}"


def test_detect_with_speckle_noise():
    img = draw_grid(noise=0.03, seed=3)
    det = jax.jit(detect_grid)(jnp.asarray(img))
    assert bool(det.found)
    want = expected_corners((40, 40), 260, 0, 360, 360)
    assert np.abs(want - np.asarray(det.corners)).max() < 12


def test_no_grid_not_found():
    rng = np.random.default_rng(0)
    img = (rng.normal(200, 15, (360, 360))).clip(0, 255).astype(np.uint8)
    det = jax.jit(detect_grid)(jnp.asarray(img))
    assert not bool(det.found)


def test_line_lattice_keeps_lines_kills_blobs():
    img = np.zeros((200, 200), np.uint8)
    img[100, 20:180] = 255          # long horizontal line
    img[30:40, 30:40] = 255         # blob
    rng = np.random.default_rng(0)
    speck = rng.random((200, 200)) < 0.01
    img[speck] = 255
    lat = np.asarray(jax.jit(lambda b: line_lattice(b, 31))(jnp.asarray(img)))
    assert lat[100, 100] == 1              # line survives
    assert lat[33:37, 33:37].sum() == 0    # blob dies
    assert lat.sum() < 4 * 160             # speckle gone


def test_order_corners():
    pts = jnp.asarray([[100., 100.], [0., 100.], [100., 0.], [0., 0.]])
    ordered = np.asarray(order_corners(pts))
    np.testing.assert_array_equal(
        ordered, [[0, 0], [100, 0], [100, 100], [0, 100]])


def test_packed_bank_matches_per_frame():
    """vmap routes the lattice bank to the bit-packed batched formulation
    (custom_vmap); it must be bit-identical to the per-frame path,
    including batches that span >1 uint32 word (N > 32)."""
    from sudoku_vision_tpu.cv.grid import line_lattice_hv

    rng = np.random.default_rng(1)
    n = 35
    imgs = np.zeros((n, 96, 144), np.uint8)
    for i in range(n):
        y = 10 + (5 * i) % 70
        imgs[i, y, 8:120] = 255                       # horizontal line
        imgs[i, 12:90, 20 + (3 * i) % 100] = 255      # vertical line
        speck = rng.random((96, 144)) < 0.02
        imgs[i][speck] = 255
    batch = jnp.asarray(imgs)

    f = lambda b: line_lattice_hv(b, 15, (-45, -20, 0, 20, 45))
    lat_h_b, lat_v_b = jax.jit(jax.vmap(f))(batch)
    for i in range(0, n, 7):
        lat_h, lat_v = jax.jit(f)(batch[i])
        np.testing.assert_array_equal(np.asarray(lat_h_b[i]),
                                      np.asarray(lat_h))
        np.testing.assert_array_equal(np.asarray(lat_v_b[i]),
                                      np.asarray(lat_v))
