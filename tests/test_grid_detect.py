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


def _cross_lattice(h=240, w=240, tl=(40, 40), size=160, pitch=20):
    """Synthetic gated-lattice pair: grid h/v lines inside [tl, tl+size]."""
    lat_h = np.zeros((h, w), np.int8)
    lat_v = np.zeros((h, w), np.int8)
    for i in range(size // pitch + 1):
        lat_h[tl[1] + i * pitch, tl[0]:tl[0] + size + 1] = 1
        lat_v[tl[1]:tl[1] + size + 1, tl[0] + i * pitch] = 1
    return lat_h, lat_v


def test_edge_support_separates_true_and_decoy():
    from sudoku_vision_tpu.cv.grid import dilate_union, edge_support

    lat_h, lat_v = _cross_lattice()
    lat_dil = dilate_union(jnp.asarray(lat_h), jnp.asarray(lat_v))
    true_q = jnp.asarray([[40., 40.], [200., 40.],
                          [200., 200.], [40., 200.]])
    sup_true = np.asarray(jax.jit(edge_support)(lat_dil, true_q))
    assert sup_true.min() > 0.9, sup_true
    # BR stolen: moved off-grid into blank margin.
    stolen_q = true_q.at[2].set(jnp.asarray([235., 235.]))
    sup_stolen = np.asarray(jax.jit(edge_support)(lat_dil, stolen_q))
    assert sup_stolen[1] < 0.45 and sup_stolen[2] < 0.45, sup_stolen
    assert sup_stolen[0] > 0.9 and sup_stolen[3] > 0.9, sup_stolen


def test_peel_recovers_stolen_corner():
    """A compact decoy cluster outside the grid steals the BR extreme
    point; peel_stolen_corners must erase it and restore the true quad
    (the page-corner steal class: PLAN.md s027/s118)."""
    from sudoku_vision_tpu.cv.grid import (
        _extreme_corners, dilate_union, peel_stolen_corners,
    )

    lat_h, lat_v = _cross_lattice()
    comp = ((lat_h > 0) & (lat_v > 0))
    comp_np = np.asarray(comp).copy()
    comp_np[228:233, 228:233] = True        # decoy cluster beyond BR
    comp = jnp.asarray(comp_np)
    before = np.asarray(_extreme_corners(comp))
    assert before[2].tolist() != [200.0, 200.0]     # BR is stolen
    lat_dil = dilate_union(jnp.asarray(lat_h), jnp.asarray(lat_v))
    _, corners, sup = jax.jit(
        lambda c, l: peel_stolen_corners(c, l, rho=15))(comp, lat_dil)
    after = np.asarray(corners)
    np.testing.assert_allclose(after[2], [200.0, 200.0])
    # The other three corners are untouched.
    np.testing.assert_allclose(after[[0, 1, 3]], before[[0, 1, 3]])
    assert np.asarray(sup).min() > 0.9


def test_peel_noop_on_clean_grid():
    from sudoku_vision_tpu.cv.grid import (
        _extreme_corners, dilate_union, peel_stolen_corners,
    )

    lat_h, lat_v = _cross_lattice()
    comp = (jnp.asarray(lat_h) > 0) & (jnp.asarray(lat_v) > 0)
    lat_dil = dilate_union(jnp.asarray(lat_h), jnp.asarray(lat_v))
    peeled, _, _ = jax.jit(
        lambda c, l: peel_stolen_corners(c, l, rho=15))(comp, lat_dil)
    np.testing.assert_array_equal(np.asarray(peeled), np.asarray(comp))


def test_refine_boundaries_ignores_decoy_line():
    """A decoy straight line inside the +-16 px snap band (a pen on the
    page margin) must not drag the outer boundary off the true grid
    line: the robust snap picks the mass peak nearest nominal, not the
    whole-band centroid (which measured ~7 px of drift on this setup)."""
    from sudoku_vision_tpu.cv.extract import refine_boundaries

    h = w = 520
    lat_h = np.zeros((h, w), np.int8)
    lat_v = np.zeros((h, w), np.int8)
    for i in range(10):
        y = round(i * 50.0)
        lat_h[max(0, y - 1):y + 2, :460] = 1
        lat_v[:460, max(0, y - 1):y + 2] = 1
    # Decoy: a heavier "pen" 12 px below the bottom boundary (450).
    lat_h[461:466, :500] = 1
    m_inv = jnp.eye(3, dtype=jnp.float32)   # warp coords == image coords
    b_y, b_x = jax.jit(lambda lh, lv: refine_boundaries(
        jnp.asarray(lh), jnp.asarray(lv), m_inv, 1, 450))(lat_h, lat_v)
    np.testing.assert_allclose(np.asarray(b_y), np.arange(10) * 50.0,
                               atol=1.5)
    np.testing.assert_allclose(np.asarray(b_x), np.arange(10) * 50.0,
                               atol=1.5)


def test_refine_boundaries_follows_true_bow():
    """Legit page-curvature bow (a few px) must still be followed."""
    from sudoku_vision_tpu.cv.extract import refine_boundaries

    h = w = 520
    lat_h = np.zeros((h, w), np.int8)
    lat_v = np.zeros((h, w), np.int8)
    for i in range(10):
        y = round(i * 50.0) + 3          # all lines bowed +3 px in y
        lat_h[max(0, y - 1):y + 2, :460] = 1
        x = round(i * 50.0)
        lat_v[:460, max(0, x - 1):x + 2] = 1
    m_inv = jnp.eye(3, dtype=jnp.float32)
    b_y, b_x = jax.jit(lambda lh, lv: refine_boundaries(
        jnp.asarray(lh), jnp.asarray(lv), m_inv, 1, 450))(lat_h, lat_v)
    np.testing.assert_allclose(np.asarray(b_y), np.arange(10) * 50.0 + 3,
                               atol=1.5)
    np.testing.assert_allclose(np.asarray(b_x), np.arange(10) * 50.0,
                               atol=1.5)


def test_refine_boundaries_recovers_stolen_edge():
    """s121_printed_skew regression (sweep base 7000): when a decoy
    steals an edge's corner pair, the true lines drift off nominal
    cumulatively (here: spacing 45 from x=2, as measured on s121 —
    true line 9 at 407 vs nominal 450) and the old nominal-anchored
    bands aliased boundaries >= 5 onto NEIGHBORING lines, shifting
    crops one full cell. The global comb fit must recover the true
    progression on the skewed axis while the aligned axis keeps
    nominal anchoring."""
    from sudoku_vision_tpu.cv.extract import refine_boundaries

    h = w = 520
    lat_h = np.zeros((h, w), np.int8)
    lat_v = np.zeros((h, w), np.int8)
    for i in range(10):
        y = round(i * 50.0)
        lat_h[max(0, y - 1):y + 2, :460] = 1
        x = round(2 + i * 45.0)          # compressed: corners stolen
        lat_v[:460, max(0, x - 1):x + 2] = 1
    m_inv = jnp.eye(3, dtype=jnp.float32)
    b_y, b_x = jax.jit(lambda lh, lv: refine_boundaries(
        jnp.asarray(lh), jnp.asarray(lv), m_inv, 1, 450))(lat_h, lat_v)
    np.testing.assert_allclose(np.asarray(b_y), np.arange(10) * 50.0,
                               atol=1.5)
    np.testing.assert_allclose(np.asarray(b_x), 2 + np.arange(10) * 45.0,
                               atol=2.0)


def test_refine_boundaries_comb_stays_nominal_on_partial_lattice():
    """A normal scene with a few MISSING lines (ink gaps) must not
    engage the comb off-nominal: missing evidence alone is not a
    displacement signal, and the per-band fallback keeps those
    boundaries at their anchors."""
    from sudoku_vision_tpu.cv.extract import refine_boundaries

    h = w = 520
    lat_h = np.zeros((h, w), np.int8)
    lat_v = np.zeros((h, w), np.int8)
    for i in range(10):
        y = round(i * 50.0)
        if i not in (3, 6):              # two h-lines entirely missing
            lat_h[max(0, y - 1):y + 2, :460] = 1
        lat_v[:460, max(0, y - 1):y + 2] = 1
    m_inv = jnp.eye(3, dtype=jnp.float32)
    b_y, b_x = jax.jit(lambda lh, lv: refine_boundaries(
        jnp.asarray(lh), jnp.asarray(lv), m_inv, 1, 450))(lat_h, lat_v)
    np.testing.assert_allclose(np.asarray(b_y), np.arange(10) * 50.0,
                               atol=1.5)
    np.testing.assert_allclose(np.asarray(b_x), np.arange(10) * 50.0,
                               atol=1.5)
