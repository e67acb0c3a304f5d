"""OpenCV-parity tests for the JAX image-op library.

cv2 serves ONLY as the test oracle here — the framework itself never
imports it. Each op documents its measured parity level:
bit-exact ops assert equality; the rest assert tight measured bounds.
"""

import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from sudoku_vision_tpu import ops
from sudoku_vision_tpu.ops.filters import gaussian_blur_f32, laplacian_i32
from sudoku_vision_tpu.ops.threshold import otsu_threshold_inv
from sudoku_vision_tpu.ops.warp import (
    bilinear_sample_u8,
    homography_np,
    warp_perspective,
)

RNG = np.random.default_rng(42)


def rand_u8(*shape):
    return RNG.integers(0, 256, shape, dtype=np.uint8)


# ---------------------------------------------------------------------------
# Grayscale
# ---------------------------------------------------------------------------

def test_bgr_to_gray_near_exact():
    img = rand_u8(120, 160, 3)
    got = np.asarray(ops.bgr_to_gray(jnp.asarray(img)))
    want = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1
    # cv2 5.0 SIMD tie-rounding affects <0.5% of pixels.
    assert (diff > 0).mean() < 0.005


def test_rgb_to_gray_matches_bgr_flip():
    img = rand_u8(32, 32, 3)
    a = np.asarray(ops.rgb_to_gray(jnp.asarray(img)))
    b = np.asarray(ops.bgr_to_gray(jnp.asarray(img[..., ::-1])))
    assert np.array_equal(a, b)


# ---------------------------------------------------------------------------
# Gaussian blur — bit-exact
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("ksize", [3, 5, 7, 11])
def test_gaussian_blur_bit_exact(ksize):
    x = rand_u8(96, 128)
    got = np.asarray(ops.gaussian_blur_u8(jnp.asarray(x), ksize))
    want = cv2.GaussianBlur(x, (ksize, ksize), 0)
    assert np.array_equal(got, want), f"ksize={ksize}"


def test_gaussian_blur_batched():
    x = rand_u8(3, 48, 64)
    got = np.asarray(ops.gaussian_blur_u8(jnp.asarray(x), 5))
    for i in range(3):
        assert np.array_equal(got[i], cv2.GaussianBlur(x[i], (5, 5), 0))


def test_gaussian_blur_f32_close():
    x = rand_u8(64, 64)
    got = np.asarray(gaussian_blur_f32(jnp.asarray(x), 11))
    want = cv2.GaussianBlur(x.astype(np.float32), (11, 11), 0)
    assert np.abs(got - want).max() < 0.05


# ---------------------------------------------------------------------------
# Adaptive threshold
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("invert", [True, False])
def test_adaptive_threshold_gaussian(invert):
    x = rand_u8(128, 128)
    flag = cv2.THRESH_BINARY_INV if invert else cv2.THRESH_BINARY
    want = cv2.adaptiveThreshold(
        x, 255, cv2.ADAPTIVE_THRESH_GAUSSIAN_C, flag, 11, 2)
    got = np.asarray(ops.adaptive_threshold(
        jnp.asarray(x), 11, 2, method="gaussian", invert=invert))
    # Bit-exact away from a handful of border-corner pixels.
    assert (got != want).mean() < 0.001


def test_adaptive_threshold_mean_bit_exact():
    x = rand_u8(128, 128)
    want = cv2.adaptiveThreshold(
        x, 255, cv2.ADAPTIVE_THRESH_MEAN_C, cv2.THRESH_BINARY, 11, 2)
    got = np.asarray(ops.adaptive_threshold(
        jnp.asarray(x), 11, 2, method="mean", invert=False))
    assert np.array_equal(got, want)


# ---------------------------------------------------------------------------
# Otsu — bit-exact
# ---------------------------------------------------------------------------

def test_otsu_bit_exact():
    # Bimodal image (realistic for otsu).
    x = np.concatenate([
        RNG.normal(80, 20, 2000), RNG.normal(190, 25, 3000)
    ]).clip(0, 255).astype(np.uint8).reshape(50, 100)
    t_cv, b_cv = cv2.threshold(x, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
    t, b = ops.otsu_threshold(jnp.asarray(x))
    assert int(t) == int(t_cv)
    assert np.array_equal(np.asarray(b), b_cv)
    t_cv2, b_cv2 = cv2.threshold(
        x, 0, 255, cv2.THRESH_BINARY_INV + cv2.THRESH_OTSU)
    t2, b2 = otsu_threshold_inv(jnp.asarray(x))
    assert int(t2) == int(t_cv2)
    assert np.array_equal(np.asarray(b2), b_cv2)


# ---------------------------------------------------------------------------
# Morphology — bit-exact
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("ksize", [2, 3, 5])
def test_erode_dilate_bit_exact(ksize):
    x = (rand_u8(64, 64) > 128).astype(np.uint8) * 255
    kernel = np.ones((ksize, ksize), np.uint8)
    assert np.array_equal(
        np.asarray(ops.dilate(jnp.asarray(x), ksize)), cv2.dilate(x, kernel))
    assert np.array_equal(
        np.asarray(ops.erode(jnp.asarray(x), ksize)), cv2.erode(x, kernel))


def test_open_close_bit_exact():
    x = (rand_u8(64, 64) > 200).astype(np.uint8) * 255
    kernel = np.ones((3, 3), np.uint8)
    assert np.array_equal(
        np.asarray(ops.close_(jnp.asarray(x), 3)),
        cv2.morphologyEx(x, cv2.MORPH_CLOSE, kernel))
    assert np.array_equal(
        np.asarray(ops.open_(jnp.asarray(x), 3)),
        cv2.morphologyEx(x, cv2.MORPH_OPEN, kernel))


# ---------------------------------------------------------------------------
# Resize — bit-exact
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("src,dst", [
    ((40, 40), (28, 28)),
    ((40, 40), (64, 64)),
    ((37, 53), (28, 28)),
    ((450, 450), (28, 28)),
    ((40, 40), (450, 450)),
])
def test_resize_bit_exact(src, dst):
    x = rand_u8(*src)
    got = np.asarray(ops.resize_bilinear_u8(jnp.asarray(x), dst))
    want = cv2.resize(x, (dst[1], dst[0]), interpolation=cv2.INTER_LINEAR)
    assert np.array_equal(got, want), f"{src}->{dst}"


def test_resize_batched():
    x = rand_u8(81, 40, 40)
    got = np.asarray(ops.resize_bilinear_u8(jnp.asarray(x), (28, 28)))
    for i in (0, 40, 80):
        want = cv2.resize(x[i], (28, 28), interpolation=cv2.INTER_LINEAR)
        assert np.array_equal(got[i], want)


# ---------------------------------------------------------------------------
# Warp — bit-exact with f64 host inverse
# ---------------------------------------------------------------------------

def _rand_quad():
    # Convex quad well inside a 120x160 frame: corners tl,tr,br,bl + jitter.
    base = np.array([[20, 15], [140, 18], [135, 100], [18, 95]], np.float64)
    return base + RNG.uniform(-4, 4, (4, 2))


def test_homography_matches_cv2():
    corners = _rand_quad().astype(np.float32)
    m_cv = cv2.getPerspectiveTransform(
        corners,
        np.array([[0, 0], [449, 0], [449, 449], [0, 449]], np.float32))
    m_np = homography_np(corners, (450, 450))
    assert np.allclose(m_np, m_cv, atol=1e-8)
    m_jax = np.asarray(ops.homography_from_corners(
        jnp.asarray(corners), (450, 450)))
    assert np.allclose(m_jax, m_cv, rtol=2e-4, atol=2e-3)


def test_warp_perspective_f64_inverse_close():
    """Device warp (f32 coords) vs cv2: off-by-one on rounding-tie pixels
    only. Bit-exact parity lives in utils.cv_ref.warp_perspective_np (f64
    host reference, asserted exact below)."""
    img = rand_u8(120, 160)
    corners = _rand_quad().astype(np.float32)
    m = homography_np(corners, (256, 256))
    want = cv2.warpPerspective(
        img, m, (256, 256), flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT, borderValue=0)
    got = np.asarray(warp_perspective(
        jnp.asarray(img), np.linalg.inv(m), (256, 256), inverse=True))
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 2
    assert (diff > 0).mean() < 0.01


def test_warp_perspective_np_near_exact():
    """f64 host reference vs cv2.warpPerspective: cv2 steps coordinates
    incrementally per scanline, so the last-ulp of ~0.05% of coords lands
    across a rounding boundary; everything else is bit-identical."""
    from sudoku_vision_tpu.utils.cv_ref import warp_perspective_np
    img = rand_u8(120, 160)
    corners = _rand_quad().astype(np.float32)
    m = homography_np(corners, (256, 256))
    want = cv2.warpPerspective(
        img, m, (256, 256), flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT, borderValue=0)
    got = warp_perspective_np(img, m, (256, 256))
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.002


def test_warp_perspective_f32_inverse_close():
    img = rand_u8(120, 160)
    corners = _rand_quad().astype(np.float32)
    m = homography_np(corners, (128, 128))
    want = cv2.warpPerspective(
        img, m, (128, 128), flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT, borderValue=0)
    got = np.asarray(warp_perspective(jnp.asarray(img), m, (128, 128)))
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 2
    assert (diff > 0).mean() < 0.02


def test_fused_extract_matches_two_stage():
    """warp_extract_cells ~= warp 450 -> crop 10% -> resize 28 (cv2 chain)."""
    img = rand_u8(240, 320)
    # smooth the image so interpolation differences are tiny
    img = cv2.GaussianBlur(img, (7, 7), 0)
    corners = np.array([[30, 25], [290, 28], [285, 210], [28, 205]],
                       np.float64) + RNG.uniform(-3, 3, (4, 2))
    m = homography_np(corners.astype(np.float32), (450, 450))
    warped_cv = cv2.warpPerspective(
        img, m, (450, 450), flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT, borderValue=0)
    cells = np.asarray(ops.warp_extract_cells(
        jnp.asarray(img), np.linalg.inv(m), 450, 28, 0.10))
    assert cells.shape == (81, 28, 28)
    # Reference two-stage chain for a few cells.
    cs, margin = 50, 5
    worst = 0.0
    for r, c in [(0, 0), (4, 4), (8, 8), (2, 7)]:
        crop = warped_cv[r * cs + margin:(r + 1) * cs - margin,
                         c * cs + margin:(c + 1) * cs - margin]
        want = cv2.resize(crop, (28, 28), interpolation=cv2.INTER_LINEAR)
        diff = np.abs(cells[r * 9 + c].astype(int) - want.astype(int))
        worst = max(worst, float(diff.mean()))
    # Fused path skips the intermediate quantization; close but not equal.
    assert worst < 2.0, worst


def test_scanline_extract_matches_nearest():
    """The scanline sampler (row-gather + shear + one-hot matmul) must
    reproduce the nearest-gather path: exactly for an axis-aligned warp
    (q = 0: no shear, every approximation degenerates), and within
    +-1-source-pixel picks for a rotated grid (on a smooth image the
    picked values then differ by a few gray levels at most)."""
    # Axis-aligned: identical.
    img = cv2.GaussianBlur(rand_u8(240, 320), (5, 5), 0)
    corners = np.array([[20, 15], [300, 15], [300, 225], [20, 225]],
                       np.float32)
    m = homography_np(corners, (450, 450))
    near = np.asarray(ops.warp_extract_cells(
        jnp.asarray(img), np.linalg.inv(m), 450, 28, 0.10,
        sample_mode="nearest"))
    scan = np.asarray(ops.warp_extract_cells(
        jnp.asarray(img), np.linalg.inv(m), 450, 28, 0.10,
        sample_mode="scanline"))
    np.testing.assert_array_equal(near, scan)

    # Rotated ~17 deg: picks may land on a +-1-px neighbor. On a
    # Lipschitz-bounded smooth image that caps the value error at
    # sqrt(2) * max gradient, which pins the approximation to "neighbor
    # pick" rather than "wrong position".
    yy, xx = np.mgrid[0:240, 0:320].astype(np.float64)
    smooth = (127 + 60 * np.sin(xx / 17.0) * np.cos(yy / 23.0)
              + 40 * np.sin((xx + yy) / 31.0))
    lipschitz = 60 / 17.0 + 60 / 23.0 + 40 / 31.0   # max |grad| bound
    img = np.clip(smooth, 0, 255).astype(np.uint8)
    for deg in (17.0, -17.0):   # both tilt signs (negative q: gmin < 0)
        th = np.radians(deg)
        c, s = np.cos(th), np.sin(th)
        ctr = np.array([160, 120])
        rot = np.array([[c, -s], [s, c]])
        base = np.array([[-100, -90], [100, -90], [100, 90], [-100, 90]],
                        np.float64)
        corners = (base @ rot.T + ctr).astype(np.float32)
        m = homography_np(corners, (450, 450))
        near = np.asarray(ops.warp_extract_cells(
            jnp.asarray(img), np.linalg.inv(m), 450, 28, 0.10,
            sample_mode="nearest"))
        scan = np.asarray(ops.warp_extract_cells(
            jnp.asarray(img), np.linalg.inv(m), 450, 28, 0.10,
            sample_mode="scanline"))
        diff = np.abs(near.astype(int) - scan.astype(int))
        assert diff.max() <= np.ceil(np.sqrt(2) * lipschitz) + 1, \
            (deg, diff.max())
        assert (diff > 0).mean() < 0.6, (deg, (diff > 0).mean())


# ---------------------------------------------------------------------------
# CLAHE
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shape,tiles", [
    ((40, 40), (4, 4)),
    ((28, 28), (4, 4)),
    ((64, 48), (8, 8)),
    ((45, 37), (4, 4)),   # non-divisible -> internal padding
    ((450, 450), (8, 8)),  # non-divisible
])
def test_clahe_close(shape, tiles):
    x = rand_u8(*shape)
    want = cv2.createCLAHE(clipLimit=2.0, tileGridSize=tiles).apply(x)
    got = np.asarray(ops.clahe(jnp.asarray(x), 2.0, tiles))
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1, f"{shape} {tiles} max={diff.max()}"
    assert (diff > 0).mean() < 0.03


# ---------------------------------------------------------------------------
# Misc building blocks
# ---------------------------------------------------------------------------

def test_box_mean_bit_exact():
    x = rand_u8(64, 64)
    got = np.asarray(ops.box_mean_u8(jnp.asarray(x), 11))
    want = cv2.boxFilter(x, cv2.CV_8U, (11, 11),
                         borderType=cv2.BORDER_REPLICATE)
    assert np.array_equal(got, want)


def test_laplacian_matches_cv2():
    x = rand_u8(64, 64)
    got = np.asarray(laplacian_i32(jnp.asarray(x)))
    want = cv2.Laplacian(x, cv2.CV_64F)
    assert np.array_equal(got.astype(np.float64), want)


def test_histogram256():
    x = rand_u8(64, 64)
    got = np.asarray(ops.histogram256(jnp.asarray(x)))
    want = np.bincount(x.ravel(), minlength=256)
    assert np.array_equal(got, want)


def test_bilinear_sample_interior_matches_remap():
    img = rand_u8(64, 64)
    mx = RNG.uniform(1, 62, (32, 32)).astype(np.float32)
    my = RNG.uniform(1, 62, (32, 32)).astype(np.float32)
    want = cv2.remap(img, mx, my, cv2.INTER_LINEAR,
                     borderMode=cv2.BORDER_CONSTANT, borderValue=0)
    got = np.asarray(bilinear_sample_u8(
        jnp.asarray(img), jnp.asarray(mx), jnp.asarray(my)))
    assert np.array_equal(got, want)


# --- MXU band-matmul filter engine ------------------------------------------


@pytest.mark.parametrize("border", ["reflect101", "replicate"])
@pytest.mark.parametrize("taps_kind", ["gauss5", "gauss11", "box9", "box31"])
def test_band_filter_matches_slice_mac(taps_kind, border):
    """ops/bandconv.py band_filter_int must be bit-identical to the
    slice-MAC reference (filters.sep_filter_int) — same integer
    accumulator, borders folded into the band matrix."""
    from sudoku_vision_tpu.ops.bandconv import band_filter_int
    from sudoku_vision_tpu.ops.filters import (
        gaussian_kernel_fixed, sep_filter_int,
    )

    taps = {
        "gauss5": gaussian_kernel_fixed(5),
        "gauss11": gaussian_kernel_fixed(11),
        "box9": tuple([1] * 9),
        "box31": tuple([1] * 31),
    }[taps_kind]
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(0, 256, (97, 131), np.uint8))
    # int32 input without a max_abs_in hint forces the slice-MAC VPU
    # path (sep_filter_int auto-dispatches uint8 to the band engine).
    want = np.asarray(sep_filter_int(x.astype(jnp.int32), taps, border))
    got = np.asarray(band_filter_int(x, taps, border))
    assert (want == got).all(), np.abs(want - got).max()


def test_band_filter_batched_matches():
    from sudoku_vision_tpu.ops.bandconv import band_filter_int
    from sudoku_vision_tpu.ops.filters import (
        gaussian_kernel_fixed, sep_filter_int,
    )

    taps = gaussian_kernel_fixed(5)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.integers(0, 256, (3, 64, 80), np.uint8))
    want = np.asarray(sep_filter_int(x.astype(jnp.int32), taps,
                                     "reflect101"))
    got = np.asarray(band_filter_int(x, taps, "reflect101"))
    assert (want == got).all()


def test_band_filter_constant_border():
    """constant-0 border (grid.py box sums): out-of-range taps drop."""
    from sudoku_vision_tpu.ops.bandconv import band_filter_int

    rng = np.random.default_rng(5)
    x = rng.integers(0, 2, (40, 56), np.uint8)
    k = 9
    want = np.zeros((40, 56), np.int64)
    xp = np.pad(x.astype(np.int64), k // 2)
    for dy in range(k):
        for dx in range(k):
            want += xp[dy:dy + 40, dx:dx + 56]
    got = np.asarray(band_filter_int(jnp.asarray(x), tuple([1] * k),
                                     "constant"))
    assert (want == got).all()
