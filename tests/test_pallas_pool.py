"""Parity: the Pallas fused gray+pool kernel is bit-identical to the
XLA integer-exact formulation (ops/color.py::pooled_gray fallback)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sudoku_vision_tpu.ops.color import pooled_gray
from sudoku_vision_tpu.ops.pallas_pool import (
    pooled_gray_pallas,
    pooled_gray_supported,
)


@pytest.mark.parametrize("f", [2, 4])
@pytest.mark.parametrize("shape", [(256, 192), (912, 684), (132, 36)])
def test_pallas_pool_matches_xla(f, shape):
    h, w = shape
    rng = np.random.default_rng(hash((f, shape)) % 2**32)
    img = jnp.asarray(rng.integers(0, 256, (h, w, 3), np.uint8))
    assert pooled_gray_supported(h, w, f)
    want = np.asarray(pooled_gray(img, f))  # CPU -> XLA path
    got = np.asarray(pooled_gray_pallas(img, f, interpret=True))
    assert want.shape == got.shape == (h // f, w // f)
    assert (want == got).all(), np.abs(
        want.astype(int) - got.astype(int)).max()


def test_pallas_pool_nondivisible_not_supported():
    assert not pooled_gray_supported(101, 96, 4)
    assert not pooled_gray_supported(96, 96, 8)


def test_pooled_gray_integer_semantics():
    """pooled_gray == round-half-up of the exact fixed-point mean."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (16, 12, 3), np.uint8)
    f = 4
    x = img.astype(np.int64)
    n = 1868 * x[..., 0] + 9617 * x[..., 1] + 4899 * x[..., 2]
    want = np.zeros((4, 3), np.int64)
    for dy in range(f):
        for dx in range(f):
            want += n[dy::f, dx::f]
    want = (want + (1 << 17)) >> 18
    got = np.asarray(pooled_gray(jnp.asarray(img), f))
    assert (want == got).all()


def test_perceive_packed_matches_3d():
    """perceive(packed_bgr=True) on host-packed frames == perceive on
    the (H, W, 3) frame (same math; packed only changes device layout)."""
    import jax

    from sudoku_vision_tpu.models import DigitCNNv3
    from sudoku_vision_tpu.pipeline.graph import perceive
    from tests.test_grid_detect import draw_grid

    scene = draw_grid(h=360, w=360, tl=(40, 40), size=260, seed=3)
    img = np.repeat(scene[..., None], 3, axis=2)
    model = DigitCNNv3()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 28, 28, 1), jnp.float32))
    out3 = jax.jit(lambda im: perceive(im, model, variables))(
        jnp.asarray(img))
    outp = jax.jit(lambda im: perceive(
        im, model, variables, packed_bgr=True))(
        jnp.asarray(img.reshape(360, 360 * 3)))
    assert np.array_equal(np.asarray(out3.digits), np.asarray(outp.digits))
    assert np.allclose(np.asarray(out3.corners), np.asarray(outp.corners))
    assert bool(outp.grid_found)
