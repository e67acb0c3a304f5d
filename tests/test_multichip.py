"""Multi-chip perception on the virtual 8-device CPU mesh.

Asserts the sharded perceive graph (parallel/shard.py) produces the SAME
digits/corners as the single-device batched graph — the sharding only
changes placement, never results. This is the serving-path analog of the
training-step dry run in __graft_entry__.dryrun_multichip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sudoku_vision_tpu.ml.generate_scenes import render_scene
from sudoku_vision_tpu.models import DigitCNNv3Light
from sudoku_vision_tpu.parallel.mesh import make_mesh
from sudoku_vision_tpu.parallel.shard import (
    device_put_frames, sharded_perceive_fn,
)
from sudoku_vision_tpu.pipeline.graph import perceive


@pytest.fixture(scope="module")
def small_frames():
    """A batch of small synthetic sudoku scenes (CPU-compile friendly)."""
    rng = np.random.default_rng(7)
    frames = [
        render_scene(rng, size=(480, 640))[0] for _ in range(4)
    ]
    return np.stack(frames)  # (4, 480, 640, 3) uint8


@pytest.fixture(scope="module")
def tiny_model():
    model = DigitCNNv3Light()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 28, 28, 1), jnp.float32))
    return model, variables


def test_sharded_matches_single_device(small_frames, tiny_model):
    model, variables = tiny_model
    n_dev = len(jax.devices())
    assert n_dev >= 8, "conftest must provide 8 virtual devices"

    mesh = make_mesh(8, data=4, model=2)
    fn, mesh = sharded_perceive_fn(model, variables, mesh,
                                   use_clahe=False)
    sharded_in = device_put_frames(jnp.asarray(small_frames), mesh)
    digits_s, conf_s, probs_s, corners_s, found_s, *_ = fn(sharded_in)

    @jax.jit
    def single(imgs):
        out = jax.vmap(lambda im: perceive(im, model, variables,
                                           use_clahe=False))(imgs)
        return out.digits, out.confidence, out.corners, out.grid_found

    digits_1, conf_1, corners_1, found_1 = single(jnp.asarray(small_frames))

    np.testing.assert_array_equal(np.asarray(digits_s), np.asarray(digits_1))
    np.testing.assert_array_equal(np.asarray(found_s), np.asarray(found_1))
    np.testing.assert_allclose(np.asarray(corners_s), np.asarray(corners_1),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(conf_s), np.asarray(conf_1),
                               atol=1e-4)


def test_tensor_parallel_perception_matches(small_frames, tiny_model):
    """TP-sharded serving (model axis = 2): params sharded over "model"
    via mesh.py's TP rules, XLA inserts the collectives; digits must be
    identical and probabilities equal up to collective reduction order
    (VERDICT r2 #7 — the model axis must run in PERCEPTION, not just the
    training dryrun)."""
    model, variables = tiny_model
    mesh = make_mesh(8, data=4, model=2)
    fn, mesh = sharded_perceive_fn(model, variables, mesh,
                                   use_clahe=False, tensor_parallel=True)
    sharded_in = device_put_frames(jnp.asarray(small_frames), mesh)
    digits_tp, conf_tp, probs_tp, corners_tp, found_tp, *_ = fn(sharded_in)

    # The TP rules must actually shard at least one kernel over "model".
    from sudoku_vision_tpu.parallel.mesh import param_sharding_rules

    rules = param_sharding_rules(mesh, variables)
    specs = [s.spec for s in jax.tree_util.tree_leaves(rules)]
    assert any("model" in (ax for p in spec if p for ax in
               ((p,) if isinstance(p, str) else p)) for spec in specs), specs

    @jax.jit
    def single(imgs):
        out = jax.vmap(lambda im: perceive(im, model, variables,
                                           use_clahe=False))(imgs)
        return out.digits, out.confidence, out.grid_found

    digits_1, conf_1, found_1 = single(jnp.asarray(small_frames))
    np.testing.assert_array_equal(np.asarray(digits_tp),
                                  np.asarray(digits_1))
    np.testing.assert_array_equal(np.asarray(found_tp), np.asarray(found_1))
    np.testing.assert_allclose(np.asarray(conf_tp), np.asarray(conf_1),
                               atol=1e-4)


def test_sharded_output_layout(small_frames, tiny_model):
    """Outputs come back data-sharded: one shard per data-axis group."""
    model, variables = tiny_model
    mesh = make_mesh(4, data=4, model=1)
    fn, mesh = sharded_perceive_fn(model, variables, mesh, use_clahe=False)
    sharded_in = device_put_frames(jnp.asarray(small_frames), mesh)
    digits, *_ = fn(sharded_in)
    assert digits.shape == (4, 81)
    shard_devs = {s.device for s in digits.addressable_shards}
    assert len(shard_devs) == 4
