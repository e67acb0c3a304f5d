"""Integration tests across the layer seams (reference
tests/test_integration.py capability: CV->ML, ML->Solver, end-to-end
connectivity — tests component INTEGRATION, not accuracy, reference
docstring :7-9).

Runs on a small synthetic scene so it stays CPU-viable; the accuracy
contract lives in the TPU-gated golden test (test_golden_e2e.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_grid_detect import draw_grid


@pytest.fixture(scope="module")
def scene():
    return draw_grid(h=360, w=360, tl=(40, 40), size=260, seed=1)


def test_cv_to_ml_seam(scene):
    """CV output feeds the CNN with the right shapes (reference
    TestCVToML :118)."""
    from sudoku_vision_tpu.models import DigitCNNv3
    from sudoku_vision_tpu.pipeline.graph import perceive

    model = DigitCNNv3()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 28, 28, 1), jnp.float32))
    out = jax.jit(lambda im: perceive(im, model, variables))(
        jnp.asarray(scene))
    assert out.cells.shape == (81, 28, 28)
    assert out.logits.shape == (81, 10)
    assert out.digits.shape == (81,)
    assert bool(out.grid_found)
    # Drawn grid is empty -> empty detector should fire on most cells.
    assert int(np.asarray(out.empty_mask).sum()) > 70


def test_ml_to_solver_seam():
    """Known-valid predictions flow into the native solver (reference
    TestMLToSolver :183)."""
    from sudoku_vision_tpu import solver
    from tests.test_solver import EASY, EASY_SOLUTION

    res = solver.solve(EASY)
    assert res.solved
    assert np.array_equal(res.grid, EASY_SOLUTION)


def test_end_to_end_connects(scene):
    """The full pipeline runs without crashing on a synthetic scene
    (reference TestEndToEnd :213 — explicitly tolerant of model state)."""
    from sudoku_vision_tpu.pipeline.run_v2 import (
        PipelineConfig, run_pipeline,
    )

    res = run_pipeline(scene[..., None].repeat(3, axis=2),
                       PipelineConfig(check_quality=False, model="v3light"))
    # "ambiguous": this test's model is whatever checkpoint (or random
    # init) is around, so a garbage recognition can solve to a
    # multi-solution grid — the uniqueness gate reports that honestly.
    assert res.status in ("solved", "unsolvable", "invalid", "ambiguous")
    assert res.recognized_grid.shape == (9, 9)
    assert res.confidence.shape == (9, 9)
    assert res.time_graph > 0


def test_reasoning_to_solver_seam():
    """Corrected grids from the reasoning layer are solver-consumable."""
    from sudoku_vision_tpu import solver
    from sudoku_vision_tpu.reasoning import resolve_conflicts
    from tests.test_reasoning import probs_for
    from tests.test_solver import EASY

    g = EASY.copy()
    g[2, 1] = 8  # introduce a conflict
    probs = probs_for(g, conf=0.9)
    i = 2 * 9 + 1
    probs[i] = 0.05 / 8
    probs[i, 8] = 0.55
    probs[i, 9] = 0.40
    fixed = resolve_conflicts(g, probs)
    assert fixed.success
    assert solver.solve(fixed.grid).solved
