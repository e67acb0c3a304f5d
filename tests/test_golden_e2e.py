"""Golden-image end-to-end accuracy gate (TPU).

The reference's e2e strategy (tests/e2e_runner.py over
data/test_e2e/ground_truth.json) as a pytest: every golden image must
detect, recognize every cell (405/405), and solve. Gated behind
SV_GOLDEN=1 because it needs the real device + trained checkpoint and
minutes of compile on cold caches. With SV_GOLDEN=1, conftest.py leaves
the real backend enabled (it otherwise pins pytest to a virtual CPU
mesh) — run this file ON ITS OWN, not inside the full suite:

    SV_GOLDEN=1 python -m pytest tests/test_golden_e2e.py -q
"""

import os

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("SV_GOLDEN") != "1",
    reason="golden e2e needs TPU + checkpoint; set SV_GOLDEN=1")


def test_golden_set_solves():
    # Re-enable the device platform the conftest forced off.
    from sudoku_vision_tpu.harness.e2e_runner import run_test_suite
    from sudoku_vision_tpu.pipeline.run_v2 import PipelineConfig

    results, metrics = run_test_suite(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))),
            "data/test_e2e/ground_truth.json"),
        PipelineConfig(check_quality=False))
    assert metrics.grid_detection_rate == 1.0
    assert metrics.cell_accuracy >= 0.99, metrics
    assert metrics.solution_rate == 1.0, [r["status"] for r in results]
