"""Real-cell accuracy gates for the deployed classifier.

The reference's history is the motivation: an MNIST-only model scored
99.4% on MNIST and 6.2% on real printed cells (reference
tests/test_integration.py:264-265), so checkpoints are kept by REAL
accuracy (reference ml/train.py:334-341) and the real-cell number is a
release gate, not a footnote. `data/real/` holds cells harvested from
the golden photos by tools/extract_cells.py and labeled from the
hand-verified e2e transcriptions (tools/label_from_truth.py), split
70/15/15 by tools/organize_dataset.py with leakage checks.

These tests evaluate on the held-out real TEST split (never seen by
training or checkpoint selection — `--eval-real-dir` uses val).
"""

import os

import pytest

from sudoku_vision_tpu.ml.datasets import load_class_dirs
from sudoku_vision_tpu.ml.evaluate import evaluate_checkpoint

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REAL_DIR = os.path.join(REPO, "data", "real")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REAL_DIR, "test")),
    reason="data/real test split not built")


def _eval(ckpt_name: str) -> dict:
    ds = load_class_dirs(REAL_DIR, "test", name="real/test")
    return evaluate_checkpoint(ckpt_name, "v3", ds)


def test_real_split_exists_and_is_stratified():
    for split in ("train", "val", "test"):
        n = sum(len(files) for _, _, files in
                os.walk(os.path.join(REAL_DIR, split)))
        assert n >= 50, f"{split} split too small: {n}"


def test_flagship_real_accuracy_floor():
    """The deployed checkpoint must hold >=93% on held-out real cells
    (reference ROADMAP.md:171 phase-1 target: >95% printed digits;
    measured 0.9756 at round 3)."""
    summary = _eval("digit_cnn_v3_real")
    assert summary["accuracy"] >= 0.93, summary
    # Empty-vs-digit confusion is the pipeline-killing error class; the
    # heuristic empty mask backstops it, but the model itself must not
    # regress below 90% recall on class 0.
    assert summary["per_class"]["0"]["recall"] >= 0.90, summary


def test_combined_beats_synthetic_only_on_real():
    """The VERDICT r2 criterion: the combined (synthetic+real) fine-tune
    must be at least as good as the synthetic-only flagship on real
    cells (reference ml/train.py:193 evaluate_on_real motivation)."""
    combined = _eval("digit_cnn_v3_real")
    synthetic = _eval("digit_cnn_v3_final")
    assert combined["accuracy"] >= synthetic["accuracy"], (
        combined["accuracy"], synthetic["accuracy"])


def test_finetune_keeps_synthetic_accuracy():
    """Catastrophic-forgetting gate (round-3 regression): the real-cell
    fine-tune must NOT trade away synthetic generalization — an early
    recipe won the best-by-real race by one real cell while dropping
    marginal deployment glyphs to 'empty'/'1' (test_orientation caught
    it end-to-end). Gated on the checkpoint's own recorded metrics:
    synthetic val >= 0.97; every DIGIT class >= 0.95 recall (the
    digits->empty forgetting mode shows here first); empty recall
    within drift of the synthetic-only flagship's 0.844 (the empty
    class is backstopped downstream by the heuristic empty mask +
    solver validation, so it gets slack the digit classes don't)."""
    import json

    meta = json.load(open(os.path.join(REPO, "models_ckpt",
                                       "digit_cnn_v3_real.json")))
    assert meta["val_acc"] >= 0.97, meta["val_acc"]
    assert min(meta["per_class"][1:]) >= 0.95, meta["per_class"]
    assert meta["per_class"][0] >= 0.78, meta["per_class"]


def test_ckpt_chain_prefers_real_finetune():
    from sudoku_vision_tpu.pipeline.run_v2 import _CKPT_CHAIN

    assert _CKPT_CHAIN["v3"][0] == "digit_cnn_v3_real"
    import json

    meta = json.load(open(os.path.join(REPO, "models_ckpt",
                                       "digit_cnn_v3_real.json")))
    assert meta["dataset"] == "combined"
    # The recorded real_acc is the 68-cell VAL split used for checkpoint
    # selection (±1.5%/cell noise); the release gate is the held-out
    # TEST split in test_flagship_real_accuracy_floor above. This floor
    # only catches gross breakage of the recorded selection metric.
    assert meta["real_acc"] >= 0.92
