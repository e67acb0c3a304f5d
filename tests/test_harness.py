"""Tests for the e2e harness: metrics, regression gate, failure analysis
(reference tests/metrics.py + tests/failure_analysis.py capabilities).
Pure host code — fast."""

import numpy as np

from sudoku_vision_tpu.harness.e2e_runner import compare_grids, parse81
from sudoku_vision_tpu.harness.failure_analysis import (
    analyze_failures, format_failure_report,
)
from sudoku_vision_tpu.harness.metrics import (
    PerformanceMetrics, compare_metrics, compute_metrics, detect_regression,
)


def make_result(n_wrong=0, detected=True, latency=100.0, solved=True):
    truth = np.zeros(81, np.int64)
    truth[:30] = (np.arange(30) % 9) + 1
    pred = truth.copy()
    for i in range(n_wrong):
        pred[i] = (pred[i] % 9) + 1
    return {"detected": detected, "pred_grid": pred.tolist(),
            "truth_grid": truth.tolist(), "solved_ok": solved,
            "latency_ms": latency,
            "diff": {"wrong_cells": [
                (int(i // 9), int(i % 9), int(truth[i]), int(pred[i]))
                for i in range(n_wrong)]},
            "status": "solved" if solved else "unsolvable"}


def test_compute_metrics_perfect():
    m = compute_metrics([make_result() for _ in range(4)])
    assert m.cell_accuracy == 1.0
    assert m.digit_accuracy == 1.0
    assert m.empty_accuracy == 1.0
    assert m.solution_rate == 1.0
    assert m.grid_detection_rate == 1.0


def test_compute_metrics_with_errors():
    m = compute_metrics([make_result(n_wrong=8, solved=False),
                         make_result()])
    assert 0.9 < m.cell_accuracy < 1.0
    assert m.solution_rate == 0.5
    assert m.top_confusions  # some confusion pairs recorded


def test_regression_gate():
    base = compute_metrics([make_result() for _ in range(4)])
    cur = compute_metrics([make_result(n_wrong=20, solved=False)
                           for _ in range(4)])
    alerts = detect_regression(cur, base)
    assert any("solution_rate" in a for a in alerts)
    assert any("cell_accuracy" in a for a in alerts)
    assert detect_regression(base, base) == []


def test_compare_metrics_report():
    base = compute_metrics([make_result()])
    report = compare_metrics(base, base)
    assert "cell_accuracy" in report and "baseline" in report


def test_compare_grids():
    a = parse81("0" * 80 + "5")
    b = parse81("0" * 80 + "3")
    d = compare_grids(a, b)
    assert d["wrong_cells"] == [(8, 8, 3, 5)]
    assert abs(d["cell_accuracy"] - 80 / 81) < 1e-9


def test_failure_analysis_recommendations():
    results = [make_result(n_wrong=10, solved=False) for _ in range(4)]
    for r in results:
        r["status"] = "unsolvable"
    analysis = analyze_failures(results)
    assert analysis["status_counts"]["unsolvable"] == 4
    assert any("beam" in r for r in analysis["recommendations"])
    report = format_failure_report(analysis)
    assert "heatmap" in report and "RECOMMEND" in report


def test_empty_confusion_detection():
    truth = np.zeros(81, np.int64)
    pred = truth.copy()
    pred[:9] = 5  # empty cells misread as digits
    res = {"detected": True, "pred_grid": pred.tolist(),
           "truth_grid": truth.tolist(), "solved_ok": False,
           "latency_ms": 50.0, "status": "invalid",
           "diff": {"wrong_cells": [(0, c, 0, 5) for c in range(9)]}}
    analysis = analyze_failures([res])
    assert analysis["empty_confusion_share"] == 1.0
