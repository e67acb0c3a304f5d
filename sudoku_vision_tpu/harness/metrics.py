"""Pipeline performance metrics + regression detection.

Capability parity with reference tests/metrics.py: PerformanceMetrics
(:17 — grid detection rate, cell/digit/empty accuracy, solution rate,
avg/p50/p95 latency, per-digit accuracy, confusion pairs), confusion
matrix from cell errors (:46), baseline regression detection at 5%
thresholds (:254), append-only history file (:226), comparison report
(:185).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass, field

import numpy as np


@dataclass
class PerformanceMetrics:
    n_cases: int = 0
    grid_detection_rate: float = 0.0
    cell_accuracy: float = 0.0       # all 81 cells vs truth
    digit_accuracy: float = 0.0      # cells where truth is a digit
    empty_accuracy: float = 0.0      # cells where truth is empty
    solution_rate: float = 0.0       # solved AND solution matches truth
    avg_latency_ms: float = 0.0
    p50_latency_ms: float = 0.0
    p95_latency_ms: float = 0.0
    per_digit_accuracy: dict = field(default_factory=dict)
    top_confusions: list = field(default_factory=list)
    timestamp: str = ""


def compute_metrics(results: list[dict]) -> PerformanceMetrics:
    """results: [{detected, pred_grid(81), truth_grid(81), solved_ok,
    latency_ms}]"""
    m = PerformanceMetrics(n_cases=len(results))
    if not results:
        return m
    m.grid_detection_rate = float(np.mean([r["detected"] for r in results]))
    lat = np.array([r["latency_ms"] for r in results])
    m.avg_latency_ms = float(lat.mean())
    m.p50_latency_ms = float(np.percentile(lat, 50))
    m.p95_latency_ms = float(np.percentile(lat, 95))
    m.solution_rate = float(np.mean([r.get("solved_ok", False)
                                     for r in results]))

    cm = np.zeros((10, 10), np.int64)
    for r in results:
        if not r["detected"]:
            continue
        pred = np.asarray(r["pred_grid"]).reshape(-1)
        truth = np.asarray(r["truth_grid"]).reshape(-1)
        np.add.at(cm, (truth, pred), 1)
    total = cm.sum()
    if total:
        m.cell_accuracy = float(np.trace(cm) / total)
        m.digit_accuracy = float(
            (np.trace(cm) - cm[0, 0]) / max(cm[1:].sum(), 1))
        m.empty_accuracy = float(cm[0, 0] / max(cm[0].sum(), 1))
        for d in range(1, 10):
            if cm[d].sum():
                m.per_digit_accuracy[str(d)] = float(cm[d, d] / cm[d].sum())
        off = [(int(t), int(p), int(cm[t, p]))
               for t in range(10) for p in range(10)
               if t != p and cm[t, p] > 0]
        off.sort(key=lambda x: -x[2])
        m.top_confusions = off[:10]
    m.timestamp = time.strftime("%Y-%m-%dT%H:%M:%S")
    return m


def save_metrics_to_history(metrics: PerformanceMetrics,
                            path: str = "logs/metrics_history.jsonl"):
    """Append-only history (reference tests/metrics.py:226)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "a") as f:
        f.write(json.dumps(asdict(metrics)) + "\n")


def detect_regression(current: PerformanceMetrics,
                      baseline: PerformanceMetrics,
                      threshold: float = 0.05) -> list[str]:
    """5%-drop regression gate (reference tests/metrics.py:254)."""
    alerts = []
    for fieldname in ("solution_rate", "cell_accuracy",
                      "grid_detection_rate"):
        cur = getattr(current, fieldname)
        base = getattr(baseline, fieldname)
        if base > 0 and (base - cur) / base > threshold:
            alerts.append(
                f"{fieldname} regressed: {base:.3f} -> {cur:.3f}")
    return alerts


def compare_metrics(current: PerformanceMetrics,
                    baseline: PerformanceMetrics) -> str:
    """Side-by-side report (reference tests/metrics.py:185)."""
    lines = [f"{'metric':<24}{'baseline':>10}{'current':>10}{'delta':>10}"]
    for fieldname in ("grid_detection_rate", "cell_accuracy",
                      "digit_accuracy", "empty_accuracy", "solution_rate",
                      "avg_latency_ms", "p50_latency_ms", "p95_latency_ms"):
        b = getattr(baseline, fieldname)
        c = getattr(current, fieldname)
        lines.append(f"{fieldname:<24}{b:>10.3f}{c:>10.3f}{c - b:>+10.3f}")
    return "\n".join(lines)
