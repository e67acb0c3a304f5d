"""End-to-end harness with ground truth.

Capability parity with reference tests/e2e_runner.py: ground-truth JSON
schema {test_cases: [{image_path, puzzle, solution, metadata}]} (:86),
per-case run through the v2 pipeline with the quality gate disabled
(:128), cell-level comparison (:103), aggregate pass rate / detection
rate / cell accuracy / per-category breakdown / timing (:193), results
JSON (:448), --save-failures with per-failure JSON + annotated image
(:297).

CLI:
    python -m sudoku_vision_tpu.harness.e2e_runner \
        --ground-truth data/test_e2e/ground_truth.json [--save-failures out/]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from sudoku_vision_tpu.harness.metrics import (
    PerformanceMetrics, compute_metrics, save_metrics_to_history,
)


_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def load_ground_truth(path: str) -> list[dict]:
    """Load cases; relative image paths resolve against the repo root,
    then against the ground-truth file's own directory."""
    with open(path) as f:
        data = json.load(f)
    cases = data["test_cases"]
    base = os.path.dirname(os.path.abspath(path))
    for c in cases:
        p = c["image_path"]
        if not os.path.isabs(p):
            for root in (_REPO_ROOT, base):
                cand = os.path.join(root, p)
                if os.path.exists(cand):
                    c["image_path"] = cand
                    break
    return cases


def parse81(s: str) -> np.ndarray:
    return np.array([0 if ch in "0." else int(ch) for ch in s],
                    np.int32).reshape(9, 9)


def compare_grids(pred: np.ndarray, truth: np.ndarray) -> dict:
    """Cell-level diff (reference e2e_runner.py:103)."""
    pred = np.asarray(pred).reshape(9, 9)
    truth = np.asarray(truth).reshape(9, 9)
    wrong = [(int(r), int(c), int(truth[r, c]), int(pred[r, c]))
             for r in range(9) for c in range(9)
             if pred[r, c] != truth[r, c]]
    return {
        "cell_accuracy": 1.0 - len(wrong) / 81.0,
        "wrong_cells": wrong,
        "digit_accuracy": float(
            np.mean(pred[truth != 0] == truth[truth != 0]))
        if (truth != 0).any() else 1.0,
        "empty_accuracy": float(
            np.mean(pred[truth == 0] == 0)) if (truth == 0).any() else 1.0,
    }


def run_single_test(case: dict, config=None) -> dict:
    from sudoku_vision_tpu.pipeline.run_v2 import PipelineConfig, run_pipeline

    config = config or PipelineConfig(check_quality=False)
    truth = parse81(case["puzzle"])
    t0 = time.perf_counter()
    res = run_pipeline(case["image_path"], config)
    latency_ms = (time.perf_counter() - t0) * 1e3
    detected = res.status not in ("detection_failed", "quality_failed")
    diff = compare_grids(res.recognized_grid, truth) if detected else None
    solved_ok = False
    if res.solved_grid is not None and case.get("solution"):
        solved_ok = np.array_equal(res.solved_grid,
                                   parse81(case["solution"]))
    return {
        "image": os.path.basename(case["image_path"]),
        "category": case.get("metadata", {}).get("category", "unknown"),
        "status": res.status,
        "detected": detected,
        "pred_grid": np.asarray(res.recognized_grid).reshape(-1).tolist(),
        "corrected_grid": (np.asarray(res.corrected_grid).reshape(-1).tolist()
                           if res.corrected_grid is not None else None),
        "truth_grid": truth.reshape(-1).tolist(),
        "diff": diff,
        "solved_ok": bool(solved_ok),
        "latency_ms": latency_ms,
        "corrections": [[list(cell), int(old), int(new)]
                        for cell, old, new in (res.corrections or [])],
    }


def run_test_suite(ground_truth_path: str, config=None,
                   save_failures: str | None = None):
    cases = load_ground_truth(ground_truth_path)
    results = [run_single_test(c, config) for c in cases]
    metrics = compute_metrics(results)
    if save_failures:
        os.makedirs(save_failures, exist_ok=True)
        for r in results:
            if r["diff"] and r["diff"]["wrong_cells"]:
                with open(os.path.join(
                        save_failures,
                        f"failure_{r['image']}.json"), "w") as f:
                    json.dump(r, f, indent=2)
    return results, metrics


def print_summary(results: list[dict], metrics: PerformanceMetrics):
    print(f"cases: {metrics.n_cases}  "
          f"detection: {metrics.grid_detection_rate:.0%}  "
          f"cell acc: {metrics.cell_accuracy:.3f}  "
          f"digit acc: {metrics.digit_accuracy:.3f}  "
          f"empty acc: {metrics.empty_accuracy:.3f}  "
          f"solved: {metrics.solution_rate:.0%}")
    print(f"latency ms: avg {metrics.avg_latency_ms:.0f} "
          f"p50 {metrics.p50_latency_ms:.0f} p95 {metrics.p95_latency_ms:.0f}")
    for r in results:
        d = r["diff"]
        acc = f"{d['cell_accuracy']:.3f}" if d else "-"
        nerr = len(d["wrong_cells"]) if d else "-"
        print(f"  {r['image']:<16} {r['status']:<18} cells {acc} "
              f"errors {nerr} solved_ok={r['solved_ok']}")
    # Per-category breakdown (reference e2e_runner.py:193 schema).
    by_cat: dict[str, list[dict]] = {}
    for r in results:
        by_cat.setdefault(r["category"], []).append(r)
    if len(by_cat) > 1:
        print("per category:")
        for cat, rs in sorted(by_cat.items()):
            accs = [r["diff"]["cell_accuracy"] for r in rs if r["diff"]]
            acc = sum(accs) / len(accs) if accs else 0.0
            det = sum(r["detected"] for r in rs) / len(rs)
            solved = sum(r["solved_ok"] for r in rs) / len(rs)
            print(f"  {cat:<16} n={len(rs):<3} detect {det:.0%}  "
                  f"cells {acc:.3f}  solved {solved:.0%}")
    if metrics.top_confusions:
        print("top confusions (truth->pred:count):",
              ", ".join(f"{t}->{p}:{n}"
                        for t, p, n in metrics.top_confusions[:5]))


def main(argv=None) -> int:
    from sudoku_vision_tpu.utils import jax_cache

    jax_cache.enable()
    p = argparse.ArgumentParser(description="e2e ground-truth harness")
    p.add_argument("--ground-truth", default="data/test_e2e/ground_truth.json")
    p.add_argument("--save-failures")
    p.add_argument("--results-json")
    p.add_argument("--model", default="v3")
    p.add_argument("--history", action="store_true",
                   help="append metrics to logs/metrics_history.jsonl")
    args = p.parse_args(argv)

    from sudoku_vision_tpu.pipeline.run_v2 import PipelineConfig

    config = PipelineConfig(check_quality=False, model=args.model)
    results, metrics = run_test_suite(args.ground_truth, config,
                                      args.save_failures)
    print_summary(results, metrics)
    if args.results_json:
        with open(args.results_json, "w") as f:
            json.dump({"results": results,
                       "metrics": metrics.__dict__}, f, indent=2,
                      default=str)
    if args.history:
        save_metrics_to_history(metrics)
    return 0 if metrics.grid_detection_rate == 1.0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
