"""Failure pattern mining over e2e results.

Capability parity with reference tests/failure_analysis.py: classify
detection vs quality failures, top digit confusions, edge-cell error
concentration (:126), empty-cell confusion share (:141), ASCII 9x9
error-position heatmap (:212), actionable recommendations (:168).

CLI:
    python -m sudoku_vision_tpu.harness.failure_analysis results.json
"""

from __future__ import annotations

import argparse
import glob
import json
import os
from collections import Counter

import numpy as np


def analyze_failures(results: list[dict]) -> dict:
    """Mine patterns from e2e result dicts (reference :44)."""
    analysis: dict = {
        "n": len(results),
        "status_counts": dict(Counter(r["status"] for r in results)),
        "confusions": [],
        "edge_error_share": 0.0,
        "empty_confusion_share": 0.0,
        "error_heatmap": np.zeros((9, 9), int),
        "recommendations": [],
    }
    confusions: Counter = Counter()
    edge_errors = total_errors = empty_conf = 0
    for r in results:
        if not r.get("diff"):
            continue
        for (row, col, truth, pred) in r["diff"]["wrong_cells"]:
            confusions[(truth, pred)] += 1
            analysis["error_heatmap"][row][col] += 1
            total_errors += 1
            if row in (0, 8) or col in (0, 8):
                edge_errors += 1
            if truth == 0 or pred == 0:
                empty_conf += 1
    analysis["confusions"] = [
        {"truth": t, "pred": p, "count": n}
        for (t, p), n in confusions.most_common(10)]
    if total_errors:
        analysis["edge_error_share"] = edge_errors / total_errors
        analysis["empty_confusion_share"] = empty_conf / total_errors

    # Recommendations (reference :168 style).
    rec = analysis["recommendations"]
    unsolvable = analysis["status_counts"].get("unsolvable", 0)
    invalid = analysis["status_counts"].get("invalid", 0)
    if len(results) and (unsolvable + invalid) / len(results) > 0.3:
        rec.append("over 30% unsolvable/invalid: increase beam width or "
                   "max corrections in the conflict resolver")
    if analysis["edge_error_share"] > 0.5:
        rec.append("errors concentrate on edge cells: check warp margins "
                   "and corner accuracy")
    if analysis["empty_confusion_share"] > 0.4:
        rec.append("many empty<->digit confusions: tune "
                   "cells_empty_mask thresholds or add empty-class "
                   "hard negatives")
    if confusions:
        (t, p), n = confusions.most_common(1)[0]
        if n >= 3:
            rec.append(f"dominant confusion {t}->{p} (x{n}): add synthetic "
                       f"variants disambiguating these glyphs")
    analysis["error_heatmap"] = analysis["error_heatmap"].tolist()
    return analysis


def format_failure_report(analysis: dict) -> str:
    """Human report with ASCII heatmap (reference :212)."""
    lines = [f"cases: {analysis['n']}  status: {analysis['status_counts']}"]
    lines.append("error position heatmap (rows x cols):")
    hm = np.asarray(analysis["error_heatmap"])
    for r in range(9):
        lines.append("  " + " ".join(
            "." if hm[r, c] == 0 else str(min(hm[r, c], 9))
            for c in range(9)))
    if analysis["confusions"]:
        lines.append("top confusions: " + ", ".join(
            f"{c['truth']}->{c['pred']}x{c['count']}"
            for c in analysis["confusions"][:6]))
    lines.append(f"edge error share: {analysis['edge_error_share']:.0%}  "
                 f"empty confusion share: "
                 f"{analysis['empty_confusion_share']:.0%}")
    for rec in analysis["recommendations"]:
        lines.append(f"RECOMMEND: {rec}")
    return "\n".join(lines)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="failure pattern analysis")
    p.add_argument("results", help="results JSON from e2e_runner "
                                   "(--results-json) or a failures dir")
    args = p.parse_args(argv)
    if os.path.isdir(args.results):
        results = []
        for f in glob.glob(os.path.join(args.results, "failure_*.json")):
            with open(f) as fh:
                results.append(json.load(fh))
    else:
        with open(args.results) as fh:
            results = json.load(fh)["results"]
    print(format_failure_report(analyze_failures(results)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
