"""Fresh-seed robustness sweep over synthetic full scenes.

The 44-case e2e set (data/test_e2e) is fixed — thresholds get tuned
against it, so it cannot also measure generalization. This tool renders
N NEVER-SEEN scenes (deterministic per --seed-base, cycling every
category in ml/generate_scenes.py) and runs each through the full v2
pipeline, classifying outcomes:

  solved_correct — status solved AND the solution matches ground truth;
  wrong_solve    — status solved but the solution is WRONG (the silent
                   failure class: the user gets a confident wrong answer);
  honest_fail    — pipeline reports failure (detection_failed / invalid /
                   unsolvable / quality_failed): safe, visible.

Failures are saved (scene JPEG + truth + result JSON) for debugging.
All scenes share one image size so the TPU graph compiles once.

Reference anchor: the e2e schema with category breakdown (reference
tests/e2e_runner.py:193); this extends it from a fixed validation set to
a generator-driven sweep the fixed set's thresholds were never fit to.

CLI:
    python -m sudoku_vision_tpu.harness.scene_sweep \
        --n 130 --seed-base 7000 [--out /tmp/sweep] [--categories a,b]
"""

from __future__ import annotations

import argparse
import json
import os
import random

import numpy as np

from sudoku_vision_tpu.harness.e2e_runner import compare_grids, parse81
from sudoku_vision_tpu.ml.generate_scenes import CATEGORIES, render_scene

HONEST = ("detection_failed", "quality_failed", "invalid", "unsolvable",
          "ambiguous")


def sweep_case(i: int, seed_base: int, size, categories,
               config=None) -> tuple[dict, np.ndarray, dict]:
    """Render + run scene #i. Returns (record, image, truth)."""
    from sudoku_vision_tpu.pipeline.run_v2 import run_pipeline

    category = categories[i % len(categories)]
    rng = random.Random(seed_base * 1_000_003 + i)
    img, truth = render_scene(rng, size=size, category=category)
    res = run_pipeline(img, config)
    rec = {
        "name": f"s{i:03d}_{category}",
        "seed": seed_base * 1_000_003 + i,
        "category": category,
        "status": res.status,
        "solved_ok": bool(
            res.solved_grid is not None
            and np.array_equal(res.solved_grid, parse81(truth["solution"]))),
        "corrections": len(res.corrections or []),
    }
    if res.status not in ("detection_failed", "quality_failed"):
        rec["diff"] = compare_grids(res.recognized_grid,
                                    parse81(truth["puzzle"]))
    rec["outcome"] = (
        "solved_correct" if rec["solved_ok"]
        else "honest_fail" if res.status in HONEST
        else "wrong_solve")
    return rec, img, truth


def run_sweep(n: int, seed_base: int, size=(1512, 2016),
              categories=CATEGORIES, out_dir: str | None = None,
              config=None, verbose: bool = True) -> list[dict]:
    from sudoku_vision_tpu.pipeline.run_v2 import PipelineConfig

    config = config or PipelineConfig(check_quality=False)
    records = []
    for i in range(n):
        rec, img, truth = sweep_case(i, seed_base, size, categories, config)
        records.append(rec)
        if verbose:
            print(f"  {rec['name']:<24} {rec['status']:<18} "
                  f"{rec['outcome']}", flush=True)
        if out_dir and rec["outcome"] != "solved_correct":
            os.makedirs(out_dir, exist_ok=True)
            from PIL import Image

            Image.fromarray(img[..., ::-1]).save(
                os.path.join(out_dir, rec["name"] + ".jpg"), quality=92)
            with open(os.path.join(out_dir, rec["name"] + ".json"),
                      "w") as f:
                json.dump({"truth": truth, "record": rec}, f, indent=1)
    return records


def summarize(records: list[dict]) -> dict:
    by_cat: dict[str, dict] = {}
    for r in records:
        c = by_cat.setdefault(r["category"],
                              {"n": 0, "solved_correct": 0,
                               "honest_fail": 0, "wrong_solve": 0})
        c["n"] += 1
        c[r["outcome"]] += 1
    total = {
        "n": len(records),
        "solved_correct": sum(r["outcome"] == "solved_correct"
                              for r in records),
        "honest_fail": sum(r["outcome"] == "honest_fail" for r in records),
        "wrong_solve": sum(r["outcome"] == "wrong_solve" for r in records),
        "by_category": by_cat,
        "failures": [r["name"] for r in records
                     if r["outcome"] != "solved_correct"],
    }
    return total


def main(argv=None) -> int:
    from sudoku_vision_tpu.utils import jax_cache

    jax_cache.enable()
    p = argparse.ArgumentParser(description="fresh-seed scene sweep")
    p.add_argument("--n", type=int, default=130)
    p.add_argument("--seed-base", type=int, default=7000)
    p.add_argument("--size", default="1512x2016")
    p.add_argument("--categories", default=None,
                   help="comma list (default: all)")
    p.add_argument("--out", default=None, help="save failures here")
    p.add_argument("--json", default=None, help="write summary JSON")
    args = p.parse_args(argv)
    h, w = (int(t) for t in args.size.split("x"))
    cats = (tuple(args.categories.split(","))
            if args.categories else CATEGORIES)
    records = run_sweep(args.n, args.seed_base, (h, w), cats, args.out)
    summary = summarize(records)
    print(json.dumps(summary, indent=1))
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"records": records, "summary": summary}, f, indent=1)
    return 0 if summary["wrong_solve"] == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
