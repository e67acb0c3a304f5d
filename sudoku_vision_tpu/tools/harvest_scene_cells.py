"""Harvest PIPELINE-DISTRIBUTION training cells from synthetic scenes.

Round-3 lesson: fine-tuning on upright real cells alone drifts the
classifier's decision boundary and flips marginal DEPLOYMENT cells
(rotated 6s read as empty, 7-vs-1 at conf 0.52 — the whack-a-mole
recorded in PLAN.md). The structural fix is to make the fine-tune set
contain the deployment distribution itself: render full scenes
(rotated / motion-blur / shadow / glare / low-light / skew / screen ...),
push them through the REAL perception graph (detect -> warp -> extract,
pipeline/graph.py::perceive), and label the resulting 28x28 crops from
the scene's exact ground truth. Cells arrive with the pipeline's own
artifacts — residual rotation, boundary-snap jitter, resample blur —
which no cell-level augmentation reproduces faithfully.

Label safety: a scene is harvested ONLY when the detected quad agrees
with the ground-truth page corners to --corner-tol px (after
auto-orientation, perceive's corners[0] is the upright grid's tl, which
must match the truth's tl..bl). A mis-detected scene would mislabel all
81 cells, so it is skipped and counted.

Analog in the reference: tools/extract_cells.py + manual labeling
(reference tools/label_cells.py); here the generator supplies the
labels, so the loop is human-free and scales to thousands of cells.

Usage:
    python -m sudoku_vision_tpu.tools.harvest_scene_cells \
        --n 120 --seed-base 31000 --out data/scene_cells
"""

from __future__ import annotations

import argparse
import collections
import json
import os
import random

import numpy as np

#: Deployment-mix categories. "facing_pages" and "occluded" are excluded:
#: their decoy geometry makes corner agreement the common failure, so
#: they contribute mostly skips; every other category earns its slot.
CATEGORIES = (
    "printed_clean", "printed_skew", "shadow", "glare", "low_light",
    "newsprint", "far_away", "rotated", "motion_blur", "screen",
    "handwritten", "curved_page",
)


def harvest(n: int, seed_base: int, out_dir: str,
            size=(768, 1024), corner_tol: float = 6.0,
            val_every: int = 10) -> dict:
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from sudoku_vision_tpu.ml.generate_scenes import render_scene
    from sudoku_vision_tpu.pipeline.run_v2 import load_model
    from sudoku_vision_tpu.pipeline.graph import perceive
    from sudoku_vision_tpu.utils import jax_cache

    jax_cache.enable()
    model, variables, temperature, ckpt_name, use_clahe = load_model("v3")

    @jax.jit
    def fn(img):
        out = perceive(img, model, variables,
                       temperature=jnp.float32(temperature),
                       use_clahe=use_clahe, orient="auto")
        return out.cells, out.corners, out.grid_found

    stats = collections.Counter()
    rows = []  # (split, label, cell uint8 (28, 28), scene_name)
    for i in range(n):
        rng = random.Random(seed_base * 1_000_003 + i)
        category = CATEGORIES[i % len(CATEGORIES)]
        img, truth = render_scene(rng, size=size, category=category)
        cells, corners, found = fn(jnp.asarray(np.asarray(img)))
        if not bool(found):
            stats[f"skip_nodetect_{category}"] += 1
            continue
        want = np.asarray(truth["corners"], np.float32)
        err = float(np.abs(np.asarray(corners) - want).max())
        if err > corner_tol:
            stats[f"skip_corners_{category}"] += 1
            continue
        split = "val" if i % val_every == 0 else "train"
        puzzle = truth["puzzle"]
        cells_np = np.asarray(cells)
        for k in range(81):
            rows.append((split, int(puzzle[k]), cells_np[k],
                         f"s{i:04d}_{category}"))
        stats[f"ok_{category}"] += 1

    # Balance: empties dominate a sudoku (~60%); keep every digit cell
    # and subsample empties per split to the mean digit-class count.
    per = collections.defaultdict(list)
    for split, label, cell, scene in rows:
        per[(split, label)].append((cell, scene))
    rng_bal = random.Random(seed_base)
    kept = collections.Counter()
    for split in ("train", "val"):
        digit_counts = [len(per[(split, d)]) for d in range(1, 10)]
        cap = max(1, int(np.mean(digit_counts))) if digit_counts else 0
        empties = per[(split, 0)]
        rng_bal.shuffle(empties)
        per[(split, 0)] = empties[:cap]
        for label in range(10):
            d = os.path.join(out_dir, split, str(label))
            os.makedirs(d, exist_ok=True)
            for j, (cell, scene) in enumerate(per[(split, label)]):
                Image.fromarray(cell).save(
                    os.path.join(d, f"{scene}_{j:04d}.png"))
                kept[(split, label)] += 1

    meta = {
        "n_scenes": n, "seed_base": seed_base, "size": list(size),
        "corner_tol": corner_tol, "checkpoint": ckpt_name,
        "scenes": {k: v for k, v in sorted(stats.items())},
        "cells": {f"{s}/{l}": kept[(s, l)]
                  for s in ("train", "val") for l in range(10)},
    }
    with open(os.path.join(out_dir, "metadata.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return meta


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--n", type=int, default=120)
    p.add_argument("--seed-base", type=int, default=31000)
    p.add_argument("--out", default="data/scene_cells")
    p.add_argument("--height", type=int, default=768)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--corner-tol", type=float, default=6.0)
    args = p.parse_args(argv)
    meta = harvest(args.n, args.seed_base, args.out,
                   (args.height, args.width), args.corner_tol)
    ok = sum(v for k, v in meta["scenes"].items() if k.startswith("ok"))
    skip = sum(v for k, v in meta["scenes"].items() if k.startswith("skip"))
    n_cells = sum(meta["cells"].values())
    print(f"harvested {ok} scenes ({skip} skipped) -> {n_cells} cells "
          f"in {args.out}")
    print(json.dumps(meta["scenes"], indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
