"""Derive cell labels from the e2e ground-truth transcriptions.

The reference labels real cells by hand (tools/label_cells.py); for
images whose 81-digit transcription already exists in
data/test_e2e/ground_truth.json this tool writes the consolidated
labels JSON that tools/prepare_real_data.py consumes — closing the
extract -> label -> organize -> train-combined loop without re-keying
2000+ cells (reference tools/prepare_real_data.py:1 pipeline role).

CLI:
    python -m sudoku_vision_tpu.tools.label_from_truth \
        --truth data/test_e2e/ground_truth.json --cells data/cells \
        --out data/cells/labeled_cells.json
"""

from __future__ import annotations

import argparse
import json
import os


def build_labels(truth_path: str, cells_dir: str) -> dict:
    with open(truth_path) as f:
        gt = json.load(f)
    labels = {}
    skipped = []
    for case in gt["test_cases"]:
        stem = os.path.splitext(os.path.basename(case["image_path"]))[0]
        cell_dir = os.path.join(cells_dir, stem)
        if not os.path.isdir(cell_dir):
            skipped.append(stem)
            continue
        puzzle = case["puzzle"]
        for r in range(9):
            for c in range(9):
                fn = f"cell_{r}_{c}.png"
                if os.path.exists(os.path.join(cell_dir, fn)):
                    labels[f"{stem}/{fn}"] = int(puzzle[r * 9 + c])
    if skipped:
        print(f"no extracted cells for: {', '.join(skipped)}")
    return labels


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="labels from ground truth")
    p.add_argument("--truth", default="data/test_e2e/ground_truth.json")
    p.add_argument("--cells", default="data/cells")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)
    labels = build_labels(args.truth, args.cells)
    out = args.out or os.path.join(args.cells, "labeled_cells.json")
    with open(out, "w") as f:
        json.dump(labels, f, indent=0, sort_keys=True)
    # Also the (image, filename, label) CSV tools/organize_dataset.py and
    # the terminal labeler resume from.
    import csv

    csv_path = os.path.splitext(out)[0] + ".csv"
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["image", "filename", "label"])
        for key in sorted(labels):
            img, fn = key.split("/", 1)
            w.writerow([img, fn, labels[key]])
    n_img = len({k.split("/", 1)[0] for k in labels})
    print(f"{len(labels)} cells labeled across {n_img} images -> {out} "
          f"+ {csv_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
