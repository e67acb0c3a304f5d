"""Label-format conversions for real-cell datasets.

Capability parity with reference tools/create_label_csvs.py +
tools/prepare_real_data.py: convert a consolidated labels JSON
({"<image>/<cell file>": label, ...} or the labeler CSV) into per-image
CSVs (labels_<image>.csv) and/or a class-directory layout consumable by
ml.datasets.load_real_cells / load_class_dirs.

CLI:
    python -m sudoku_vision_tpu.tools.prepare_real_data \
        --labels labeled_cells.json --cells data/cells \
        [--per-image-csvs] [--class-dirs data/real_classdirs]
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import shutil
from collections import defaultdict


def load_labels(path: str) -> dict:
    """-> {(image, filename): label}"""
    out = {}
    if path.endswith(".json"):
        with open(path) as f:
            data = json.load(f)
        items = data.items() if isinstance(data, dict) else (
            ((e["image"] + "/" + e["filename"], e["label"])
             for e in data))
        for key, label in items:
            img, fn = key.split("/", 1)
            out[(img, fn)] = int(label)
    else:
        with open(path) as f:
            for row in csv.DictReader(f):
                out[(row["image"], row["filename"])] = int(row["label"])
    return out


def write_per_image_csvs(labels: dict, cells_dir: str) -> int:
    """labels_<image>.csv next to each image dir (reference
    create_label_csvs.py)."""
    by_image = defaultdict(list)
    for (img, fn), lab in labels.items():
        by_image[img].append((fn, lab))
    for img, rows in by_image.items():
        path = os.path.join(cells_dir, f"labels_{img}.csv")
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["filename", "label"])
            for fn, lab in sorted(rows):
                w.writerow([fn, lab])
    return len(by_image)


def write_class_dirs(labels: dict, cells_dir: str, out_dir: str) -> int:
    """<out>/<class>/<image>__<file>.png layout (reference
    prepare_real_data.py)."""
    n = 0
    for (img, fn), lab in labels.items():
        src = os.path.join(cells_dir, img, fn)
        if not os.path.exists(src):
            continue
        d = os.path.join(out_dir, str(lab))
        os.makedirs(d, exist_ok=True)
        shutil.copy(src, os.path.join(d, f"{img}__{fn}"))
        n += 1
    return n


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="prepare real-cell datasets")
    p.add_argument("--labels", required=True)
    p.add_argument("--cells", required=True)
    p.add_argument("--per-image-csvs", action="store_true")
    p.add_argument("--class-dirs")
    args = p.parse_args(argv)
    labels = load_labels(args.labels)
    print(f"{len(labels)} labels loaded")
    if args.per_image_csvs:
        n = write_per_image_csvs(labels, args.cells)
        print(f"wrote per-image CSVs for {n} images")
    if args.class_dirs:
        n = write_class_dirs(labels, args.cells, args.class_dirs)
        print(f"copied {n} cells into class dirs at {args.class_dirs}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
