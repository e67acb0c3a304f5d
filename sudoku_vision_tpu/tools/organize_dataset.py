"""Dataset organization: labels -> stratified class-dir splits.

Capability parity with reference tools/organize_dataset.py: consolidate
labels, stratified 70/15/15 train/val/test split (:90), class-directory
layout + per-split CSV manifests (:137, :186), and a leakage check
(:231) — extended beyond the reference's file-identity check to GROUP
(source photo) level: cells from one photo share paper, lighting, lens
and font, so scattering them across train and test measures same-photo
memorization, not generalization. The deployment split is photo-level
(`--by-photo`): whole photos are assigned to splits and the held-out
test photos are never seen by training OR checkpoint selection.

CLI (cell-level, reference parity):
    python -m sudoku_vision_tpu.tools.organize_dataset \
        --cells data/cells --labels data/cells/labels.csv --out data/real

CLI (photo-level, the honest deployment split):
    python -m sudoku_vision_tpu.tools.organize_dataset \
        --cells data/cells --labels data/cells/labeled_cells.json \
        --out data/real --by-photo --test-photos sample_3,sample_5 \
        --val-photos sample_4
"""

from __future__ import annotations

import argparse
import csv
import os
import shutil
from collections import defaultdict

import numpy as np


def stratified_split(items_by_class: dict, fractions=(0.7, 0.15, 0.15),
                     seed: int = 0) -> dict:
    """Per-class shuffled split (reference :90)."""
    rng = np.random.default_rng(seed)
    splits = {"train": [], "val": [], "test": []}
    for cls, items in sorted(items_by_class.items()):
        idx = rng.permutation(len(items))
        n_train = int(len(items) * fractions[0])
        n_val = int(len(items) * fractions[1])
        for k, name in (("train", idx[:n_train]),
                        ("val", idx[n_train:n_train + n_val]),
                        ("test", idx[n_train + n_val:])):
            splits[k] += [(cls, items[i]) for i in name]
    return splits


def copy_files_to_split(splits: dict, cells_dir: str, out_dir: str):
    """Class-dir layout (reference :137)."""
    for split, entries in splits.items():
        for cls, (img, fn) in entries:
            d = os.path.join(out_dir, split, str(cls))
            os.makedirs(d, exist_ok=True)
            shutil.copy(os.path.join(cells_dir, img, fn),
                        os.path.join(d, f"{img}__{fn}"))


def create_split_manifests(splits: dict, out_dir: str):
    """Per-split CSVs (reference :186)."""
    for split, entries in splits.items():
        with open(os.path.join(out_dir, f"{split}.csv"), "w",
                  newline="") as f:
            w = csv.writer(f)
            w.writerow(["class", "image", "filename"])
            for cls, (img, fn) in entries:
                w.writerow([cls, img, fn])


def photo_split(items_by_class: dict, test_photos: set,
                val_photos: set) -> dict:
    """Photo-level split: every cell follows its SOURCE photo, so the
    test photos are entirely unseen paper/lighting/lens/font. Beyond
    reference tools/organize_dataset.py:90 (which splits at cell level
    and therefore leaks photo identity into test)."""
    splits = {"train": [], "val": [], "test": []}
    for cls, items in sorted(items_by_class.items()):
        for img, fn in items:
            if img in test_photos:
                splits["test"].append((cls, (img, fn)))
            elif img in val_photos:
                splits["val"].append((cls, (img, fn)))
            else:
                splits["train"].append((cls, (img, fn)))
    return splits


def verify_no_leakage(splits: dict, by_photo: bool = False) -> bool:
    """No sample in two splits (reference :231). With `by_photo`, also
    no PHOTO in two splits — the file-identity check alone blesses a
    split that trains and tests on cells of the same photograph."""
    seen: dict = {}
    photo_split_of: dict = {}
    for split, entries in splits.items():
        for _, key in entries:
            if key in seen and seen[key] != split:
                return False
            seen[key] = split
            if by_photo:
                photo = key[0] if isinstance(key, tuple) else key
                if photo_split_of.setdefault(photo, split) != split:
                    return False
    return True


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="organize labeled cells")
    p.add_argument("--cells", required=True)
    p.add_argument("--labels", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--by-photo", action="store_true",
                   help="assign whole photos to splits (honest holdout)")
    p.add_argument("--test-photos", default="",
                   help="comma-separated photo stems held out for test")
    p.add_argument("--val-photos", default="",
                   help="comma-separated photo stems for selection val")
    args = p.parse_args(argv)

    items_by_class = defaultdict(list)
    with open(args.labels) as f:
        for row in csv.DictReader(f):
            items_by_class[int(row["label"])].append(
                (row["image"], row["filename"]))
    if args.by_photo:
        test_p = {s for s in args.test_photos.split(",") if s}
        val_p = {s for s in args.val_photos.split(",") if s}
        all_p = {img for items in items_by_class.values()
                 for img, _ in items}
        missing = (test_p | val_p) - all_p
        assert not missing, f"unknown photos: {missing}"
        splits = photo_split(items_by_class, test_p, val_p)
        assert verify_no_leakage(splits, by_photo=True), "photo leakage"
    else:
        splits = stratified_split(items_by_class, seed=args.seed)
        assert verify_no_leakage(splits), "split leakage detected"
    copy_files_to_split(splits, args.cells, args.out)
    create_split_manifests(splits, args.out)
    for split, entries in splits.items():
        counts = defaultdict(int)
        for cls, _ in entries:
            counts[cls] += 1
        print(f"{split}: {len(entries)} samples "
              f"{dict(sorted(counts.items()))}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
