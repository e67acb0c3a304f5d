"""Tests for the data tooling (reference tools/ capability): dataset
organization (stratified split + leakage check), offline augmentation,
stats, label conversions, synthetic generation. Host-only — fast."""

import csv
import json
import os
import random

import numpy as np
import pytest
from PIL import Image


@pytest.fixture()
def cells_tree(tmp_path):
    """Fake extracted-cells tree: 2 images x 81 cells + labels.csv."""
    rng = np.random.default_rng(0)
    labels = {}
    for img in ("img_a", "img_b"):
        d = tmp_path / "cells" / img
        d.mkdir(parents=True)
        for r in range(3):
            for c in range(3):
                fn = f"cell_{r}_{c}.png"
                Image.fromarray(
                    rng.integers(0, 255, (28, 28), np.uint8)).save(d / fn)
                labels[(img, fn)] = (r * 3 + c) % 10
    with open(tmp_path / "cells" / "labels.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["image", "filename", "label"])
        for (img, fn), lab in labels.items():
            w.writerow([img, fn, lab])
    return tmp_path / "cells"


def test_organize_dataset(cells_tree, tmp_path):
    from sudoku_vision_tpu.tools.organize_dataset import main

    out = tmp_path / "organized"
    rc = main(["--cells", str(cells_tree),
               "--labels", str(cells_tree / "labels.csv"),
               "--out", str(out)])
    assert rc == 0
    assert (out / "train.csv").exists()
    # all 18 samples land in exactly one split
    total = 0
    seen = set()
    for split in ("train", "val", "test"):
        with open(out / f"{split}.csv") as f:
            for row in csv.DictReader(f):
                key = (row["image"], row["filename"])
                assert key not in seen
                seen.add(key)
                total += 1
    assert total == 18


def test_augment_data(cells_tree, tmp_path):
    from sudoku_vision_tpu.tools.augment_data import (
        OPS, create_augmentation_pipeline, main,
    )

    # class-dir layout input
    src = tmp_path / "classdirs"
    (src / "3").mkdir(parents=True)
    Image.fromarray(np.full((28, 28), 128, np.uint8)).save(
        src / "3" / "x.png")
    out = tmp_path / "aug"
    rc = main(["--input", str(src), "--output", str(out), "--times", "2"])
    assert rc == 0
    files = os.listdir(out / "3")
    assert len(files) == 3  # original + 2 augmented
    # every op runs standalone
    rng = random.Random(0)
    img = Image.fromarray(np.full((28, 28), 128, np.uint8))
    for name, op in OPS.items():
        res = op(img.copy(), rng)
        assert res.size == (28, 28), name
    fn, chosen = create_augmentation_pipeline("heavy", rng)
    assert chosen and fn(img.copy()).size == (28, 28)


def test_dataset_stats(tmp_path):
    from sudoku_vision_tpu.tools.dataset_stats import analyze_directory_structure

    root = tmp_path / "ds"
    for split in ("train", "val"):
        for cls in range(10):
            d = root / split / str(cls)
            d.mkdir(parents=True)
            n = 5 if cls else 50  # imbalance on class 0
            for i in range(n):
                Image.fromarray(
                    np.zeros((28, 28), np.uint8)).save(d / f"{i}.png")
    report = analyze_directory_structure(str(root))
    assert report["splits"]["train"]["total"] == 50 + 9 * 5
    assert any("imbalance" in i for i in report["issues"])


def test_prepare_real_data(cells_tree, tmp_path):
    from sudoku_vision_tpu.tools.prepare_real_data import main

    rc = main(["--labels", str(cells_tree / "labels.csv"),
               "--cells", str(cells_tree),
               "--per-image-csvs",
               "--class-dirs", str(tmp_path / "cd")])
    assert rc == 0
    assert (cells_tree / "labels_img_a.csv").exists()
    assert os.path.isdir(tmp_path / "cd")
    # class dirs consumable by the dataset loader
    from sudoku_vision_tpu.ml.datasets import load_real_cells

    ds = load_real_cells(str(cells_tree))
    assert len(ds) == 18
    assert ds.images.shape == (18, 28, 28)


def test_generate_synthetic_small(tmp_path):
    from sudoku_vision_tpu.ml.generate_synthetic import generate_dataset

    meta = generate_dataset(str(tmp_path / "syn"), per_class=4,
                            val_frac=0.25, seed=0)
    assert meta["classes"] == 10
    from sudoku_vision_tpu.ml.datasets import load_class_dirs

    train = load_class_dirs(str(tmp_path / "syn"), "train")
    val = load_class_dirs(str(tmp_path / "syn"), "val")
    assert len(train) == 30 and len(val) == 10
    assert train.images.dtype == np.uint8


def test_stroke_digits_render():
    from sudoku_vision_tpu.ml.stroke_digits import render_stroke_digit

    rng = random.Random(0)
    for d in range(1, 10):
        m = render_stroke_digit(d, 64, rng)
        assert m.shape == (64, 64)
        assert 0.01 < m.mean() < 0.5  # some ink, not flooded
