"""Dataset loading for digit-cell training.

Capability parity with reference ml/datasets.py: class-directory synthetic
datasets (:49 SyntheticDataset), real labeled cells from per-image dirs +
CSV labels (:97 RealDataset), class weighting (:169), balanced sampling
(:189), combined synthetic+real with real oversampling (:205).

TPU-first redesign: datasets are loaded once into host RAM as contiguous
uint8 arrays (cells are tiny — 784 bytes each) and batches are sliced by
a numpy RNG; the canonical cell preprocessing (CLAHE -> threshold ->
invert -> normalize, the SAME jax function inference uses:
cv.extract.preprocess_cells_for_model) plus augmentation run ON DEVICE
inside the jitted train step — there is no per-sample Python transform
and no DataLoader worker pool to feed.
"""

from __future__ import annotations

import csv
import os
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np
from PIL import Image


@dataclass
class CellDataset:
    """In-memory dataset: raw uint8 cells + labels."""

    images: np.ndarray   # (N, 28, 28) uint8 — RAW cells (pre-preproc)
    labels: np.ndarray   # (N,) int32, 0..9
    name: str = "cells"

    def __len__(self) -> int:
        return len(self.labels)

    def class_counts(self) -> np.ndarray:
        return np.bincount(self.labels, minlength=10)

    def class_weights(self) -> np.ndarray:
        """Inverse-frequency weights (reference datasets.py:169)."""
        counts = np.maximum(self.class_counts(), 1)
        w = len(self.labels) / (10.0 * counts)
        return w.astype(np.float32)


def load_class_dirs(root: str, split: str = "train",
                    name: Optional[str] = None) -> CellDataset:
    """Load <root>/<split>/<class 0..9>/*.png (reference datasets.py:49)."""
    images, labels = [], []
    base = os.path.join(root, split)
    for cls in range(10):
        d = os.path.join(base, str(cls))
        if not os.path.isdir(d):
            continue
        for f in sorted(os.listdir(d)):
            if not f.lower().endswith((".png", ".jpg", ".jpeg")):
                continue
            with Image.open(os.path.join(d, f)) as im:
                arr = np.asarray(im.convert("L"), np.uint8)
            if arr.shape != (28, 28):
                arr = np.asarray(
                    Image.fromarray(arr).resize((28, 28), Image.BILINEAR))
            images.append(arr)
            labels.append(cls)
    if not images:
        raise FileNotFoundError(f"no class dirs under {base}")
    return CellDataset(np.stack(images), np.asarray(labels, np.int32),
                       name or f"{os.path.basename(root)}/{split}")


def load_real_cells(root: str, labels_csv: Optional[str] = None) -> CellDataset:
    """Real labeled cells (reference datasets.py:97 RealDataset).

    Layout: <root>/<image_name>/cell_r_c.png with labels in
    <root>/labels_<image_name>.csv (columns: filename,label) or a single
    labels.csv with (image,filename,label).
    """
    images, labels = [], []

    def add(path: str, label: int):
        with Image.open(path) as im:
            arr = np.asarray(im.convert("L"), np.uint8)
        if arr.shape != (28, 28):
            arr = np.asarray(
                Image.fromarray(arr).resize((28, 28), Image.BILINEAR))
        images.append(arr)
        labels.append(label)

    if labels_csv and os.path.exists(labels_csv):
        with open(labels_csv) as f:
            for row in csv.DictReader(f):
                img_dir = row.get("image", "")
                add(os.path.join(root, img_dir, row["filename"]),
                    int(row["label"]))
    else:
        for entry in sorted(os.listdir(root)):
            csv_path = os.path.join(root, f"labels_{entry}.csv")
            img_dir = os.path.join(root, entry)
            if not (os.path.isdir(img_dir) and os.path.exists(csv_path)):
                continue
            with open(csv_path) as f:
                for row in csv.DictReader(f):
                    add(os.path.join(img_dir, row["filename"]),
                        int(row["label"]))
    if not images:
        raise FileNotFoundError(f"no labeled real cells under {root}")
    return CellDataset(np.stack(images), np.asarray(labels, np.int32), "real")


def combine(synthetic: CellDataset, real: CellDataset,
            real_weight: int = 5,
            real_empty_weight: int | None = None) -> CellDataset:
    """Synthetic + real with real oversampling (reference datasets.py:205).

    real_empty_weight lets the empty class (0) be oversampled LESS than
    digits. Harvested real cells are empty-dominated (a sudoku grid is
    ~60% blanks), so a flat real_weight multiplies that imbalance into a
    skewed class prior — round 3 measured the deployed model flipping
    low-margin digits to 'empty' after such a fine-tune. Empty cells are
    also the EASY class (blank paper); the scarce signal worth
    oversampling is the ~40% that carry printed digits.
    """
    if real_empty_weight is None:
        real_empty_weight = real_weight
    digit = real.labels != 0
    parts_img = [synthetic.images]
    parts_lab = [synthetic.labels]
    parts_img += [real.images[digit]] * real_weight
    parts_lab += [real.labels[digit]] * real_weight
    parts_img += [real.images[~digit]] * real_empty_weight
    parts_lab += [real.labels[~digit]] * real_empty_weight
    return CellDataset(np.concatenate(parts_img),
                       np.concatenate(parts_lab), "combined")


def load_mnist(split: str = "train") -> CellDataset:
    """MNIST via torchvision (present in the image), as raw uint8 cells.

    MNIST digits are white-on-black; sudoku cell convention is dark ink on
    light paper, so we invert. Class 0 (empty) is absent in MNIST — the
    reference trains MNIST-only models with the same caveat
    (reference ml/train.py:234 dataset choice 'mnist').
    """
    from torchvision import datasets as tvd  # lazy; torch is CPU-only here

    ds = tvd.MNIST(root=os.path.expanduser("~/.cache/mnist"),
                   train=split == "train", download=True)
    images = 255 - ds.data.numpy().astype(np.uint8)
    labels = ds.targets.numpy().astype(np.int32)
    return CellDataset(images, labels, f"mnist/{split}")


def batches(
    ds: CellDataset,
    batch_size: int,
    rng: np.random.Generator,
    balanced: bool = False,
    drop_last: bool = True,
) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Shuffled (optionally class-balanced) minibatch iterator.

    balanced=True implements WeightedRandomSampler semantics (reference
    datasets.py:189): samples drawn with inverse-class-frequency
    probability, with replacement.
    """
    n = len(ds)
    if balanced:
        w = ds.class_weights()[ds.labels]
        p = w / w.sum()
        idx = rng.choice(n, size=n, replace=True, p=p)
    else:
        idx = rng.permutation(n)
    end = n - (n % batch_size) if drop_last else n
    for i in range(0, end, batch_size):
        j = idx[i:i + batch_size]
        yield ds.images[j], ds.labels[j]
