"""1-vs-7 disambiguation specialist for low-confidence reads.

The one standing wrong-solve class after four rounds is a handwritten
"1" read as "7" at sub-gate confidence (sweep 90210 s099, e2e
confusions 1->7). Retraining the flagship is measurably the wrong tool:
every fine-tune that fixed one marginal cell flipped another (PLAN.md
"real-data fine-tune saga", round-2 negative-results note). The fix the
reference's design points at — its uncertainty machinery exists for
exactly these cells (reference ml/model_v3.py:186 MC-dropout,
pipeline/run_v2.py:311 low-confidence reporting) — is a SPECIALIST:
a ~3k-param binary head trained only on the 1-vs-7 decision, consulted
only when the flagship's read is a low-confidence 1 or 7, blending the
two classes' probability mass by the specialist's posterior
(pipeline/graph.py::blend_17). High-confidence reads are untouched, so
the flagship's calibrated behavior everywhere else cannot regress.

Training data is synthetic print + procedural stroke glyphs
(ml/generate_synthetic.py, ml/stroke_digits.py) at a high handwritten
fraction; evaluation is the deployment distribution: pipeline-harvested
scene cells (tools/harvest_scene_cells.py) and the real golden-photo
cells, classes 1 and 7 only.
"""

from __future__ import annotations

import argparse
import json
import os
import random
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

CKPT_NAME = "digit_17"


class Disambig17(nn.Module):
    """Binary 1-vs-7 head on the canonical preprocessed cell input
    (the SAME (28, 28, 1) [-1, 1] tensor the flagship consumes, so the
    graph evaluates both from one preproc pass). Output: logits
    [is_1, is_7]."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        x = nn.Conv(8, (3, 3), padding="SAME", dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.Conv(16, (3, 3), padding="SAME", dtype=self.dtype)(x)
        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(2, dtype=self.dtype)(x).astype(jnp.float32)


def make_dataset(n_per_class: int, seed: int,
                 stroke_frac: float = 0.5) -> tuple[np.ndarray, np.ndarray]:
    """(N, 28, 28) uint8 raw cells + labels (0 = digit 1, 1 = digit 7)."""
    from sudoku_vision_tpu.ml import generate_synthetic as gs

    rng = random.Random(seed)
    fonts = gs.find_available_fonts() or [None]
    old = gs._STROKE_FRAC
    gs._STROKE_FRAC = stroke_frac
    try:
        cells, labels = [], []
        for digit, label in ((1, 0), (7, 1)):
            for _ in range(n_per_class):
                cells.append(gs.generate_digit_cell(digit, fonts, rng))
                labels.append(label)
    finally:
        gs._STROKE_FRAC = old
    return np.stack(cells), np.asarray(labels, np.int32)


def preprocess(cells_u8: np.ndarray) -> np.ndarray:
    """Canonical no-CLAHE model input (must match the deployed graph —
    cv/extract.py::preprocess_cells_for_model(use_clahe=False))."""
    from sudoku_vision_tpu.cv.extract import preprocess_cells_for_model

    out = []
    for i in range(0, len(cells_u8), 512):
        out.append(np.asarray(preprocess_cells_for_model(
            jnp.asarray(cells_u8[i:i + 512]), use_clahe=False)))
    return np.concatenate(out)


def _load_dir_cells(root: str, size: int = 28):
    """Class-dir layout -> 1/7 cells + labels (PIL load)."""
    from PIL import Image

    cells, labels = [], []
    for digit, label in ((1, 0), (7, 1)):
        d = os.path.join(root, str(digit))
        if not os.path.isdir(d):
            continue
        for f in sorted(os.listdir(d)):
            img = Image.open(os.path.join(d, f)).convert("L")
            if img.size != (size, size):
                img = img.resize((size, size), Image.BILINEAR)
            cells.append(np.asarray(img, np.uint8))
            labels.append(label)
    if not cells:
        return None
    return np.stack(cells), np.asarray(labels, np.int32)


def train(n_per_class: int = 8000, epochs: int = 6, lr: float = 2e-3,
          batch: int = 256, seed: int = 0,
          eval_dirs: tuple = ("data/scene_cells/train",
                              "data/scene_cells/val",
                              "data/real/train")) -> dict:
    import optax

    from sudoku_vision_tpu.ml import checkpoint as ckpt

    cells, labels = make_dataset(n_per_class, seed)
    x = preprocess(cells)
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(x))
    x, labels = x[order], labels[order]
    n_val = max(256, len(x) // 20)
    xv, yv = x[:n_val], labels[:n_val]
    xt, yt = x[n_val:], labels[n_val:]

    model = Disambig17()
    variables = model.init(jax.random.PRNGKey(seed), xt[:2])
    tx = optax.adamw(lr)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss_fn(p):
            logits = model.apply({"params": p}, xb)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, yb).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def acc_fn(params, xb, yb):
        logits = model.apply({"params": params}, xb)
        return (jnp.argmax(logits, -1) == yb).mean()

    params = variables["params"]
    steps = max(1, len(xt) // batch)
    for ep in range(epochs):
        perm = rng.permutation(len(xt))
        tot = 0.0
        for i in range(steps):
            sl = perm[i * batch:(i + 1) * batch]
            params, opt_state, loss = step(params, opt_state, xt[sl], yt[sl])
            tot += float(loss)
        va = float(acc_fn(params, xv, yv))
        print(f"epoch {ep}: loss {tot / steps:.4f} val acc {va:.4f}")

    metrics = {"val_acc": va, "n_train": len(xt), "use_clahe": False}
    for d in eval_dirs:
        got = _load_dir_cells(d)
        if got is None:
            continue
        xc, yc = got
        a = float(acc_fn(params, preprocess(xc), yc))
        metrics[f"acc:{d}"] = round(a, 4)
        print(f"  {d}: n={len(yc)} acc {a:.4f}")
    ckpt.save_variables(CKPT_NAME, {"params": params}, metrics)
    print(json.dumps(metrics))
    return metrics


def load_aux17():
    """(model, variables) when the specialist checkpoint exists, else
    None — perceive(aux17=...) is gated on it."""
    from sudoku_vision_tpu.ml import checkpoint as ckpt

    variables = ckpt.load_variables_or_none(CKPT_NAME)
    if variables is None:
        return None
    return Disambig17(), variables


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="train the 1v7 specialist")
    p.add_argument("--n-per-class", type=int, default=8000)
    p.add_argument("--epochs", type=int, default=6)
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    train(args.n_per_class, args.epochs, args.lr, seed=args.seed)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
