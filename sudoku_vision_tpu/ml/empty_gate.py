"""Learned empty-vs-digit gate for the EXPORT bundles.

The honest photo-level holdout (tests/test_real_data.py) showed the
bare flagship calls ~10% of unseen-paper EMPTY cells "digits"
(0.8951 overall, digit recall 1.000, every error an empty-cell false
positive). In-pipeline that is absorbed by the heuristic ink mask +
solver validation (cv/extract.py::cells_empty_mask, the uniqueness
gate) — but every export consumer (ONNX, TorchScript, CoreML, the
offline MLP's teacher) gets the bare model. The reference's design
answer exists unused: EmptyClassifier (reference ml/model_v3.py:285),
a binary pre-filter in front of the digit head; the design target is
95-98% on real print (reference ROADMAP.md:115-118).

This module trains that gate on the empty-cell failure mode the
holdout measured — realistic paper textures, grain, grid artifacts,
smudges, show-through ghosts (ml/generate_synthetic.py's empty
variants) — plus the deployment-distribution scene cells and the real
TRAIN photos, and calibrates its threshold so digit recall stays at
1.0 (an erased given is the dangerous direction — see the s077
uniqueness-gate incident). `bundle_predict` is the exported contract:
gate says empty -> 0, else the flagship's argmax.

The flagship itself is NOT retrained: every fine-tune that moved the
10-class boundary flipped some marginal deployment cell (PLAN.md
"real-data fine-tune saga"); a separate binary gate leaves its
behavior bit-identical.
"""

from __future__ import annotations

import argparse
import json
import random

import jax
import jax.numpy as jnp
import numpy as np

CKPT_NAME = "empty_gate"


def make_dataset(n_per_class: int, seed: int):
    """Synthetic (N, 28, 28) u8 cells + labels (0 = empty, 1 = digit)."""
    from sudoku_vision_tpu.ml import generate_synthetic as gs

    rng = random.Random(seed)
    fonts = gs.find_available_fonts() or [None]
    cells, labels = [], []
    for _ in range(n_per_class):
        cells.append(gs.generate_empty_cell(rng, fonts=fonts))
        labels.append(0)
        cells.append(gs.generate_digit_cell(rng.randint(1, 9), fonts, rng))
        labels.append(1)
    return np.stack(cells), np.asarray(labels, np.int32)


def _load_split(root: str):
    """Class-dir tree -> (cells, binary labels); None when absent."""
    import os

    from PIL import Image

    cells, labels = [], []
    if not os.path.isdir(root):
        return None
    for cls in sorted(os.listdir(root)):
        if not cls.isdigit():
            continue
        d = os.path.join(root, cls)
        for f in sorted(os.listdir(d)):
            img = Image.open(os.path.join(d, f)).convert("L")
            if img.size != (28, 28):
                img = img.resize((28, 28), Image.BILINEAR)
            cells.append(np.asarray(img, np.uint8))
            labels.append(0 if cls == "0" else 1)
    if not cells:
        return None
    return np.stack(cells), np.asarray(labels, np.int32)


def preprocess(cells_u8: np.ndarray) -> np.ndarray:
    """RAW gray cells, normalized to [-1, 1].

    Deliberately NOT the flagship's thresholded input: the adaptive
    threshold amplifies paper grain into ink-like binary noise — the
    very mechanism behind the flagship's empty-cell false positives —
    so a gate consuming the thresholded tensor measured no better than
    the flagship itself (bundle 0.8951 == bare model; the first
    training attempt, kept as the negative result). The ink-vs-paper
    evidence lives in the RAW intensities (the heuristic
    cells_empty_mask works there for the same reason)."""
    x = cells_u8.astype(np.float32) / 255.0
    return ((x - 0.5) / 0.5)[..., None]


def calibrate_threshold(p_empty: np.ndarray, labels: np.ndarray,
                        digit_recall_floor: float = 1.0) -> float:
    """Largest P(empty) cut that keeps digit recall >= floor on the
    calibration set (digits wrongly gated to 'empty' erase givens —
    the dangerous direction).

    The gate fires on p_empty > thr STRICTLY, so thr must equal the
    (k+1)-th largest digit P(empty) — a thr just BELOW it would gate
    that digit too (code-review finding, round 5: the original
    cut*0.999 erased the worst calibration digit, and a 0.95 cap
    could break the floor whenever the worst digit sat above it; the
    first shipped checkpoint recorded digit_recall_cal 0.99906).
    Degenerate case: a digit at p_empty 1.0 with floor 1.0 yields
    thr 1.0 — the gate simply never fires, honoring the floor."""
    digit_p = np.sort(p_empty[labels == 1])
    n = len(digit_p)
    k = int(np.floor((1.0 - digit_recall_floor) * n))
    cut = digit_p[n - 1 - k] if k < n else 0.5
    return float(max(0.5, cut))


def train(n_per_class: int = 10000, epochs: int = 12, lr: float = 2e-3,
          batch: int = 256, seed: int = 0) -> dict:
    import optax

    from sudoku_vision_tpu.ml import checkpoint as ckpt
    from sudoku_vision_tpu.models.cnn import EmptyClassifier

    cells, labels = make_dataset(n_per_class, seed)
    extra = []
    for root in ("data/scene_cells/train", "data/real/train"):
        got = _load_split(root)
        if got is not None:
            extra.append(got)
    if extra:
        cells = np.concatenate([cells] + [c for c, _ in extra])
        labels = np.concatenate([labels] + [y for _, y in extra])
    x = preprocess(cells)
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(x))
    x, labels = x[order], labels[order]
    n_val = max(512, len(x) // 20)
    xv, yv = x[:n_val], labels[:n_val]
    xt, yt = x[n_val:], labels[n_val:]

    model = EmptyClassifier()
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
    def p_empty_fn(params, xb):
        return jax.nn.softmax(model.apply({"params": params}, xb))[:, 0]

    params = variables["params"]
    steps = max(1, len(xt) // batch)
    for ep in range(epochs):
        perm = rng.permutation(len(xt))
        tot = 0.0
        for i in range(steps):
            sl = perm[i * batch:(i + 1) * batch]
            params, opt_state, loss = step(params, opt_state,
                                           xt[sl], yt[sl])
            tot += float(loss)
        pv = np.asarray(p_empty_fn(params, xv))
        acc = float((((pv > 0.5) == (yv == 0))).mean())
        print(f"epoch {ep}: loss {tot / steps:.4f} val acc {acc:.4f}")

    # Calibrate on train+val so the floor holds on everything the gate
    # has seen (held-out photos stay untouched for the honest number).
    p_all = np.concatenate([np.asarray(p_empty_fn(params, x[i:i + 2048]))
                            for i in range(0, len(x), 2048)])
    thr = calibrate_threshold(p_all, labels)
    digit_rec = float((p_all[labels == 1] <= thr).mean())
    empty_acc = float((p_all[labels == 0] > thr).mean())
    metrics = {"threshold": thr, "val_acc": acc,
               "digit_recall_cal": round(digit_rec, 5),
               "empty_acc_cal": round(empty_acc, 4),
               "n_train": len(xt), "use_clahe": False}
    ckpt.save_variables(CKPT_NAME, {"params": params}, metrics)
    print(json.dumps(metrics))
    return metrics


def load_gate():
    """(model, variables, threshold) or None when not trained."""
    from sudoku_vision_tpu.ml import checkpoint as ckpt
    from sudoku_vision_tpu.models.cnn import EmptyClassifier

    variables = ckpt.load_variables_or_none(CKPT_NAME)
    if variables is None:
        return None
    meta = ckpt.load_metadata(CKPT_NAME) or {}
    return EmptyClassifier(), variables, float(meta.get("threshold", 0.5))


def bundle_predict(cells_u8: np.ndarray) -> np.ndarray:
    """The export-bundle contract on RAW (N, 28, 28) u8 cells: gate
    says empty -> class 0, else the flagship's argmax on the canonical
    thresholded input. The exported graph embeds BOTH paths behind one
    raw-cell input (ml/export.py bundle), so consumers no longer
    reimplement the preproc (the burden that made the reference
    hand-roll CLAHE in Swift, reference CellPreprocessor.swift:44)."""
    from sudoku_vision_tpu.ml.disambig17 import preprocess as thresh_pp
    from sudoku_vision_tpu.pipeline.run_v2 import load_model

    model, variables, temperature, name, use_clahe = load_model("v3")
    # Same hazard the torch mirror asserts (ml/export.py
    # build_torch_bundle): the embedded preproc is the no-CLAHE
    # canonical input — a CLAHE-trained flagship would silently get
    # the wrong tensor and every published bundle number with it.
    assert not use_clahe, \
        f"bundle embeds the no-CLAHE preproc; flagship {name} disagrees"
    gate = load_gate()
    if gate is None:
        raise FileNotFoundError(
            "empty_gate checkpoint not trained (run ml.empty_gate)")
    gate_model, gate_vars, thr = gate
    logits = model.apply(variables, jnp.asarray(thresh_pp(cells_u8)),
                         temperature=temperature)
    digits = np.asarray(jnp.argmax(logits, -1))
    p_empty = np.asarray(jax.nn.softmax(
        gate_model.apply(gate_vars, jnp.asarray(
            preprocess(cells_u8))))[:, 0])
    return np.where(p_empty > thr, 0, digits)


def evaluate_bundle(real_dir: str = "data/real", split: str = "test"):
    """Held-out-photo accuracy of the BUNDLE (the VERDICT r4 #2 number:
    no heuristic mask, what an export consumer would compute)."""
    import os

    got = _load_split_10(os.path.join(real_dir, split))
    cells, labels10 = got
    pred = bundle_predict(cells)
    ok = pred == labels10
    out = {
        "n": len(labels10),
        "accuracy": round(float(ok.mean()), 4),
        "empty_acc": round(float(ok[labels10 == 0].mean()), 4),
        "digit_acc": round(float(ok[labels10 != 0].mean()), 4),
    }
    print(json.dumps(out))
    return out


def _load_split_10(root: str):
    """Class-dir tree -> (cells, 10-class labels)."""
    import os

    from PIL import Image

    cells, labels = [], []
    for cls in sorted(os.listdir(root)):
        if not cls.isdigit():
            continue
        for f in sorted(os.listdir(os.path.join(root, cls))):
            img = Image.open(os.path.join(root, cls, f)).convert("L")
            if img.size != (28, 28):
                img = img.resize((28, 28), Image.BILINEAR)
            cells.append(np.asarray(img, np.uint8))
            labels.append(int(cls))
    return np.stack(cells), np.asarray(labels, np.int32)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="train the empty gate")
    p.add_argument("--n-per-class", type=int, default=10000)
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--evaluate", action="store_true")
    args = p.parse_args(argv)
    if args.evaluate:
        evaluate_bundle()
        return 0
    train(args.n_per_class, args.epochs)
    evaluate_bundle()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
