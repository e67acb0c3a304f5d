"""Model evaluation suite (v1 + v2 capabilities).

Capability parity with the reference evaluators: dataset accuracy +
confusion matrix + misclassification list (reference ml/evaluate.py:97,
:156), per-class precision/recall/F1 (reference ml/evaluate_v2.py:67),
Expected Calibration Error + reliability diagram (:150, :259), failure
mining with top-3 alternatives (:184), confusion-matrix plot (:223),
summary.json (:466).

CLI:
    python -m sudoku_vision_tpu.ml.evaluate --ckpt digit_cnn_v3_synthetic \
        --model v3 --data-dir data/synthetic [--split val] [--plots out/]
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from sudoku_vision_tpu.cv.extract import preprocess_cells_for_model
from sudoku_vision_tpu.ml import checkpoint as ckpt
from sudoku_vision_tpu.ml.datasets import CellDataset, load_class_dirs, load_mnist, load_real_cells
from sudoku_vision_tpu.models import DigitCNN, DigitCNNv3, DigitCNNv3Light

MODELS = {"v1": DigitCNN, "v3": DigitCNNv3, "v3light": DigitCNNv3Light}


def predict_logits(model, variables, images: np.ndarray,
                   batch_size: int = 512, use_clahe: bool = True) -> np.ndarray:
    """Batched inference over raw uint8 cells (N, 28, 28).

    ``use_clahe`` must match how the checkpoint was trained (the same
    train/inference contract as cv/extract.py — run_v2/serve/video all
    read it from checkpoint metadata; so does evaluate_checkpoint).
    """

    @jax.jit
    def fwd(x):
        return model.apply(variables, preprocess_cells_for_model(x, use_clahe))

    outs = []
    for i in range(0, len(images), batch_size):
        chunk = images[i:i + batch_size]
        pad = batch_size - len(chunk)
        if pad:
            chunk = np.concatenate(
                [chunk, np.zeros((pad, 28, 28), np.uint8)])
        outs.append(np.asarray(fwd(jnp.asarray(chunk)))[:len(images[i:i + batch_size])])
    return np.concatenate(outs)


def confusion_matrix(labels: np.ndarray, preds: np.ndarray,
                     n: int = 10) -> np.ndarray:
    m = np.zeros((n, n), np.int64)
    np.add.at(m, (labels, preds), 1)
    return m


def per_class_prf(cm: np.ndarray):
    """Precision/recall/F1 per class from a confusion matrix."""
    tp = np.diag(cm).astype(np.float64)
    prec = tp / np.maximum(cm.sum(axis=0), 1)
    rec = tp / np.maximum(cm.sum(axis=1), 1)
    f1 = np.where(prec + rec > 0, 2 * prec * rec / np.maximum(prec + rec, 1e-9), 0.0)
    return prec, rec, f1


def expected_calibration_error(probs: np.ndarray, labels: np.ndarray,
                               bins: int = 15):
    """ECE + per-bin stats (reference ml/evaluate_v2.py:150)."""
    conf = probs.max(axis=1)
    pred = probs.argmax(axis=1)
    correct = (pred == labels).astype(np.float64)
    edges = np.linspace(0, 1, bins + 1)
    ece = 0.0
    bin_stats = []
    for i in range(bins):
        m = (conf > edges[i]) & (conf <= edges[i + 1])
        if m.sum() == 0:
            bin_stats.append({"bin": i, "count": 0})
            continue
        acc = correct[m].mean()
        avg_conf = conf[m].mean()
        ece += m.mean() * abs(acc - avg_conf)
        bin_stats.append({"bin": i, "count": int(m.sum()),
                          "accuracy": float(acc),
                          "confidence": float(avg_conf)})
    return float(ece), bin_stats


def find_failures(images, labels, probs, top_k: int = 3, limit: int = 100):
    """Misclassifications with top-k alternatives (reference
    ml/evaluate_v2.py:184)."""
    preds = probs.argmax(axis=1)
    bad = np.flatnonzero(preds != labels)[:limit]
    out = []
    for i in bad:
        order = np.argsort(probs[i])[::-1][:top_k]
        out.append({
            "index": int(i), "label": int(labels[i]),
            "pred": int(preds[i]),
            "top": [(int(c), float(probs[i, c])) for c in order],
        })
    return out


def plot_reports(out_dir: str, cm: np.ndarray, bin_stats, failures,
                 images: np.ndarray, labels: np.ndarray, probs: np.ndarray):
    """Confusion / reliability / failure-grid PNGs (matplotlib)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    fig, ax = plt.subplots(figsize=(6, 5))
    im = ax.imshow(cm, cmap="Blues")
    for r in range(10):
        for c in range(10):
            if cm[r, c]:
                ax.text(c, r, str(cm[r, c]), ha="center", va="center",
                        fontsize=7)
    ax.set_xlabel("pred")
    ax.set_ylabel("true")
    fig.colorbar(im)
    fig.savefig(os.path.join(out_dir, "confusion_matrix.png"), dpi=120)
    plt.close(fig)

    xs = [b["confidence"] for b in bin_stats if b.get("count")]
    ys = [b["accuracy"] for b in bin_stats if b.get("count")]
    fig, ax = plt.subplots(figsize=(5, 5))
    ax.plot([0, 1], [0, 1], "k--", lw=1)
    ax.bar(xs, ys, width=0.05, alpha=0.7)
    ax.set_xlabel("confidence")
    ax.set_ylabel("accuracy")
    ax.set_title("reliability diagram")
    fig.savefig(os.path.join(out_dir, "reliability.png"), dpi=120)
    plt.close(fig)

    if failures:
        k = min(len(failures), 36)
        cols = 6
        rows = -(-k // cols)
        fig, axes = plt.subplots(rows, cols, figsize=(cols * 1.6, rows * 1.8))
        for ax, f in zip(np.atleast_1d(axes).ravel(), failures[:k]):
            ax.imshow(images[f["index"]], cmap="gray")
            ax.set_title(f"{f['label']}->{f['pred']}", fontsize=8)
            ax.axis("off")
        for ax in np.atleast_1d(axes).ravel()[k:]:
            ax.axis("off")
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, "failures.png"), dpi=120)
        plt.close(fig)


def evaluate_checkpoint(ckpt_name: str, model_name: str, ds: CellDataset,
                        plots: str | None = None) -> dict:
    model = MODELS[model_name]()
    variables = ckpt.load_variables_or_none(ckpt_name)
    if variables is None:
        raise FileNotFoundError(f"checkpoint {ckpt_name} not found")
    meta = ckpt.load_metadata(ckpt_name)
    t = meta.get("temperature", 1.0)
    use_clahe = bool(meta.get("use_clahe", True))
    logits = predict_logits(model, variables, ds.images,
                            use_clahe=use_clahe) / t
    probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
    preds = probs.argmax(axis=1)
    cm = confusion_matrix(ds.labels, preds)
    prec, rec, f1 = per_class_prf(cm)
    ece, bin_stats = expected_calibration_error(probs, ds.labels)
    failures = find_failures(ds.images, ds.labels, probs)
    acc = float((preds == ds.labels).mean())
    summary = {
        "checkpoint": ckpt_name, "dataset": ds.name, "n": len(ds),
        "accuracy": acc, "ece": ece, "temperature": t,
        "per_class": {
            str(c): {"precision": float(prec[c]), "recall": float(rec[c]),
                     "f1": float(f1[c]), "support": int(cm[c].sum())}
            for c in range(10)},
        "problem_digits": [c for c in range(10)
                           if cm[c].sum() and rec[c] < 0.8],
        "n_failures": int((preds != ds.labels).sum()),
    }
    if plots:
        plot_reports(plots, cm, bin_stats, failures, ds.images,
                     ds.labels, probs)
        with open(os.path.join(plots, "summary.json"), "w") as f:
            json.dump(summary, f, indent=2)
    return summary


def mc_dropout_report(ckpt_name: str, model_name: str, ds: CellDataset,
                      n_samples: int = 10, seed: int = 0,
                      batch_size: int = 512) -> dict:
    """MC-dropout uncertainty quality report (consumes
    models/cnn.py::forward_with_uncertainty, reference ml/model_v3.py:186).

    Uncertainty is only useful if it RANKS errors above correct
    predictions, so the report measures that directly: mean predictive
    std on wrong vs right cells, and error recall among the
    most-uncertain decile (how many of the model's mistakes a
    top-10%-uncertainty review queue would catch — the manual-correction
    UI's prioritization signal).
    """
    import jax

    from sudoku_vision_tpu.cv.extract import preprocess_cells_for_model
    from sudoku_vision_tpu.ml import checkpoint as ckpt
    from sudoku_vision_tpu.models import forward_with_uncertainty

    model = MODELS[model_name]()
    variables = ckpt.load_variables_or_none(ckpt_name)
    if variables is None:
        raise FileNotFoundError(f"checkpoint {ckpt_name} not found")
    meta = ckpt.load_metadata(ckpt_name)
    use_clahe = bool(meta.get("use_clahe", True))
    rng = jax.random.PRNGKey(seed)

    @jax.jit
    def run(raw, key):
        x = preprocess_cells_for_model(raw, use_clahe)
        return forward_with_uncertainty(model, variables, x, key,
                                        n_samples=n_samples)

    means, stds = [], []
    for i in range(0, len(ds), batch_size):
        raw = ds.images[i:i + batch_size]
        pad = batch_size - len(raw)
        if pad:
            raw = np.concatenate(
                [raw, np.zeros((pad, 28, 28), np.uint8)])
        rng, k = jax.random.split(rng)
        m, s = run(jnp.asarray(raw), k)
        means.append(np.asarray(m)[:batch_size - pad])
        stds.append(np.asarray(s)[:batch_size - pad])
    mean = np.concatenate(means)
    std = np.concatenate(stds)
    preds = mean.argmax(axis=1)
    # Uncertainty score: std of the predicted class's probability.
    unc = std[np.arange(len(preds)), preds]
    wrong = preds != ds.labels
    order = np.argsort(-unc)
    decile = order[:max(1, len(order) // 10)]
    report = {
        "checkpoint": ckpt_name, "n": len(ds),
        "mc_samples": n_samples,
        "accuracy_mc_mean": float((~wrong).mean()),
        "mean_std_correct": float(unc[~wrong].mean()) if (~wrong).any()
        else None,
        "mean_std_wrong": float(unc[wrong].mean()) if wrong.any() else None,
        "errors_in_top_decile_uncertainty":
            float(wrong[decile].sum() / max(1, wrong.sum()))
            if wrong.any() else None,
    }
    return report


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="digit classifier evaluation")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--model", choices=list(MODELS), default="v3")
    p.add_argument("--dataset", choices=["synthetic", "mnist", "real"],
                   default="synthetic")
    p.add_argument("--data-dir", default="data/synthetic")
    p.add_argument("--split", default="val")
    p.add_argument("--plots", help="directory for PNG reports")
    p.add_argument("--mc-dropout", type=int, default=0, metavar="N",
                   help="add an MC-dropout uncertainty report with N "
                        "stochastic passes (reference ml/model_v3.py:186)")
    args = p.parse_args(argv)
    if args.dataset == "mnist":
        ds = load_mnist("test")
    elif args.dataset == "real":
        ds = load_real_cells(args.data_dir)
    else:
        ds = load_class_dirs(args.data_dir, args.split)
    summary = evaluate_checkpoint(args.ckpt, args.model, ds, args.plots)
    if args.mc_dropout:
        summary["mc_dropout"] = mc_dropout_report(
            args.ckpt, args.model, ds, n_samples=args.mc_dropout)
    print(json.dumps(summary, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
