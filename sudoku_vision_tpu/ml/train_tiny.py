"""Train + int8-quantize the tiny offline digit MLP for the scanner.

The reference's web app classifies digits fully client-side with ONNX
Runtime Web (reference web/src/ml/digitClassifier.ts:54). This image
has no JS engine and a browser has no TPU, so the offline scanner path
(serve/static/scanner.js offClassifyCell) uses a model small enough to
run in plain JavaScript — and small enough that the js_subset
interpreter can EXECUTE the shipped source under test against this
module's numpy oracle.

Architecture: canonical no-CLAHE preproc (binary {-1,+1} 28x28, the
same bits the flagship sees) -> 784 -> relu(96) -> 10 logits (no
pooling: thin binary strokes do not survive 2x2 mean pooling — the
pooled variant lost ~8% digit accuracy on the offline holdout).
Training applies per-sample +-2px shift augmentation to the binary
input: the MLP has no convolutional invariance, so it must be taught
the extraction's positional variance explicitly.
Weights post-training-quantized to int8 with one scale per layer;
biases stay float. ~51k parameters, ~160 kB as JS source.

Outputs:
  serve/static/digit_weights.js — `function digitWeights()` returning
      the weight object (js_subset-parseable: pure literal arrays);
  models_ckpt/digit_mlp.json    — metadata + accuracy record.

CLI:
    python -m sudoku_vision_tpu.ml.train_tiny [--epochs 30] [--out ...]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


# ------------------------------------------------------------ preproc


def tiny_inputs(images_u8: np.ndarray, batch: int = 2048) -> np.ndarray:
    """(N, 28, 28) u8 raw cells -> (N, 784) float32 in {-1, +1}: the
    canonical no-CLAHE preproc the JS path applies
    (scanner.js offPreprocCell)."""
    import jax.numpy as jnp

    from sudoku_vision_tpu.cv.extract import preprocess_cells_for_model

    out = []
    for i in range(0, len(images_u8), batch):
        x = preprocess_cells_for_model(
            jnp.asarray(images_u8[i:i + batch]), use_clahe=False)
        x = np.asarray(x)[..., 0]                       # (B, 28, 28)
        out.append(x.reshape(-1, 784).astype(np.float32))
    return np.concatenate(out)


# -------------------------------------------- JS-extraction replica


def quad_map(q: np.ndarray) -> dict:
    """Heckbert square->quad coefficients — EXACTLY scanner.js
    offQuadMap (tests assert parity against the shipped source)."""
    (x0, y0), (x1, y1), (x2, y2), (x3, y3) = [tuple(p) for p in q]
    dx1, dy1 = x1 - x2, y1 - y2
    dx2, dy2 = x3 - x2, y3 - y2
    sx = x0 - x1 + x2 - x3
    sy = y0 - y1 + y2 - y3
    den = dx1 * dy2 - dx2 * dy1
    g = (sx * dy2 - dx2 * sy) / den
    h = (dx1 * sy - sx * dy1) / den
    return {"a": x1 - x0 + g * x1, "b": x3 - x0 + h * x3, "c": x0,
            "d": y1 - y0 + g * y1, "e": y3 - y0 + h * y3, "f": y0,
            "g": g, "h": h}


def np_extract_cells(gray: np.ndarray, corners: np.ndarray) -> np.ndarray:
    """Vectorized replica of scanner.js offExtractCells: 81 cells of
    28x28 rounded-u8, fused warp+crop+resize on the 450/50/10%-margin
    geometry, bilinear with replicate border."""
    h, w = gray.shape
    m = quad_map(np.asarray(corners, np.float64))
    idx = np.arange(28)
    span = 40.0 / 28.0
    us = (np.arange(9)[:, None] * 50 + 5 + (idx[None, :] + 0.5) * span) \
        / 450.0                                     # (9, 28)
    u = np.broadcast_to(us[None, :, None, None, :],
                        (9, 9, 1, 28, 28)).reshape(81, 28, 28)
    v = np.broadcast_to(us[:, None, None, :, None],
                        (9, 9, 1, 28, 28)).reshape(81, 28, 28)
    den = m["g"] * u + m["h"] * v + 1.0
    sx = (m["a"] * u + m["b"] * v + m["c"]) / den
    sy = (m["d"] * u + m["e"] * v + m["f"]) / den
    x0 = np.floor(sx).astype(np.int64)
    y0 = np.floor(sy).astype(np.int64)
    fx = sx - x0
    fy = sy - y0
    xc0 = np.clip(x0, 0, w - 1)
    xc1 = np.clip(x0 + 1, 0, w - 1)
    yc0 = np.clip(y0, 0, h - 1)
    yc1 = np.clip(y0 + 1, 0, h - 1)
    p00 = gray[yc0, xc0]
    p01 = gray[yc0, xc1]
    p10 = gray[yc1, xc0]
    p11 = gray[yc1, xc1]
    val = (p00 * (1 - fx) * (1 - fy) + p01 * fx * (1 - fy)
           + p10 * (1 - fx) * fy + p11 * fx * fy)
    return np.floor(val + 0.5).astype(np.uint8)    # JS Math.round


def harvest_offline_cells(n_scenes: int = 160, seed: int = 123):
    """Training cells drawn from the OFFLINE path's own distribution:
    rendered scenes at capture-like resolutions, extracted with the
    JS-replica gather from truth corners (plus detection-scale jitter).
    The TPU-pipeline scene cells (refined boundaries, higher res) are a
    different distribution — training only on them left the offline
    classifier ~25% off on its own cells."""
    import random as pyrandom

    from sudoku_vision_tpu.ml.generate_scenes import render_scene

    rng = np.random.default_rng(seed)
    sizes = [(448, 448), (512, 512), (512, 640), (640, 480), (768, 768)]
    images, labels = [], []
    for i in range(n_scenes):
        r = pyrandom.Random(seed * 7919 + i)
        size = sizes[i % len(sizes)]
        cats = ("printed_clean", "printed_clean", "printed_skew",
                "low_light")
        img, truth = render_scene(r, size=size,
                                  category=cats[i % len(cats)])
        gray = img.astype(np.float64).mean(axis=2)
        corners = (np.asarray(truth["corners"], np.float64)
                   + rng.normal(0, 1.6, (4, 2)))
        cells = np_extract_cells(gray, corners)
        images.append(cells)
        labels.append(np.array([int(c) for c in truth["puzzle"]],
                               np.int32))
    return np.concatenate(images), np.concatenate(labels)


# ----------------------------------------------------------- inference


def forward_float(x: np.ndarray, w1, b1, w2, b2) -> np.ndarray:
    h = np.maximum(x @ w1 + b1, 0.0)
    return h @ w2 + b2


def forward_int8(x: np.ndarray, wts: dict) -> np.ndarray:
    """The numpy oracle for scanner.js offClassifyCell: int8 weights,
    per-layer scale, float biases — identical op order."""
    w1 = np.asarray(wts["w1"], np.float64).reshape(784, 96)
    w2 = np.asarray(wts["w2"], np.float64).reshape(96, 10)
    h = x.astype(np.float64) @ w1 * wts["s1"] + np.asarray(wts["b1"])
    h = np.maximum(h, 0.0)
    return h @ w2 * wts["s2"] + np.asarray(wts["b2"])


def quantize(w1, b1, w2, b2) -> dict:
    s1 = float(np.abs(w1).max() / 127.0)
    s2 = float(np.abs(w2).max() / 127.0)
    q1 = np.clip(np.round(w1 / s1), -127, 127).astype(np.int32)
    q2 = np.clip(np.round(w2 / s2), -127, 127).astype(np.int32)
    return {
        "s1": s1, "s2": s2,
        "w1": q1.reshape(-1).tolist(), "b1": b1.astype(float).tolist(),
        "w2": q2.reshape(-1).tolist(), "b2": b2.astype(float).tolist(),
    }


# ------------------------------------------------------------ emission


def emit_weights_js(wts: dict, path: str) -> None:
    """Write the js_subset-parseable weights module (pure literals)."""

    def arr(vals, fmt):
        return "[" + ",".join(fmt(v) for v in vals) + "]"

    src = (
        "/* Tiny offline digit classifier weights — emitted by\n"
        " * ml/train_tiny.py (int8 per-layer quantization of the\n"
        " * distilled MLP). Consumed by scanner.js offClassifyCell;\n"
        " * executed under test by utils/js_subset.py against the\n"
        " * numpy oracle ml/train_tiny.py::forward_int8. */\n"
        "'use strict';\n"
        "function digitWeights() {\n"
        "  return {\n"
        f"    s1: {wts['s1']!r},\n"
        f"    s2: {wts['s2']!r},\n"
        f"    w1: {arr(wts['w1'], lambda v: str(int(v)))},\n"
        f"    b1: {arr(wts['b1'], lambda v: repr(float(v)))},\n"
        f"    w2: {arr(wts['w2'], lambda v: str(int(v)))},\n"
        f"    b2: {arr(wts['b2'], lambda v: repr(float(v)))}\n"
        "  };\n"
        "}\n"
        "if (typeof window !== 'undefined') {\n"
        "  window.digitWeights = digitWeights;\n"
        "}\n")
    with open(path, "w") as f:
        f.write(src)


def load_weights_js(path: str) -> dict:
    """Parse the shipped weights file back through the JS interpreter —
    tests consume THIS, so the artifact itself is what is verified."""
    from sudoku_vision_tpu.utils.js_subset import JSEnv

    with open(path) as f:
        src = f.read()
    # keep only the pure function (strip 'use strict' + window glue)
    start = src.find("function ")
    cut = src.find("if (typeof window")
    env = JSEnv(src[start:cut])
    return env.call("digitWeights")


# ------------------------------------------------------------- training


def train(epochs: int = 30, lr: float = 3e-3, batch: int = 512,
          seed: int = 0, distill_from: str | None = "digit_cnn_v3_real",
          verbose: bool = True):
    import jax
    import jax.numpy as jnp
    import optax

    from sudoku_vision_tpu.ml.datasets import combine, load_class_dirs

    ds = load_class_dirs(os.path.join(REPO, "data", "synthetic"), "train")
    scene_dir = os.path.join(REPO, "data", "scene_cells")
    if os.path.isdir(os.path.join(scene_dir, "train")):
        ds = combine(ds, load_class_dirs(scene_dir, "train"), 2, 2)
    real_dir = os.path.join(REPO, "data", "real")
    if os.path.isdir(os.path.join(real_dir, "train")):
        ds = combine(ds, load_class_dirs(real_dir, "train"), 5, 1)
    # the offline path's own distribution, double-weighted (it is the
    # deployment distribution for THIS model)
    off_imgs, off_labels = harvest_offline_cells()
    from sudoku_vision_tpu.ml.datasets import CellDataset

    ds = combine(ds, CellDataset(off_imgs, off_labels, "offline"), 2, 1)
    x = tiny_inputs(ds.images)
    y = ds.labels.astype(np.int32)

    # Soft targets from the flagship (distillation stabilizes the tiny
    # model's marginal cells; falls back to hard labels without a ckpt).
    soft = None
    if distill_from:
        from sudoku_vision_tpu.ml import checkpoint as ckpt
        from sudoku_vision_tpu.ml.evaluate import predict_logits
        from sudoku_vision_tpu.models import DigitCNNv3

        variables = ckpt.load_variables_or_none(distill_from)
        if variables is not None:
            logits = predict_logits(DigitCNNv3(), variables, ds.images,
                                    use_clahe=False)
            soft = np.asarray(
                jax.nn.softmax(jnp.asarray(logits) / 2.0, axis=-1))

    rng = np.random.default_rng(seed)
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    params = {
        "w1": jax.random.normal(k1, (784, 96)) * 0.03,
        "b1": jnp.zeros((96,)),
        "w2": jax.random.normal(k2, (96, 10)) * 0.05,
        "b2": jnp.zeros((10,)),
    }
    tx = optax.adam(lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, xb, yb, sb):
        def loss_fn(p):
            h = jax.nn.relu(xb @ p["w1"] + p["b1"])
            logits = h @ p["w2"] + p["b2"]
            hard = optax.softmax_cross_entropy_with_integer_labels(
                logits, yb).mean()
            softl = optax.softmax_cross_entropy(logits / 2.0, sb).mean()
            return 0.3 * hard + 0.7 * softl
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt)
        return optax.apply_updates(params, upd), opt, loss

    if soft is None:
        soft = np.eye(10, dtype=np.float32)[y]
    n = len(x)
    for ep in range(epochs):
        perm = rng.permutation(n)
        losses = []
        for i in range(0, n - batch + 1, batch):
            idx = perm[i:i + batch]
            xb = x[idx].reshape(-1, 28, 28)
            sh = rng.integers(-2, 3, (len(idx), 2))
            xa = np.empty_like(xb)
            for k in range(len(idx)):
                xa[k] = np.roll(xb[k], (sh[k, 0], sh[k, 1]),
                                axis=(0, 1))
            params, opt, loss = step(params, opt,
                                     jnp.asarray(xa.reshape(-1, 784)),
                                     jnp.asarray(y[idx]),
                                     jnp.asarray(soft[idx]))
            losses.append(float(loss))
        if verbose:
            print(f"epoch {ep}: loss {np.mean(losses):.4f}", flush=True)

    w1, b1 = np.asarray(params["w1"]), np.asarray(params["b1"])
    w2, b2 = np.asarray(params["w2"]), np.asarray(params["b2"])
    return (w1, b1, w2, b2), ds


def evaluate_sets(wts) -> dict:
    from sudoku_vision_tpu.ml.datasets import load_class_dirs

    report = {}
    for name, root, split in (
            ("synthetic_val", os.path.join(REPO, "data", "synthetic"),
             "val"),
            ("scene_val", os.path.join(REPO, "data", "scene_cells"),
             "val"),
            ("real_val", os.path.join(REPO, "data", "real"), "val")):
        if not os.path.isdir(os.path.join(root, split)):
            continue
        ds = load_class_dirs(root, split)
        x = tiny_inputs(ds.images)
        pred = forward_int8(x, wts).argmax(-1)
        acc = float((pred == ds.labels).mean())
        digit = ds.labels > 0
        report[name] = {
            "n": int(len(ds)), "acc": round(acc, 4),
            "digit_acc": round(float(
                (pred[digit] == ds.labels[digit]).mean()), 4),
        }
    # fresh-seed scenes through the JS-replica extraction: the offline
    # path's own holdout distribution
    imgs, labels = harvest_offline_cells(n_scenes=16, seed=999_331)
    pred = forward_int8(tiny_inputs(imgs), wts).argmax(-1)
    digit = labels > 0
    report["offline_holdout"] = {
        "n": int(len(labels)),
        "acc": round(float((pred == labels).mean()), 4),
        "digit_acc": round(float(
            (pred[digit] == labels[digit]).mean()), 4),
    }
    return report


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="tiny offline MLP")
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--lr", type=float, default=3e-3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no-distill", action="store_true")
    p.add_argument("--out", default=os.path.join(
        REPO, "sudoku_vision_tpu", "serve", "static", "digit_weights.js"))
    args = p.parse_args(argv)

    (w1, b1, w2, b2), ds = train(
        args.epochs, args.lr, seed=args.seed,
        distill_from=None if args.no_distill else "digit_cnn_v3_real")
    wts = quantize(w1, b1, w2, b2)
    report = evaluate_sets(wts)
    emit_weights_js(wts, args.out)
    meta = {
        "arch": "784-96-10 int8 MLP (canonical no-CLAHE binary input, +-2px shift augmentation)",
        "params": int(w1.size + b1.size + w2.size + b2.size),
        "train_n": int(len(ds)),
        "eval": report,
    }
    with open(os.path.join(REPO, "models_ckpt", "digit_mlp.json"),
              "w") as f:
        json.dump(meta, f, indent=1)
    print(json.dumps(meta, indent=1))
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
