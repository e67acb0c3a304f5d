"""Digit-classifier training (v1 + v2 trainer capabilities, one module).

Capability parity with the reference trainers:
  * dataset choices mnist/synthetic/combined/real (reference
    ml/train.py:234), fine-tuning from a checkpoint (--pretrained,
    ml/train.py:287);
  * 3-level augmentation, mixup, label smoothing, warmup+cosine LR,
    early stopping, AdamW, JSON history logs, seeding, post-training
    temperature calibration (reference ml/train_v2.py:39,:97,:132,
    :157,:198,:454,:471,:535,:404);
  * best-checkpoint-by-val (or real) accuracy policy (reference
    ml/train.py:334).

TPU-first: ONE jitted train step contains augmentation, the canonical
cell preprocessing, the forward/backward pass and the optimizer update;
the host only slices uint8 batches out of a preloaded array. Eval is a
second jitted function. bfloat16 compute via --bf16.

CLI:
    python -m sudoku_vision_tpu.ml.train --dataset synthetic \
        --data-dir data/synthetic --model v3 --epochs 20 --out digit_cnn_v3
"""

from __future__ import annotations

import argparse
import json
import os
import time
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from sudoku_vision_tpu.cv.extract import preprocess_cells_for_model
from sudoku_vision_tpu.ml import checkpoint as ckpt
from sudoku_vision_tpu.ml.augment import augment_batch, mixup
from sudoku_vision_tpu.ml.datasets import (
    CellDataset, batches, combine, load_class_dirs, load_mnist,
    load_real_cells,
)
from sudoku_vision_tpu.models import (
    DigitCNN, DigitCNNv3, DigitCNNv3Light, count_parameters,
)

MODELS = {
    "v1": DigitCNN,
    "v3": DigitCNNv3,
    "v3light": DigitCNNv3Light,
}


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def create_state(model, rng, learning_rate_schedule, weight_decay=1e-4):
    variables = model.init(rng, jnp.zeros((1, 28, 28, 1), jnp.float32))
    params = variables["params"]
    batch_stats = variables.get("batch_stats")
    tx = optax.adamw(learning_rate_schedule, weight_decay=weight_decay)
    return TrainState.create(
        apply_fn=model.apply, params=params, tx=tx, batch_stats=batch_stats)


def _model_variables(state: TrainState):
    v = {"params": state.params}
    if state.batch_stats is not None:
        v["batch_stats"] = state.batch_stats
    return v


def smoothed_cross_entropy(logits, labels_onehot, smoothing: float):
    """Label-smoothing CE (reference ml/train_v2.py:132)."""
    n = logits.shape[-1]
    soft = labels_onehot * (1 - smoothing) + smoothing / n
    logp = jax.nn.log_softmax(logits)
    return -(soft * logp).sum(axis=-1).mean()


@partial(jax.jit, static_argnames=("model", "augment", "mixup_alpha",
                                   "smoothing", "has_bn", "use_clahe",
                                   "rot_deg"))
def train_step(state: TrainState, raw_images, labels, key, *, model,
               augment: str, mixup_alpha: float, smoothing: float,
               has_bn: bool, use_clahe: bool = True,
               rot_deg: float | None = None):
    k_aug, k_mix, k_drop = jax.random.split(key, 3)
    if augment != "none":
        raw_images = augment_batch(raw_images, k_aug, augment, rot_deg)
    inputs = preprocess_cells_for_model(raw_images, use_clahe)
    onehot = jax.nn.one_hot(labels, 10)
    if mixup_alpha > 0:
        inputs, onehot = mixup(inputs, onehot, k_mix, mixup_alpha)

    def loss_fn(params):
        variables = {"params": params}
        if has_bn:
            variables["batch_stats"] = state.batch_stats
            logits, updates = model.apply(
                variables, inputs, train=True, rngs={"dropout": k_drop},
                mutable=["batch_stats"])
        else:
            logits = model.apply(variables, inputs, train=True,
                                 rngs={"dropout": k_drop})
            updates = {}
        loss = smoothed_cross_entropy(logits, onehot, smoothing)
        return loss, (logits, updates)

    (loss, (logits, updates)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    state = state.apply_gradients(grads=grads)
    if has_bn:
        state = state.replace(batch_stats=updates["batch_stats"])
    acc = (logits.argmax(-1) == labels).mean()
    return state, loss, acc


@partial(jax.jit, static_argnames=("model", "use_clahe"))
def eval_step(state: TrainState, raw_images, labels, *, model,
              use_clahe: bool = True):
    inputs = preprocess_cells_for_model(raw_images, use_clahe)
    logits = model.apply(_model_variables(state), inputs)
    return logits, (logits.argmax(-1) == labels)


def evaluate(state, model, ds: CellDataset, batch_size: int = 512,
             use_clahe: bool = True):
    """Full-dataset eval; returns (accuracy, per_class_acc, logits, labels)."""
    all_logits, all_correct, all_labels = [], [], []
    n = len(ds)
    for i in range(0, n, batch_size):
        img = ds.images[i:i + batch_size]
        lab = ds.labels[i:i + batch_size]
        pad = batch_size - len(img)
        if pad:
            img = np.concatenate([img, np.zeros((pad, 28, 28), np.uint8)])
            lab_p = np.concatenate([lab, np.zeros(pad, np.int32)])
        else:
            lab_p = lab
        logits, correct = eval_step(
            state, jnp.asarray(img), jnp.asarray(lab_p), model=model,
            use_clahe=use_clahe)
        all_logits.append(np.asarray(logits)[:len(lab)])
        all_correct.append(np.asarray(correct)[:len(lab)])
        all_labels.append(lab)
    logits = np.concatenate(all_logits)
    correct = np.concatenate(all_correct)
    labels = np.concatenate(all_labels)
    per_class = np.full(10, np.nan)
    for c in range(10):
        m = labels == c
        if m.any():
            per_class[c] = correct[m].mean()
    return float(correct.mean()), per_class, logits, labels


def calibrate_temperature(logits: np.ndarray, labels: np.ndarray,
                          steps: int = 200) -> float:
    """NLL-minimizing temperature (reference ml/model_v3.py:328, LBFGS
    there; Newton-on-log-T here — 1-D convex problem)."""
    logits_j = jnp.asarray(logits)
    labels_j = jnp.asarray(labels)

    def nll(log_t):
        t = jnp.exp(log_t)
        logp = jax.nn.log_softmax(logits_j / t)
        return -logp[jnp.arange(len(labels_j)), labels_j].mean()

    g = jax.grad(nll)
    h = jax.grad(lambda lt: g(lt))
    log_t = jnp.asarray(0.0)
    for _ in range(30):
        gg = g(log_t)
        hh = h(log_t)
        step = jnp.where(jnp.abs(hh) > 1e-6, gg / hh, jnp.sign(gg) * 0.1)
        log_t = log_t - jnp.clip(step, -0.5, 0.5)
    return float(jnp.exp(log_t))


def _load_real_any(root: str, split: str = "train") -> CellDataset:
    """Real cells from either layout: class dirs (<root>/<split>/<0..9>,
    the organize_dataset.py output) or per-image dirs + labels CSVs
    (the extract_cells.py output, reference datasets.py:97)."""
    if os.path.isdir(os.path.join(root, split)):
        return load_class_dirs(root, split, name=f"real/{split}")
    return load_real_cells(root)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="TPU digit classifier trainer")
    p.add_argument("--model", choices=list(MODELS), default="v3")
    p.add_argument("--dataset",
                   choices=["mnist", "synthetic", "combined", "real"],
                   default="synthetic")
    p.add_argument("--data-dir", default="data/synthetic")
    p.add_argument("--real-dir", default="data/real")
    p.add_argument("--real-weight", type=int, default=5)
    p.add_argument("--real-empty-weight", type=int, default=None,
                   help="oversample real EMPTY cells by this factor "
                        "(default: --real-weight). Real harvests are "
                        "~60%% empty; weighting empties less keeps the "
                        "class prior from skewing toward 'empty'.")
    p.add_argument("--scene-dir", default=None,
                   help="class-dir root of pipeline-harvested scene "
                        "cells (tools/harvest_scene_cells.py) merged "
                        "into combined training: cells that went "
                        "through the REAL detect->warp->extract graph, "
                        "carrying its residual rotation/resample "
                        "artifacts — the deployment distribution no "
                        "cell-level augmentation reproduces.")
    p.add_argument("--scene-weight", type=int, default=1)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--lr", type=float, default=3e-3)
    p.add_argument("--weight-decay", type=float, default=1e-4)
    p.add_argument("--warmup-epochs", type=float, default=2.0)
    p.add_argument("--label-smoothing", type=float, default=0.1)
    p.add_argument("--mixup", type=float, default=0.2)
    p.add_argument("--augment",
                   choices=["none", "light", "medium", "heavy"],
                   default="medium")
    p.add_argument("--rot-deg", type=float, default=None,
                   help="override the augment level's rotation range "
                        "(degrees). The pipeline leaves ~±30° residual "
                        "glyph rotation; fine-tunes must keep covering "
                        "it (see ml/augment.py).")
    p.add_argument("--balanced", action="store_true")
    p.add_argument("--early-stop", type=int, default=8,
                   help="patience in epochs; 0 disables")
    p.add_argument("--calibrate", action="store_true")
    p.add_argument("--pretrained", help="checkpoint name to fine-tune from")
    p.add_argument("--eval-real-dir",
                   help="real-cell dir evaluated every epoch; when set, "
                        "checkpoints are kept by best REAL accuracy with "
                        "val as tiebreak (reference ml/train.py:193 "
                        "evaluate_on_real + :334-341 best-by-real policy). "
                        "Accepts a class-dir root (uses its 'val' split) "
                        "or a per-image-dirs+CSV root.")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--no-clahe", action="store_true",
                   help="train WITHOUT the CLAHE preproc stage (fast "
                        "inference path; recorded in checkpoint metadata)")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--out", default=None, help="checkpoint name")
    args = p.parse_args(argv)

    np_rng = np.random.default_rng(args.seed)
    rng = jax.random.PRNGKey(args.seed)

    # --- data ---
    if args.dataset == "mnist":
        train_ds, val_ds = load_mnist("train"), load_mnist("test")
    elif args.dataset == "synthetic":
        train_ds = load_class_dirs(args.data_dir, "train")
        val_ds = load_class_dirs(args.data_dir, "val")
    elif args.dataset == "real":
        real = load_real_cells(args.real_dir)
        k = len(real)
        cut = int(k * 0.85)
        perm = np_rng.permutation(k)
        train_ds = CellDataset(real.images[perm[:cut]],
                               real.labels[perm[:cut]], "real/train")
        val_ds = CellDataset(real.images[perm[cut:]],
                             real.labels[perm[cut:]], "real/val")
    else:  # combined
        train_ds = combine(load_class_dirs(args.data_dir, "train"),
                           _load_real_any(args.real_dir, "train"),
                           args.real_weight, args.real_empty_weight)
        if args.scene_dir:
            train_ds = combine(
                train_ds, load_class_dirs(args.scene_dir, "train",
                                          name="scene/train"),
                args.scene_weight, args.scene_weight)
        val_ds = load_class_dirs(args.data_dir, "val")
    print(f"train: {len(train_ds)} ({train_ds.class_counts().tolist()}), "
          f"val: {len(val_ds)}")

    # --- model / optimizer ---
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model = MODELS[args.model](dtype=dtype)
    steps_per_epoch = max(1, len(train_ds) // args.batch_size)
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, int(args.warmup_epochs * steps_per_epoch),
        args.epochs * steps_per_epoch)
    rng, init_rng = jax.random.split(rng)
    state = create_state(model, init_rng, sched, args.weight_decay)
    if args.pretrained:
        loaded = ckpt.load_variables_or_none(args.pretrained)
        if loaded is not None:
            state = state.replace(params=loaded["params"],
                                  batch_stats=loaded.get("batch_stats"))
            print(f"fine-tuning from {args.pretrained}")
    has_bn = state.batch_stats is not None
    print(f"model {args.model}: {count_parameters(state.params):,} params")

    out_name = args.out or f"digit_cnn_{args.model}_{args.dataset}"
    real_eval_ds = (_load_real_any(args.eval_real_dir, "val")
                    if args.eval_real_dir else None)
    if real_eval_ds is not None:
        print(f"real eval set: {len(real_eval_ds)} cells "
              f"({real_eval_ds.class_counts().tolist()})")
    scene_eval_ds = (load_class_dirs(args.scene_dir, "val",
                                     name="scene/val")
                     if args.scene_dir else None)
    if scene_eval_ds is not None:
        print(f"scene eval set: {len(scene_eval_ds)} cells")
    history = []
    best_key, best_acc, best_epoch = (-1.0, -1.0, -1.0), -1.0, -1
    t_start = time.time()
    for epoch in range(args.epochs):
        t0 = time.time()
        losses, accs = [], []
        for img, lab in batches(train_ds, args.batch_size, np_rng,
                                balanced=args.balanced):
            rng, k = jax.random.split(rng)
            state, loss, acc = train_step(
                state, jnp.asarray(img), jnp.asarray(lab), k, model=model,
                augment=args.augment, mixup_alpha=args.mixup,
                smoothing=args.label_smoothing, has_bn=has_bn,
                use_clahe=not args.no_clahe, rot_deg=args.rot_deg)
            losses.append(float(loss))
            accs.append(float(acc))
        val_acc, per_class, _, _ = evaluate(state, model, val_ds,
                                            use_clahe=not args.no_clahe)
        rec = {"epoch": epoch, "loss": float(np.mean(losses)),
               "train_acc": float(np.mean(accs)), "val_acc": val_acc,
               "lr": float(sched(state.step)),
               "time_s": round(time.time() - t0, 2)}
        # Best-checkpoint policy: plain best-val, or — with a real eval
        # set — best-by-REAL-accuracy with val as tiebreak (reference
        # ml/train.py:334-341: real data is the deployment distribution;
        # a synthetic val set can improve while real cells regress).
        # The real set is TINY (~70 cells, ~1.5%/cell), so raw real_acc
        # is quantized to 3%-wide bins before comparison: epochs whose
        # real accuracy differs by noise defer to the big synthetic val
        # set. Round-3 lesson: without the bins, epoch 0 of a fine-tune
        # won on a one-cell real edge while silently forgetting rotated
        # glyphs (the ±45° residual the lattice detector leaves).
        real_acc = None
        if real_eval_ds is not None:
            real_acc, real_per_class, _, _ = evaluate(
                state, model, real_eval_ds, use_clahe=not args.no_clahe)
            rec["real_acc"] = real_acc
        # Scene-val tiebreak: the pipeline-harvested scene cells' val
        # split (hundreds of cells, scene-disjoint) measures the
        # DEPLOYMENT distribution at ~0.2% granularity — without it,
        # quantized-real ties fall to the synthetic val set and epoch 0
        # (the least-trained epoch) wins every fine-tune.
        scene_acc = None
        if scene_eval_ds is not None:
            scene_acc, _, _, _ = evaluate(
                state, model, scene_eval_ds, use_clahe=not args.no_clahe)
            rec["scene_acc"] = scene_acc
        if real_acc is None:
            key = (val_acc, 0.0, 0.0)
        else:
            key = (round(real_acc / 0.03),
                   scene_acc if scene_acc is not None else 0.0, val_acc)
        history.append(rec)
        print(f"epoch {epoch}: loss {rec['loss']:.4f} "
              f"train {rec['train_acc']:.4f} val {val_acc:.4f} "
              + (f"real {real_acc:.4f} " if real_acc is not None else "")
              + f"({rec['time_s']}s)")
        if key > best_key:
            best_key, best_acc, best_epoch = key, val_acc, epoch
            meta = {
                "model": args.model, "dataset": args.dataset,
                "use_clahe": not args.no_clahe,
                "val_acc": val_acc, "epoch": epoch,
                "per_class": per_class.tolist(),
                "params": count_parameters(state.params),
            }
            if real_acc is not None:
                meta["real_acc"] = real_acc
                meta["real_per_class"] = real_per_class.tolist()
            if scene_acc is not None:
                meta["scene_acc"] = scene_acc
            ckpt.save_variables(out_name, _model_variables(state), meta)
        elif args.early_stop and epoch - best_epoch >= args.early_stop:
            print(f"early stop at epoch {epoch} (best {best_acc:.4f} "
                  f"@ {best_epoch})")
            break

    # --- post-training temperature calibration on val logits ---
    meta = ckpt.load_metadata(out_name)
    if args.calibrate:
        best_vars = ckpt.load_variables_or_none(out_name)
        cal_state = state.replace(params=best_vars["params"],
                                  batch_stats=best_vars.get("batch_stats"))
        _, _, logits, labels = evaluate(cal_state, model, val_ds,
                                        use_clahe=not args.no_clahe)
        t = calibrate_temperature(logits, labels)
        meta["temperature"] = t
        ckpt.save_variables(out_name, best_vars, meta)
        print(f"calibrated temperature: {t:.4f}")

    os.makedirs("logs", exist_ok=True)
    log_path = os.path.join(
        "logs", f"train_{time.strftime('%Y%m%d_%H%M%S')}.json")
    with open(log_path, "w") as f:
        json.dump({"args": vars(args), "history": history,
                   "best_val_acc": best_acc,
                   "total_s": round(time.time() - t_start, 1)}, f, indent=2)
    print(f"best val acc {best_acc:.4f}; checkpoint '{out_name}'; "
          f"history {log_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
