"""Batch cell extraction for dataset building.

Capability parity with reference tools/extract_cells.py: process a
directory of puzzle photos, write per-image dirs of cell_r_c.png plus
the rectified grid reference image, keep a resumable manifest.json
updated after every image (:134, :164), and emit a labeling manifest
(:220).

Extraction itself rides the TPU perception graph (one jit call per
image), so this tool doubles as a bulk-inference smoke test.

CLI:
    python -m sudoku_vision_tpu.tools.extract_cells --input photos/ \
        --output data/cells [--resume]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


import functools


@functools.lru_cache(maxsize=8)
def _perceive_jitted(shape):
    """One compiled graph per input shape (re-jitting per image would
    recompile every call); model via the run_v2 fallback chain."""
    import jax

    from sudoku_vision_tpu.pipeline.graph import perceive
    from sudoku_vision_tpu.pipeline.run_v2 import load_model

    model, variables, _, _, use_clahe = load_model("v3")
    return jax.jit(lambda im: perceive(im, model, variables,
                                       use_clahe=use_clahe))


def process_image(image_path: str, out_dir: str) -> dict:
    """Extract 81 cells + warped reference from one photo."""
    import jax.numpy as jnp
    from PIL import Image

    from sudoku_vision_tpu.utils.imageio import load_bgr

    img = load_bgr(image_path)
    out = _perceive_jitted(img.shape)(jnp.asarray(img))
    if not bool(out.grid_found):
        return {"image": image_path, "ok": False, "error": "no grid"}
    cells = np.asarray(out.cells)
    os.makedirs(out_dir, exist_ok=True)
    for r in range(9):
        for c in range(9):
            Image.fromarray(cells[r * 9 + c]).save(
                os.path.join(out_dir, f"cell_{r}_{c}.png"))
    # Rectified reference image for human checking.
    from sudoku_vision_tpu.ops.warp import homography_np
    from sudoku_vision_tpu.utils.cv_ref import warp_perspective_np
    from sudoku_vision_tpu.ops.color import bgr_to_gray

    gray = np.asarray(bgr_to_gray(jnp.asarray(img)))
    m = homography_np(np.asarray(out.corners, np.float64), (450, 450))
    Image.fromarray(warp_perspective_np(gray, m, (450, 450))).save(
        os.path.join(out_dir, "warped.png"))
    return {
        "image": image_path, "ok": True,
        "pred_digits": np.asarray(out.digits).tolist(),
        "confidence": np.asarray(out.confidence).round(3).tolist(),
        "empty_mask": np.asarray(out.empty_mask).tolist(),
    }


def process_directory(input_dir: str, output_dir: str,
                      resume: bool = True) -> dict:
    """Resumable batch extraction (reference :134)."""
    os.makedirs(output_dir, exist_ok=True)
    manifest_path = os.path.join(output_dir, "manifest.json")
    manifest = {"images": {}}
    if resume and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            manifest = json.load(f)
    images = sorted(
        f for f in os.listdir(input_dir)
        if f.lower().endswith((".jpg", ".jpeg", ".png")))
    for name in images:
        if name in manifest["images"] and manifest["images"][name].get("ok"):
            continue
        t0 = time.time()
        entry = process_image(
            os.path.join(input_dir, name),
            os.path.join(output_dir, os.path.splitext(name)[0]))
        entry["time_s"] = round(time.time() - t0, 2)
        manifest["images"][name] = entry
        with open(manifest_path, "w") as f:  # write-after-each = resumable
            json.dump(manifest, f, indent=1)
        print(f"{name}: {'ok' if entry['ok'] else entry.get('error')}")
    return manifest


def create_labeling_manifest(output_dir: str) -> str:
    """Flat list of unlabeled cells for the labelers (reference :220)."""
    rows = []
    for entry in sorted(os.listdir(output_dir)):
        d = os.path.join(output_dir, entry)
        if not os.path.isdir(d):
            continue
        for f in sorted(os.listdir(d)):
            if f.startswith("cell_") and f.endswith(".png"):
                rows.append({"image": entry, "filename": f})
    path = os.path.join(output_dir, "labeling_manifest.json")
    with open(path, "w") as fh:
        json.dump({"cells": rows}, fh, indent=1)
    return path


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="batch cell extraction")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--no-resume", action="store_true")
    args = p.parse_args(argv)
    from sudoku_vision_tpu.utils import jax_cache

    jax_cache.enable()
    manifest = process_directory(args.input, args.output,
                                 resume=not args.no_resume)
    path = create_labeling_manifest(args.output)
    ok = sum(1 for v in manifest["images"].values() if v.get("ok"))
    print(f"{ok}/{len(manifest['images'])} images extracted; "
          f"labeling manifest: {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
