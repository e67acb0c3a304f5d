"""CV-only validation CLI with staged debug dumps.

Capability parity with reference cv/test_pipeline.py: run the CV stages
per image, save staged visualizations (1_preprocessed -> 2_lattice ->
3_region -> 4_warped -> 5_cells + per-cell PNGs, reference
save_debug_output :181), print a report grouping failures by type
(:221), exit 1 on any failure (:273).

CLI:
    python -m sudoku_vision_tpu.cv.test_pipeline --images DIR --debug-out out/
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np


def run_cv_only(image_path: str, debug_dir: str | None = None) -> dict:
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from sudoku_vision_tpu import ops
    from sudoku_vision_tpu.cv.extract import extract_cells, refine_boundaries
    from sudoku_vision_tpu.cv.grid import (
        detect_grid_full, grid_region_from_lattice,
    )
    from sudoku_vision_tpu.cv.preprocess import preprocess_for_grid_detection
    from sudoku_vision_tpu.utils.imageio import load_bgr

    img = load_bgr(image_path)
    gray = ops.bgr_to_gray(jnp.asarray(img))
    det, lat_h, lat_v, ds, small = jax.jit(detect_grid_full)(gray)
    result = {"image": os.path.basename(image_path),
              "found": bool(det.found),
              "area_frac": float(det.area_frac)}
    if not result["found"]:
        result["error"] = "detection_failed"
        return result
    m_inv = jnp.linalg.inv(
        ops.homography_from_corners(det.corners, (450, 450)))
    b_y, b_x = refine_boundaries(lat_h, lat_v, m_inv, int(ds))
    off = (int(ds) - 1) / 2.0
    m_inv_small = jnp.stack([
        (m_inv[0] - off * m_inv[2]) / int(ds),
        (m_inv[1] - off * m_inv[2]) / int(ds), m_inv[2]])
    cells = extract_cells(small, m_inv_small,
                          boundaries_y=b_y, boundaries_x=b_x)
    result["n_cells"] = int(cells.shape[0])
    if result["n_cells"] != 81:
        result["error"] = "cell_extraction_failed"

    if debug_dir:
        d = os.path.join(debug_dir, os.path.splitext(result["image"])[0])
        os.makedirs(d, exist_ok=True)
        binary = preprocess_for_grid_detection(gray)
        Image.fromarray(np.asarray(binary)).resize((456, 342)).save(
            os.path.join(d, "1_preprocessed.png"))
        lat = np.asarray(jnp.maximum(lat_h, lat_v) * 255).astype(np.uint8)
        Image.fromarray(lat).save(os.path.join(d, "2_lattice.png"))
        comp = grid_region_from_lattice(lat_h, lat_v)
        Image.fromarray(
            (np.asarray(comp) * 255).astype(np.uint8)).save(
            os.path.join(d, "3_region.png"))
        from sudoku_vision_tpu.ops.warp import homography_np
        from sudoku_vision_tpu.utils.cv_ref import warp_perspective_np

        m = homography_np(np.asarray(det.corners, np.float64), (450, 450))
        Image.fromarray(warp_perspective_np(
            np.asarray(gray), m, (450, 450))).save(
            os.path.join(d, "4_warped.png"))
        cells_np = np.asarray(cells)
        sheet = np.zeros((9 * 30, 9 * 30), np.uint8)
        for r in range(9):
            for c in range(9):
                sheet[r * 30 + 1:r * 30 + 29,
                      c * 30 + 1:c * 30 + 29] = cells_np[r * 9 + c]
                Image.fromarray(cells_np[r * 9 + c]).save(
                    os.path.join(d, f"cell_{r}_{c}.png"))
        Image.fromarray(sheet).save(os.path.join(d, "5_cells.png"))
    return result


def print_report(results: list[dict]):
    ok = [r for r in results if "error" not in r]
    bad = [r for r in results if "error" in r]
    print(f"\n{len(ok)}/{len(results)} images passed CV pipeline")
    by_type: dict = {}
    for r in bad:
        by_type.setdefault(r["error"], []).append(r["image"])
    for err, names in by_type.items():
        print(f"  {err}: {names}")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="CV-only pipeline validation")
    p.add_argument("--images", default="data/golden")
    p.add_argument("--debug-out", help="write staged debug dumps here")
    args = p.parse_args(argv)
    paths = sorted(glob.glob(os.path.join(args.images, "*.jpg"))
                   + glob.glob(os.path.join(args.images, "*.png")))
    results = []
    for path in paths:
        r = run_cv_only(path, args.debug_out)
        state = "ok" if "error" not in r else r["error"]
        print(f"{r['image']}: {state} (area {r.get('area_frac', 0):.2f})")
        results.append(r)
    print_report(results)
    return 0 if all("error" not in r for r in results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
