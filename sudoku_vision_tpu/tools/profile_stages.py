"""Per-stage latency profile of the fused perception graph.

Times progressively larger PREFIXES of perceive() on a real golden-frame
batch (the same workload as bench.py); stage cost = difference between
consecutive prefixes. Fetch-timed (np.asarray on the outputs) because
jax.block_until_ready is a no-op through the axon tunnel.

Usage:  python -m sudoku_vision_tpu.tools.profile_stages [batch]
"""

from __future__ import annotations

import glob
import sys
import time

sys.path.insert(0, "/root/repo")

from sudoku_vision_tpu.utils import jax_cache

jax_cache.enable()

import jax
import jax.numpy as jnp
import numpy as np

from sudoku_vision_tpu import ops
from sudoku_vision_tpu.cv.extract import (
    cells_empty_mask, extract_cells, preprocess_cells_for_model,
    refine_boundaries,
)
from sudoku_vision_tpu.cv.grid import detect_grid_full


def _stage_fns(model, variables, use_clahe):
    """Return [(name, fn)] where each fn computes a prefix of perceive.
    Frames arrive row-packed (H, W*3) — the bench/serving layout."""
    from sudoku_vision_tpu.ops.pallas_pool import pooled_gray_packed

    def pool(img):
        gh, gw = img.shape[0], img.shape[1] // 3
        ds0 = max(1, round(max(gh, gw) / 950))
        return pooled_gray_packed(img, ds0)

    def detect(img):
        gray_small = pool(img)
        det, lat_h, lat_v, ds_inner, small = detect_grid_full(gray_small)
        return det.corners, lat_h, lat_v

    def _common(img):
        gh, gw = img.shape[0], img.shape[1] // 3
        ds0 = max(1, round(max(gh, gw) / 950))
        gray_small = pool(img)
        det, lat_h, lat_v, ds_inner, small = detect_grid_full(gray_small)
        ds_det = ds0 * ds_inner
        det = det._replace(corners=det.corners * float(ds0) + (ds0 - 1) / 2.0)
        m = ops.homography_from_corners(det.corners, (450, 450))
        m_inv = jnp.linalg.inv(m)
        return det, lat_h, lat_v, ds_det, small, m_inv

    def refine(img):
        det, lat_h, lat_v, ds_det, small, m_inv = _common(img)
        b_y, b_x = refine_boundaries(lat_h, lat_v, m_inv, ds_det, 450)
        return b_y, b_x

    def _cells(img):
        det, lat_h, lat_v, ds_det, small, m_inv = _common(img)
        b_y, b_x = refine_boundaries(lat_h, lat_v, m_inv, ds_det, 450)
        off = (ds_det - 1) / 2.0
        m_inv_small = jnp.stack([
            (m_inv[0] - off * m_inv[2]) / ds_det,
            (m_inv[1] - off * m_inv[2]) / ds_det,
            m_inv[2],
        ])
        cells = extract_cells(small, m_inv_small, 450, 28,
                              boundaries_y=b_y, boundaries_x=b_x,
                              sample_mode="scanline")
        return cells

    def cells_fn(img):
        return _cells(img)

    def preproc(img):
        cells = _cells(img)
        return cells_empty_mask(cells), preprocess_cells_for_model(
            cells, use_clahe)

    def full(img):
        empty, x = preproc(img)
        logits = model.apply(variables, x)
        return empty, jnp.argmax(logits, -1)

    return [("pooled_gray", pool), ("detect", detect),
            ("boundary_refine", refine), ("cell_extract", cells_fn),
            ("cell_preproc", preproc), ("cnn_full", full)]


def main():
    from sudoku_vision_tpu.pipeline.run_v2 import load_model
    from sudoku_vision_tpu.utils.imageio import load_bgr

    batch = int((sys.argv[1:] or [32])[0])
    paths = sorted(glob.glob("/root/repo/data/golden/sample_*.jpg"))
    frames = [load_bgr(p) for p in paths]
    shape = frames[0].shape
    frames = [f for f in frames if f.shape == shape]
    reps = -(-batch // len(frames))
    host = np.stack((frames * reps)[:batch])
    b, fh, fw = host.shape[:3]
    stack = jax.device_put(jnp.asarray(host.reshape(b, fh, fw * 3)))

    model, variables, temperature, _, use_clahe = load_model("v3")

    prev = 0.0
    print(f"batch={batch} frame={shape}")
    for name, fn in _stage_fns(model, variables, use_clahe):
        # Reduce outputs to ONE scalar on device: fetch-timing must not
        # measure device->host transfer of megapixel intermediates.
        def _sum(imgs, f=fn):
            out = jax.vmap(f)(imgs)
            return sum(jnp.sum(o.astype(jnp.float32))
                       for o in jax.tree.leaves(out))

        jf = jax.jit(_sum)
        np.asarray(jf(stack))  # compile + settle

        def window(seconds: float = 2.0) -> float:
            """Pipelined fetch-timed window (same scheme as bench.py,
            but deeper): with D results in flight the measurement floor
            is round_trip_latency/D (~25 ms tunnel round-trip / 10 =
            0.08 ms/frame at batch 32); cheap prefixes read as that
            floor with a shallow pipeline."""
            inflight = [jf(stack) for _ in range(10)]
            for r in inflight:
                r.copy_to_host_async()
            t0 = time.perf_counter()
            iters = 0
            while time.perf_counter() - t0 < seconds or iters < 3:
                r = jf(stack)
                r.copy_to_host_async()
                inflight.append(r)
                np.asarray(inflight.pop(0))
                iters += 1
            for r in inflight:
                np.asarray(r)
                iters += 1
            return (time.perf_counter() - t0) / iters

        dt = min(window() for _ in range(3))
        ms = dt / batch * 1e3
        print(f"{name:16s} cum {ms:7.3f} ms/frame   stage {ms - prev:7.3f}")
        prev = ms
    return 0


if __name__ == "__main__":
    sys.exit(main())
