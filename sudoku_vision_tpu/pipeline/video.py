"""Video pipeline: batched frames, temporal stabilization, stability gate.

Capability parity with the reference's video paths: GridStabilizer
temporal smoothing + MotionDetector gating (reference cv/stabilizer.py),
the iOS 3-identical-consecutive-grids stability gate before solving
(reference ios ScanPipeline.swift:245 checkStability), and the web app's
continuous detect loop (reference web/src/main.ts:183).

TPU design: a whole frame chunk runs through ONE jitted graph —
vmap(perceive) over frames, then lax.scan of the Kalman stabilizer over
the frame axis — so a video clip is two device calls, not a Python
per-frame loop. The host consumes the per-frame digit grids, applies the
identical-grids gate, and solves once per stable segment.

CLI (processes image files as a frame sequence):
    python -m sudoku_vision_tpu.pipeline.video frame0.png frame1.png ...
"""

from __future__ import annotations

import argparse
import functools
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from sudoku_vision_tpu import solver as native_solver
from sudoku_vision_tpu.cv.stabilizer import stabilize_sequence
from sudoku_vision_tpu.pipeline.run_v2 import load_model
from sudoku_vision_tpu.pipeline.graph import perceive


@dataclass
class VideoResult:
    n_frames: int
    stable_frame: int | None        # first frame that passed the gate
    recognized_grid: np.ndarray | None
    solved_grid: np.ndarray | None
    status: str
    corners_smoothed: np.ndarray    # (T, 4, 2)
    per_frame_digits: np.ndarray    # (T, 81)
    fps: float = 0.0
    notes: list = field(default_factory=list)


@functools.lru_cache(maxsize=2)
def _jitted_chunk(t: int, h: int, w: int, c: int, model_name: str):
    model, variables, temperature, _, use_clahe = load_model(model_name)

    @jax.jit
    def fn(frames):
        out = jax.vmap(lambda im: perceive(
            im, model, variables, temperature=jnp.float32(temperature),
            use_clahe=use_clahe, packed_bgr=True))(frames)
        stab = stabilize_sequence(out.corners, out.grid_found)
        return out.digits, out.confidence, out.grid_found, stab

    return fn


def process_frames(
    frames: np.ndarray,
    model_name: str = "v3",
    required_stable: int = 3,
) -> VideoResult:
    """frames: (T, H, W, 3) uint8 BGR — one video chunk."""
    t, h, w, c = frames.shape
    fn = _jitted_chunk(t, h, w, c, model_name)
    t0 = time.perf_counter()
    # Host-packed BGR rows: the Pallas gray+pool streaming layout.
    digits_d, conf_d, found_d, stab = fn(
        jnp.asarray(frames.reshape(t, h, w * 3)))
    digits = np.asarray(digits_d)
    found = np.asarray(found_d)
    corners_s = np.asarray(stab.corners)
    dt = time.perf_counter() - t0

    # Host: identical-consecutive-grids gate (ios ScanPipeline:245).
    stable_at = None
    run = 1
    for i in range(1, t):
        if found[i] and found[i - 1] and np.array_equal(digits[i],
                                                        digits[i - 1]):
            run += 1
            if run >= required_stable:
                stable_at = i
                break
        else:
            run = 1

    if stable_at is None:
        return VideoResult(
            n_frames=t, stable_frame=None, recognized_grid=None,
            solved_grid=None, status="unstable",
            corners_smoothed=corners_s, per_frame_digits=digits,
            fps=t / dt, notes=["no stable grid across chunk"])

    grid = digits[stable_at].reshape(9, 9)
    sres = native_solver.solve(grid)
    return VideoResult(
        n_frames=t, stable_frame=stable_at, recognized_grid=grid,
        solved_grid=sres.grid if sres.solved else None,
        status=sres.status_name, corners_smoothed=corners_s,
        per_frame_digits=digits, fps=t / dt)


def main(argv=None) -> int:
    from sudoku_vision_tpu.pipeline.run import format_grid
    from sudoku_vision_tpu.utils.imageio import load_bgr

    p = argparse.ArgumentParser(description="video-chunk pipeline")
    p.add_argument("frames", nargs="+", help="frame image files, in order")
    p.add_argument("--model", default="v3")
    p.add_argument("--required-stable", type=int, default=3)
    args = p.parse_args(argv)

    frames = np.stack([load_bgr(f) for f in args.frames])
    res = process_frames(frames, args.model, args.required_stable)
    print(f"{res.n_frames} frames @ {res.fps:.1f} fps; status: {res.status}"
          f"; stable at frame {res.stable_frame}")
    if res.recognized_grid is not None:
        print(format_grid(res.recognized_grid))
    if res.solved_grid is not None:
        print("solution:")
        print(format_grid(res.solved_grid))
    return 0 if res.status == "solved" else 1


if __name__ == "__main__":
    raise SystemExit(main())
