"""v1 end-to-end pipeline: image file -> recognized grid -> solution.

Mirrors the reference v1 CLI contract (reference pipeline/run.py:244
run_pipeline -> PipelineResult with per-stage timings; CLI main :373) on
the TPU-native stack: one jitted perception graph (pipeline/graph.py)
replaces the CV+ML stages, the native C++ solver replaces the subprocess
+ temp-file hop (reference run.py:163), and constraint checking uses the
solver's validator.

Usage:
    python -m sudoku_vision_tpu.pipeline.run photo.jpg [--debug] [-o out.png]
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
from sudoku_vision_tpu.ml.checkpoint import load_variables_or_none
from sudoku_vision_tpu.models import DigitCNN
from sudoku_vision_tpu.pipeline.graph import perceive
from sudoku_vision_tpu.utils.imageio import load_bgr


@dataclass
class PipelineResult:
    """Mirrors the reference result surface (reference run.py:48-66)."""

    success: bool
    status: str                      # solved/unsolvable/invalid/detection_failed
    recognized_grid: np.ndarray      # (9, 9) int32, 0 = empty
    solved_grid: np.ndarray | None   # (9, 9) int32 or None
    confidence: np.ndarray           # (9, 9) float32
    corners: np.ndarray              # (4, 2) float32
    low_confidence_cells: list = field(default_factory=list)
    time_cv_ml: float = 0.0          # fused graph time (device)
    time_solver: float = 0.0
    time_total: float = 0.0
    error: str | None = None


@functools.lru_cache(maxsize=4)
def _jitted_graph(h: int, w: int, channels: int):
    """Compile the perception graph for a given frame shape."""
    model = DigitCNN()
    variables = load_variables_or_none("digit_cnn_v1")
    if variables is None:
        # Random init keeps the pipeline runnable before training
        # (predictions are garbage; reference integration tests tolerate
        # the same state, reference tests/test_integration.py:261-266).
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 28, 28, 1), jnp.float32))

    @jax.jit
    def fn(img):
        out = perceive(img, model, variables)
        return (out.digits, out.confidence, out.corners, out.grid_found,
                out.empty_mask)

    return fn


def run_pipeline(
    image_path: str,
    confidence_threshold: float = 0.7,
    debug: bool = False,
) -> PipelineResult:
    t0 = time.perf_counter()
    img = load_bgr(image_path)
    fn = _jitted_graph(*img.shape)

    t1 = time.perf_counter()
    digits_d, conf_d, corners_d, found_d, empty_d = fn(jnp.asarray(img))
    digits = np.asarray(digits_d).reshape(9, 9)
    conf = np.asarray(conf_d).reshape(9, 9)
    corners = np.asarray(corners_d)
    found = bool(found_d)
    t2 = time.perf_counter()

    if not found:
        return PipelineResult(
            success=False, status="detection_failed",
            recognized_grid=digits, solved_grid=None, confidence=conf,
            corners=corners, time_total=time.perf_counter() - t0,
            error="no grid detected")

    low_conf = [
        (r, c, float(conf[r, c]))
        for r in range(9) for c in range(9)
        if digits[r, c] != 0 and conf[r, c] < confidence_threshold
    ]

    t3 = time.perf_counter()
    if not native_solver.validate(digits):
        status, solved = "invalid", None
    else:
        res = native_solver.solve(digits)
        status = res.status_name
        solved = res.grid if res.solved else None
    t4 = time.perf_counter()

    return PipelineResult(
        success=status == "solved", status=status,
        recognized_grid=digits, solved_grid=solved, confidence=conf,
        corners=corners, low_confidence_cells=low_conf,
        time_cv_ml=t2 - t1, time_solver=t4 - t3,
        time_total=time.perf_counter() - t0)


def format_grid(grid: np.ndarray) -> str:
    lines = []
    for r in range(9):
        if r % 3 == 0:
            lines.append("+-------+-------+-------+")
        cells = []
        for c in range(9):
            if c % 3 == 0:
                cells.append("|")
            cells.append(str(grid[r, c]) if grid[r, c] else ".")
        cells.append("|")
        lines.append(" ".join(cells))
    lines.append("+-------+-------+-------+")
    return "\n".join(lines)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="TPU sudoku-vision v1 pipeline")
    p.add_argument("image")
    p.add_argument("--debug", action="store_true")
    p.add_argument("-o", "--output", help="save solution overlay PNG")
    p.add_argument("--confidence-threshold", type=float, default=0.7)
    args = p.parse_args(argv)

    res = run_pipeline(args.image, args.confidence_threshold, args.debug)
    print(f"status: {res.status}")
    print("recognized grid:")
    print(format_grid(res.recognized_grid))
    if res.solved_grid is not None:
        print("solution:")
        print(format_grid(res.solved_grid))
    if res.low_confidence_cells:
        print(f"low-confidence cells (<{args.confidence_threshold}): "
              f"{[(r, c, round(v, 2)) for r, c, v in res.low_confidence_cells]}")
    print(f"timings: graph {res.time_cv_ml * 1e3:.1f} ms, "
          f"solver {res.time_solver * 1e3:.2f} ms, "
          f"total {res.time_total * 1e3:.1f} ms")
    if args.output and res.solved_grid is not None:
        from sudoku_vision_tpu.pipeline.overlay import create_solution_overlay
        from sudoku_vision_tpu.utils.imageio import load_bgr, save_image
        overlay = create_solution_overlay(
            load_bgr(args.image), res.recognized_grid, res.solved_grid,
            res.corners, res.confidence)
        save_image(args.output, overlay)
        print(f"overlay saved to {args.output}")
    return 0 if res.success else 1


if __name__ == "__main__":
    raise SystemExit(main())
