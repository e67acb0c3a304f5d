"""v2 "smart" pipeline: quality gating + constraint-based error correction.

Capability parity with reference pipeline/run_v2.py: PipelineConfig
(confidence_threshold 0.7, beam_width 5, max_corrections 3,
min_quality_score 40 — reference run_v2.py:48), checkpoint fallback
chain (:95), top-3 alternatives (:149), quality gate (:300), validation
-> beam-search conflict resolution (:355) -> constraint propagation
(:374) -> native solve with timeout semantics (:209), status enum
solved/unsolvable/invalid/quality_failed/detection_failed (:62), and the
confidence map for UIs (:201).

TPU design: perception + quality metrics ride ONE jit graph; host code
consumes the (81, 10) probability tensor (alternatives are free) and
runs the branchy correction search + native solver.
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
from sudoku_vision_tpu.cv.grid_quality import assess_grid_quality, get_user_feedback
from sudoku_vision_tpu.ml import checkpoint as ckpt
from sudoku_vision_tpu.models import DigitCNN, DigitCNNv3, DigitCNNv3Light
from sudoku_vision_tpu.ops import warp_perspective
from sudoku_vision_tpu.pipeline.graph import perceive
from sudoku_vision_tpu.reasoning import (
    resolve_conflicts, resolve_with_constraints, validate_predictions,
)
from sudoku_vision_tpu.utils.imageio import load_bgr


@dataclass
class PipelineConfig:
    """Reference run_v2.py:48 defaults."""

    confidence_threshold: float = 0.7
    beam_width: int = 5
    max_corrections: int = 3
    min_quality_score: float = 40.0
    # Line-selectivity floor (0-100): rejects DEGENERATE moiré quads
    # (photographed screens where stripe lattices, not the grid, won
    # detection). Round-3 calibration over 6 goldens + 52 e2e scenes +
    # 16 fresh screen scenes: every legit quad >= 33.5, correctly
    # detected screen grids 29-44 (moiré pollutes their mid-cell bands
    # but they still SOLVE — the gate must not reject them), the one
    # garbage moiré quad scored exactly 0.0. 20 splits garbage from
    # everything that can solve with a 9-point margin.
    min_selectivity: float = 20.0
    solver_timeout_s: float = 5.0
    model: str = "v3"
    check_quality: bool = True
    # Classify all 4 quarter-turn readings and keep the most confident:
    # full 360-deg rotation coverage (the reference's rotate-and-rerun,
    # cv/grid_v2.py:346, handles small angles only). ~3 extra CNN passes
    # on the 81-cell batch per image.
    auto_orient: bool = True
    # Pyramid levels for grid detection / cell sampling (px of the long
    # side). Smaller detect_width = faster detection; see
    # pipeline/graph.py::perceive for the accuracy tradeoffs.
    detect_width: int = 950
    cell_width: int = 950
    # Detection fallback cascade (reference cv/grid_v2.py:401): when the
    # primary line-lattice detector reports found=False, retry with the
    # cascade strategies (cv/grid_v2.py STRATEGY_PARAMS + Harris+RANSAC)
    # host-side, in confidence order. Each strategy is its own cached
    # jit — zero cost on the hot path, one-off compile on first use.
    cascade: bool = True
    cascade_strategies: tuple = (1, 2, 3)


@dataclass
class PipelineResult:
    success: bool
    # solved/unsolvable/invalid/quality_failed/detection_failed, plus
    # "ambiguous" beyond the reference enum: the grid solves but has
    # MULTIPLE solutions even after given-restoration (see the
    # uniqueness gate in run_pipeline) — solved_grid holds one member
    # of the solution set, success stays False.
    status: str
    recognized_grid: np.ndarray
    corrected_grid: np.ndarray | None
    solved_grid: np.ndarray | None
    confidence: np.ndarray
    confidence_map: dict
    corners: np.ndarray
    quality: dict
    corrections: list = field(default_factory=list)
    quality_feedback: list = field(default_factory=list)
    orientation: int = 0  # quarter-turns CCW applied to upright the grid
    detect_method: str = "lattice"  # cv/grid_v2.py METHODS name that won
    time_graph: float = 0.0
    time_reasoning: float = 0.0
    time_solver: float = 0.0
    time_total: float = 0.0
    error: str | None = None


_MODEL_CLASSES = {"v1": DigitCNN, "v3": DigitCNNv3, "v3light": DigitCNNv3Light}

# Checkpoint fallback chain (reference run_v2.py:104-110). The flagship
# is the combined synthetic+real fine-tune, checkpointed best-by-REAL
# accuracy (reference ml/train.py:334-341): real/test 0.9756 vs the
# synthetic-only digit_cnn_v3_final's 0.9390 (see COVERAGE.md).
_CKPT_CHAIN = {
    "v3": ["digit_cnn_v3_real", "digit_cnn_v3_final", "digit_cnn_v3_combined",
           "digit_cnn_v3_noclahe", "digit_cnn_v3", "digit_cnn_v3_synthetic"],
    "v3light": ["digit_cnn_v3light"],
    "v1": ["digit_cnn_v1"],
}


def load_model(model_name: str = "v3"):
    """Model + variables + temperature + preproc flag via fallback chain.

    On TPU the model computes in bfloat16 (params stay f32 — the
    standard mixed-precision inference config): A/B on the golden set
    shows bit-identical digits, max confidence shift 0.0045, and
    0.04 ms/frame saved at batch 32. CPU (tests, evaluation) stays f32
    (bf16 is emulated there) so calibration metrics are exact.
    """
    from sudoku_vision_tpu.ops.pallas_lattice import on_tpu

    dtype = jnp.bfloat16 if on_tpu() else jnp.float32
    model = _MODEL_CLASSES[model_name](dtype=dtype)
    name, variables = ckpt.load_first(_CKPT_CHAIN[model_name])
    temperature, use_clahe = 1.0, True
    if variables is None:
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 28, 28, 1), jnp.float32))
    else:
        meta = ckpt.load_metadata(name)
        temperature = float(meta.get("temperature", 1.0))
        use_clahe = bool(meta.get("use_clahe", True))
    return model, variables, temperature, name, use_clahe


@functools.lru_cache(maxsize=16)
def _jitted_graph(h: int, w: int, channels: int, model_name: str,
                  orient: str = "fixed", detect_width: int = 950,
                  cell_width: int = 950, detect_strategy: int = 0):
    model, variables, temperature, ckpt_name, use_clahe = load_model(
        model_name)
    from sudoku_vision_tpu.ml.disambig17 import load_aux17

    aux17 = load_aux17() if not use_clahe else None

    @jax.jit
    def fn(img):
        out = perceive(img, model, variables,
                       temperature=jnp.float32(temperature),
                       use_clahe=use_clahe, orient=orient,
                       detect_width=detect_width, cell_width=cell_width,
                       detect_strategy=detect_strategy, aux17=aux17)
        from sudoku_vision_tpu import ops
        gray = ops.bgr_to_gray(img) if img.ndim == 3 else img
        m = ops.homography_from_corners(out.corners, (450, 450))
        warped = warp_perspective(gray, m, (450, 450))
        quality = assess_grid_quality(warped, out.corners)
        return out, quality

    return fn, ckpt_name


def build_confidence_map(digits: np.ndarray, conf: np.ndarray,
                         threshold: float) -> dict:
    """Per-cell confidence levels for UI (reference run_v2.py:201)."""
    out = {}
    for r in range(9):
        for c in range(9):
            level = ("high" if conf[r, c] >= 0.9 else
                     "medium" if conf[r, c] >= threshold else "low")
            out[(r, c)] = {"digit": int(digits[r, c]),
                           "confidence": float(conf[r, c]),
                           "level": level}
    return out


def run_pipeline(
    image_path_or_array,
    config: PipelineConfig | None = None,
    debug: bool = False,
) -> PipelineResult:
    config = config or PipelineConfig()
    t0 = time.perf_counter()
    img = (load_bgr(image_path_or_array)
           if isinstance(image_path_or_array, str) else
           np.asarray(image_path_or_array))
    orient = "auto" if config.auto_orient else "fixed"
    shape = img.shape if img.ndim == 3 else (*img.shape, 1)
    img_dev = jnp.asarray(img)

    t1 = time.perf_counter()
    from sudoku_vision_tpu.cv.grid_v2 import METHODS

    strategies = (0,) + (tuple(config.cascade_strategies)
                         if config.cascade else ())
    for strategy in strategies:
        fn, _ = _jitted_graph(*shape, config.model, orient,
                              config.detect_width, config.cell_width,
                              strategy)
        out, quality = fn(img_dev)
        found = bool(out.grid_found)
        if found:
            break
    detect_method = METHODS[strategy] if found else METHODS[0]
    digits = np.asarray(out.digits).reshape(9, 9)
    conf = np.asarray(out.confidence).reshape(9, 9)
    probs = np.asarray(out.probs)
    corners = np.asarray(out.corners)
    qdict = {k: float(getattr(quality, k)) for k in
             ("overall", "sharpness", "contrast", "completeness",
              "geometry", "size", "selectivity")}
    t2 = time.perf_counter()

    base = dict(recognized_grid=digits, corrected_grid=None,
                solved_grid=None, confidence=conf,
                confidence_map=build_confidence_map(
                    digits, conf, config.confidence_threshold),
                corners=corners, quality=qdict,
                quality_feedback=get_user_feedback(quality),
                orientation=int(out.orientation),
                detect_method=detect_method,
                time_graph=t2 - t1)

    if not found:
        return PipelineResult(success=False, status="detection_failed",
                              error="no grid detected",
                              time_total=time.perf_counter() - t0, **base)
    if config.check_quality and qdict["overall"] < config.min_quality_score:
        return PipelineResult(success=False, status="quality_failed",
                              error=f"quality {qdict['overall']:.0f} < "
                                    f"{config.min_quality_score:.0f}",
                              time_total=time.perf_counter() - t0, **base)
    if config.check_quality and qdict["selectivity"] < config.min_selectivity:
        # Separate gate from `overall` (which keeps the reference's
        # 5-metric formula): moiré from photographed screens passes all
        # five metrics (round-2 tail scored 88) but collapses line
        # selectivity (cv/grid_quality.py::compute_selectivity).
        return PipelineResult(success=False, status="quality_failed",
                              error="striped interference: selectivity "
                                    f"{qdict['selectivity']:.0f} < "
                                    f"{config.min_selectivity:.0f}",
                              time_total=time.perf_counter() - t0, **base)

    # --- reasoning: validate -> beam correction -> propagation ---
    t3 = time.perf_counter()
    work = digits.copy()
    corrections = []
    validation = validate_predictions(work)
    if not validation.is_valid:
        res = resolve_conflicts(work, probs,
                                beam_width=config.beam_width,
                                max_corrections=config.max_corrections)
        work = res.grid
        corrections = res.corrections
        validation = validate_predictions(work)
    if not validation.is_valid:
        # Solver-backed escalation: beam alternatives are capped at
        # prob >= 0.1 (reference parity); confidently-wrong reads need
        # the solver's legality masks to surface the true digit (see
        # reasoning/conflict_resolver.py::resolve_with_solver).
        from sudoku_vision_tpu.reasoning import resolve_with_solver

        esc = resolve_with_solver(work, probs)
        if esc.success:
            work = esc.grid
            corrections = corrections + esc.corrections
            validation = validate_predictions(work)

    status = None
    if not validation.is_valid:
        status = "invalid"
    else:
        prop = resolve_with_constraints(work, conf)
        if prop.success:
            work = prop.grid
    t4 = time.perf_counter()
    base["corrected_grid"] = work.copy()

    solved = None
    t5 = time.perf_counter()
    if status is None:
        sres = native_solver.solve(work, timeout_s=config.solver_timeout_s)
        if not sres.solved and sres.status_name == "unsolvable":
            # Valid-but-unsolvable: a confidently-wrong read that
            # violates no unit constraint. Removal-certificate
            # escalation (reasoning/conflict_resolver.py).
            from sudoku_vision_tpu.reasoning import resolve_unsolvable

            esc = resolve_unsolvable(work, probs)
            if esc.success:
                work = esc.grid
                corrections = corrections + esc.corrections
                base["corrected_grid"] = work.copy()
                sres = native_solver.solve(
                    work, timeout_s=config.solver_timeout_s)
        if sres.solved:
            status = "solved"
            solved = sres.grid
            # Uniqueness gate: a proper sudoku has ONE solution, so a
            # solvable recognized grid with several is a fingerprint of
            # an erased given (digit swallowed upstream) — the solver
            # would silently return an arbitrary member of the solution
            # set. Restore the most confident CNN digit readings among
            # empty-reported cells until unique; if ambiguity survives,
            # say so instead of presenting a coin-flip as the answer.
            if native_solver.count_solutions(work, 2) > 1:
                from sudoku_vision_tpu.reasoning import \
                    restore_erased_givens

                rest = restore_erased_givens(
                    work, probs, limit=config.max_corrections)
                if rest.corrections:
                    r2 = native_solver.solve(
                        rest.grid, timeout_s=config.solver_timeout_s)
                    if r2.solved:
                        work = rest.grid
                        corrections = corrections + rest.corrections
                        base["corrected_grid"] = work.copy()
                        solved = r2.grid
                if not rest.success:
                    status = "ambiguous"
        else:
            # Valid grid that still won't solve (escalation failed):
            # report the solver's own verdict honestly ("unsolvable" /
            # "invalid"). Pre-round-5 this path leaked status=None
            # (surfaced by a widened 1v7 gate flipping two screen 7s,
            # sweep 90210 s010 — the gate was reverted, the leak is
            # fixed regardless).
            status = sres.status_name
    t6 = time.perf_counter()

    base["solved_grid"] = solved
    return PipelineResult(
        success=status == "solved", status=status,
        corrections=corrections,
        time_reasoning=t4 - t3, time_solver=t6 - t5,
        time_total=time.perf_counter() - t0, **base)


def main(argv=None) -> int:
    from sudoku_vision_tpu.pipeline.run import format_grid

    p = argparse.ArgumentParser(description="TPU sudoku-vision v2 pipeline")
    p.add_argument("image")
    p.add_argument("--model", choices=list(_MODEL_CLASSES), default="v3")
    p.add_argument("--no-quality-check", action="store_true")
    p.add_argument("--confidence-threshold", type=float, default=0.7)
    p.add_argument("--beam-width", type=int, default=5)
    p.add_argument("--max-corrections", type=int, default=3)
    p.add_argument("-o", "--output", help="save solution overlay PNG")
    args = p.parse_args(argv)

    config = PipelineConfig(
        confidence_threshold=args.confidence_threshold,
        beam_width=args.beam_width, max_corrections=args.max_corrections,
        model=args.model, check_quality=not args.no_quality_check)
    res = run_pipeline(args.image, config)
    print(f"status: {res.status}")
    if res.detect_method != "lattice":
        print(f"detection: fallback strategy '{res.detect_method}'")
    print(f"quality: " + ", ".join(
        f"{k}={v:.0f}" for k, v in res.quality.items()))
    if res.quality_feedback:
        print("feedback:", "; ".join(res.quality_feedback))
    print("recognized grid:")
    print(format_grid(res.recognized_grid))
    if res.corrections:
        print(f"corrections: {res.corrections}")
    if res.solved_grid is not None:
        print("solution:")
        print(format_grid(res.solved_grid))
    print(f"timings: graph {res.time_graph * 1e3:.1f} ms, "
          f"reasoning {res.time_reasoning * 1e3:.1f} ms, "
          f"solver {res.time_solver * 1e3:.2f} ms, "
          f"total {res.time_total * 1e3:.1f} ms")
    if args.output and res.solved_grid is not None:
        from sudoku_vision_tpu.pipeline.overlay import create_solution_overlay
        from sudoku_vision_tpu.utils.imageio import save_image
        save_image(args.output, create_solution_overlay(
            load_bgr(args.image), res.recognized_grid, res.solved_grid,
            res.corners, res.confidence))
        print(f"overlay saved to {args.output}")
    return 0 if res.success else 1


if __name__ == "__main__":
    raise SystemExit(main())
