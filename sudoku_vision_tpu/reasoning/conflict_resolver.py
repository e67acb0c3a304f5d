"""Beam-search error correction over conflicted predictions.

Capability parity with reference pipeline/conflict_resolver.py: beam
width 5, max 3 corrections, candidates drawn from conflicted cells'
top-k alternatives with prob >= 0.1 capped at 10 per expansion (:180,
:223), path score = 100*conflicts + 10*(1 - avg confidence) (:246),
returns the best valid or least-conflicted correction set (:77).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from sudoku_vision_tpu.reasoning.validator import (
    rank_cells_by_conflict_involvement, validate_predictions,
)


@dataclass
class ResolutionResult:
    success: bool
    grid: np.ndarray                 # (9, 9) corrected grid
    corrections: list = field(default_factory=list)  # [((r,c), old, new)]
    remaining_conflicts: int = 0
    paths_explored: int = 0


@dataclass
class _Path:
    grid: np.ndarray
    corrections: list
    score: float
    n_conflicts: int


def _score(grid: np.ndarray, probs: np.ndarray, corrections: list):
    """Lower is better (reference conflict_resolver.py:246)."""
    res = validate_predictions(grid)
    filled = grid.reshape(-1) != 0
    conf = probs.reshape(81, 10)[np.arange(81), grid.reshape(-1)]
    avg_conf = conf[filled].mean() if filled.any() else 1.0
    return (100.0 * len(res.conflicts) + 10.0 * (1.0 - float(avg_conf)),
            len(res.conflicts))


def resolve_conflicts(
    grid: np.ndarray,
    probs: np.ndarray,
    beam_width: int = 5,
    max_corrections: int = 3,
    min_alt_prob: float = 0.1,
    max_candidates: int = 10,
    top_k: int = 3,
) -> ResolutionResult:
    """Search for a small set of digit swaps that removes all conflicts.

    grid: (9, 9) predicted digits; probs: (81, 10) softmax probabilities.
    """
    grid = np.asarray(grid).reshape(9, 9).copy()
    probs = np.asarray(probs).reshape(81, 10)

    base = validate_predictions(grid)
    if base.is_valid:
        return ResolutionResult(True, grid, [], 0, 0)

    s0, c0 = _score(grid, probs, [])
    beam = [_Path(grid, [], s0, c0)]
    best = beam[0]
    explored = 0

    for _ in range(max_corrections):
        expansions: list[_Path] = []
        for path in beam:
            res = validate_predictions(path.grid)
            if res.is_valid:
                continue
            ranked = rank_cells_by_conflict_involvement(
                res, probs.reshape(81, 10).max(axis=1).reshape(9, 9))
            # Candidate swaps: top-k alternatives of conflicted cells.
            candidates = []
            for (r, c) in ranked:
                i = r * 9 + c
                order = np.argsort(probs[i])[::-1]
                for alt in order[1:top_k + 1]:
                    if probs[i, alt] >= min_alt_prob:
                        candidates.append(((r, c), int(alt),
                                           float(probs[i, alt])))
            candidates.sort(key=lambda t: -t[2])
            for (r, c), alt, _p in candidates[:max_candidates]:
                if any(cell == (r, c) for cell, _, _ in path.corrections):
                    continue
                g2 = path.grid.copy()
                old = int(g2[r, c])
                if old == alt:
                    continue
                g2[r, c] = alt
                s, nc = _score(g2, probs, None)
                expansions.append(_Path(
                    g2, path.corrections + [((r, c), old, alt)], s, nc))
                explored += 1
        if not expansions:
            break
        expansions.sort(key=lambda p: p.score)
        beam = expansions[:beam_width]
        if beam[0].score < best.score:
            best = beam[0]
        if beam[0].n_conflicts == 0:
            best = beam[0]
            break

    return ResolutionResult(
        success=best.n_conflicts == 0,
        grid=best.grid,
        corrections=best.corrections,
        remaining_conflicts=best.n_conflicts,
        paths_explored=explored,
    )
