"""Sudoku-rule validation of CNN predictions.

Capability parity with reference pipeline/validator.py: duplicate
detection across rows/cols/boxes (:69 validate_predictions), conflict
graph (:182), ranking cells by conflict involvement and confidence
(:202), and legal-candidate computation (:233).

Vectorized with numpy where it pays (duplicate scan), plain Python where
clarity wins (graph structures). Consumes the (81, 10) probability array
from the perception graph, so top-k alternatives are free.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np


@dataclass(frozen=True)
class Conflict:
    """One rule violation: same digit twice in a unit."""

    unit_type: str            # 'row' | 'col' | 'box'
    unit_index: int
    digit: int
    cells: tuple              # ((r, c), ...) cells holding the digit


@dataclass
class CellInfo:
    """Per-cell prediction info with alternatives."""

    row: int
    col: int
    digit: int
    confidence: float
    alternatives: list = field(default_factory=list)  # [(digit, prob), ...]


@dataclass
class ValidationResult:
    is_valid: bool
    conflicts: list            # [Conflict]
    conflicted_cells: set      # {(r, c)}
    n_filled: int


def _units():
    for r in range(9):
        yield "row", r, [(r, c) for c in range(9)]
    for c in range(9):
        yield "col", c, [(r, c) for r in range(9)]
    for b in range(9):
        cells = [((b // 3) * 3 + i // 3, (b % 3) * 3 + i % 3)
                 for i in range(9)]
        yield "box", b, cells


def validate_predictions(grid: np.ndarray) -> ValidationResult:
    """Find all duplicate conflicts (reference validator.py:69)."""
    grid = np.asarray(grid).reshape(9, 9)
    conflicts = []
    conflicted = set()
    for unit_type, idx, cells in _units():
        values = {}
        for (r, c) in cells:
            d = int(grid[r, c])
            if d == 0:
                continue
            values.setdefault(d, []).append((r, c))
        for d, where in values.items():
            if len(where) > 1:
                conflicts.append(Conflict(unit_type, idx, d, tuple(where)))
                conflicted.update(where)
    return ValidationResult(
        is_valid=not conflicts, conflicts=conflicts,
        conflicted_cells=conflicted, n_filled=int((grid != 0).sum()))


def get_conflict_graph(result: ValidationResult) -> dict:
    """cell -> set of cells it conflicts with (reference validator.py:182)."""
    graph: dict = {}
    for conf in result.conflicts:
        for a in conf.cells:
            for b in conf.cells:
                if a != b:
                    graph.setdefault(a, set()).add(b)
    return graph


def rank_cells_by_conflict_involvement(
    result: ValidationResult, confidence: np.ndarray
) -> list:
    """Cells ordered by (conflict count desc, confidence asc) — most
    suspicious first (reference validator.py:202)."""
    confidence = np.asarray(confidence).reshape(9, 9)
    counts: dict = {}
    for conf in result.conflicts:
        for cell in conf.cells:
            counts[cell] = counts.get(cell, 0) + 1
    return sorted(counts,
                  key=lambda rc: (-counts[rc], confidence[rc[0], rc[1]]))


def get_possible_values(grid: np.ndarray, row: int, col: int) -> set:
    """Digits legal at (row, col) given current grid
    (reference validator.py:233)."""
    grid = np.asarray(grid).reshape(9, 9)
    used = set(grid[row, :].tolist()) | set(grid[:, col].tolist())
    br, bc = (row // 3) * 3, (col // 3) * 3
    used |= set(grid[br:br + 3, bc:bc + 3].ravel().tolist())
    return set(range(1, 10)) - used


def cells_from_probs(probs: np.ndarray, top_k: int = 3) -> list:
    """Build CellInfo list (with top-k alternatives) from (81, 10) probs."""
    probs = np.asarray(probs).reshape(81, 10)
    cells = []
    for i in range(81):
        order = np.argsort(probs[i])[::-1]
        digit = int(order[0])
        alts = [(int(d), float(probs[i, d])) for d in order[1:top_k + 1]]
        cells.append(CellInfo(i // 9, i % 9, digit, float(probs[i, digit]),
                              alts))
    return cells
