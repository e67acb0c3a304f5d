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


def resolve_unsolvable(
    grid: np.ndarray,
    probs: np.ndarray,
    max_suspects: int = 4,
) -> ResolutionResult:
    """Escalation for VALID-but-unsolvable grids (no conflicts to blame).

    A confidently-wrong read can land on a digit that violates no unit
    constraint yet kills every completion — the conflict machinery never
    fires. Removal certificates identify the culprits: a filled cell is
    a SUSPECT iff blanking it (alone) makes the grid solvable (one
    native-solver call per filled cell, ~us each). For each suspect the
    solver's candidate mask on the blanked grid gives the legal
    replacements; the most probable legal digit that yields a solvable
    grid wins (ties to the fewest-correction, highest-probability fix).
    Blanking the cell outright is the fallback — "couldn't read it"
    beats "refused the frame".
    """
    from sudoku_vision_tpu import solver as native_solver

    grid = np.asarray(grid).reshape(9, 9).copy()
    probs = np.asarray(probs).reshape(81, 10)
    if not validate_predictions(grid).is_valid:
        return ResolutionResult(False, grid, [], 1, 0)
    if native_solver.solve(grid.copy()).solved:
        return ResolutionResult(True, grid, [], 0, 0)

    filled = [(r, c) for r in range(9) for c in range(9) if grid[r, c]]
    suspects = []
    explored = 0
    for (r, c) in filled:
        test = grid.copy()
        test[r, c] = 0
        explored += 1
        if native_solver.solve(test).solved:
            suspects.append((r, c))
    if not suspects or len(suspects) > max_suspects:
        # Everything (or nothing) is a certificate: more than one read
        # is wrong in a coupled way — beyond single-cell repair.
        return ResolutionResult(False, grid, [], 1, explored)

    best = None  # (logp, (r, c), digit)
    for (r, c) in suspects:
        blanked = grid.copy()
        old = int(blanked[r, c])
        blanked[r, c] = 0
        mask = int(native_solver.candidates(blanked).reshape(9, 9)[r, c])
        for d in range(1, 10):
            if d == old or not (mask & (1 << d)):
                continue
            test = blanked.copy()
            test[r, c] = d
            explored += 1
            if native_solver.solve(test).solved:
                lp = float(np.log(max(probs[r * 9 + c, d], 1e-12)))
                if best is None or lp > best[0]:
                    best = (lp, (r, c), d)
    if best is None:
        # No single reassignment restores solvability; blank the most
        # suspicious certificate cell (lowest model confidence).
        r, c = min(suspects,
                   key=lambda rc: probs[rc[0] * 9 + rc[1],
                                        grid[rc[0], rc[1]]])
        out = grid.copy()
        old = int(out[r, c])
        out[r, c] = 0
        return ResolutionResult(True, out, [((r, c), old, 0)], 0, explored)
    _, (r, c), d = best
    out = grid.copy()
    old = int(out[r, c])
    out[r, c] = d
    return ResolutionResult(True, out, [((r, c), old, d)], 0, explored)


def resolve_with_solver(
    grid: np.ndarray,
    probs: np.ndarray,
    max_suspects: int = 6,
    max_nodes: int = 512,
    blank_prob: float = 1e-3,
) -> ResolutionResult:
    """Solver-backed escalation when the beam search fails.

    The beam search (reference parity) only considers alternatives with
    prob >= 0.1 — a CONFIDENTLY wrong read (e.g. a handwritten 1 with a
    long flag classified 7 at p=0.93, the true digit at p=0.06) leaves
    the grid invalid. This stage goes beyond the reference: the cells
    implicated in conflicts are blanked, the native solver's candidate
    masks give each suspect its LEGAL digits, and a tiny DFS over joint
    reassignments (ordered by model probability, solvability-checked)
    picks the most probable consistent reading. A suspect may also stay
    blank (probability `blank_prob`) so an unreadable cell degrades to
    "let the solver fill it" instead of failing the frame.

    Runs only on grids the beam left invalid, so it can turn failures
    into solves but never perturbs an already-valid reading.
    """
    from sudoku_vision_tpu import solver as native_solver

    grid = np.asarray(grid).reshape(9, 9).copy()
    probs = np.asarray(probs).reshape(81, 10)
    base = validate_predictions(grid)
    if base.is_valid:
        return ResolutionResult(True, grid, [], 0, 0)
    suspects = sorted(base.conflicted_cells)
    if len(suspects) > max_suspects:
        return ResolutionResult(False, grid, [], len(base.conflicts), 0)

    blanked = grid.copy()
    for (r, c) in suspects:
        blanked[r, c] = 0
    if not validate_predictions(blanked).is_valid:
        return ResolutionResult(False, grid, [], len(base.conflicts), 0)

    best_assign = None
    best_logp = -np.inf
    explored = 0
    logp_cell = np.log(np.maximum(probs, 1e-12))
    log_blank = float(np.log(blank_prob))

    def dfs(i: int, work: np.ndarray, logp: float):
        nonlocal best_assign, best_logp, explored
        # max_nodes counts EVERY visit (not just terminals): with up to
        # max_suspects * 10 branches per level the interior of the tree
        # is where a pathological grid would burn time.
        if explored >= max_nodes or logp <= best_logp:
            return
        explored += 1
        if i == len(suspects):
            test = work.copy()
            if native_solver.solve(test).solved:
                best_logp = logp
                best_assign = work.copy()
            return
        r, c = suspects[i]
        cands = native_solver.candidates(work)
        mask = int(cands.reshape(9, 9)[r, c])
        opts = [(float(logp_cell[r * 9 + c, d]), d)
                for d in range(1, 10) if mask & (1 << d)]
        opts.append((log_blank, 0))
        for lp, d in sorted(opts, reverse=True):
            work[r, c] = d
            dfs(i + 1, work, logp + lp)
            work[r, c] = 0

    dfs(0, blanked.copy(), 0.0)
    if best_assign is None:
        return ResolutionResult(False, grid, [], len(base.conflicts), explored)
    corrections = [((r, c), int(grid[r, c]), int(best_assign[r, c]))
                   for (r, c) in suspects
                   if int(best_assign[r, c]) != int(grid[r, c])]
    return ResolutionResult(True, best_assign, corrections, 0, explored)


def restore_erased_givens(
    grid: np.ndarray,
    probs: np.ndarray,
    limit: int = 3,
    min_p: float = 0.5,
) -> ResolutionResult:
    """Uniqueness repair for ERASED givens (runs after a successful solve).

    A proper sudoku has exactly one solution; when the recognized grid
    SOLVES but ``count_solutions > 1``, a given was almost certainly
    lost upstream — e.g. a low-contrast digit claimed by the empty mask
    (sweep 90210 ``s077_low_light`` silently returned one of a
    2-solution puzzle's answers at "confidence 1.0"). The CNN's
    distribution still carries the erased digit: greedily restore the
    most confident digit reading among empty-reported cells until the
    puzzle is unique again. A candidate must keep the grid valid AND
    solvable, so restoration can only select among the existing
    solution set — it narrows ambiguity, never invents contradictions.

    Beyond the reference: its solver returns the first solution found
    with no uniqueness check anywhere (reference solver/src/sudoku.c:72,
    pipeline/run_v2.py:254).

    success=True means the grid is now uniquely solvable; on False the
    caller should surface the ambiguity (status "ambiguous") instead of
    presenting an arbitrary member of the solution set as THE answer.
    """
    from sudoku_vision_tpu import solver as native_solver

    g = np.asarray(grid).copy()
    p81 = np.asarray(probs).reshape(81, 10)
    corrections: list = []
    # A candidate must strictly REDUCE the solution count to be
    # committed (advisor finding, round 4): a digit common to every
    # solution is valid + solvable yet narrows nothing, and committing
    # it burned the limit budget on no-ops while the actually erased
    # given went unrestored — a spurious "ambiguous". Counts are
    # saturated at a small cap; two counts at the cap compare equal,
    # so such a candidate is (conservatively) skipped too.
    cap = 8
    cur = native_solver.count_solutions(g, cap)
    for _ in range(limit + 1):
        if cur == 1:
            return ResolutionResult(True, g, corrections)
        if len(corrections) >= limit:
            break
        flat = g.reshape(-1)
        cands = []
        for idx in np.flatnonzero(flat == 0):
            d = int(np.argmax(p81[idx]))
            if d != 0 and float(p81[idx, d]) >= min_p:
                cands.append((float(p81[idx, d]), int(idx), d))
        placed = False
        fallback = None
        for _pconf, idx, d in sorted(cands, reverse=True):
            t = g.copy()
            t[idx // 9, idx % 9] = d
            if not native_solver.validate(t):
                continue
            cnt = native_solver.count_solutions(t, cap)
            if 0 < cnt < cur:      # solvable AND strictly narrower
                corrections.append(((idx // 9, idx % 9), 0, d))
                g, cur = t, cnt
                placed = True
                break
            if cnt >= cap and fallback is None:
                fallback = (idx, d, t, cnt)
        if not placed and fallback is not None and cur >= cap:
            # Both counts saturate the cap: narrowing is UNPROVABLE,
            # not absent (code-review finding, round 5) — e.g. two
            # erased givens with 20 -> 10 solutions both read as
            # ">= cap". Refusing here would dead-end grids the
            # pre-narrowing rule repaired over several iterations, so
            # commit the best valid+solvable candidate; the no-op skip
            # (digits common to every solution) still applies whenever
            # counts are exact.
            idx, d, t, cnt = fallback
            corrections.append(((idx // 9, idx % 9), 0, d))
            g, cur = t, cnt
            placed = True
        if not placed:
            break
    return ResolutionResult(False, g, corrections)
