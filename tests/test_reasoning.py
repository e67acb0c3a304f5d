"""Reasoning layer tests (validator / conflict resolver / propagation).

Mirrors the reference's reasoning behavior (reference pipeline/
validator.py, conflict_resolver.py, constraint_resolver.py).
Pure host code — no jax compiles, fast.
"""

import numpy as np

from sudoku_vision_tpu.reasoning import (
    get_conflict_graph, get_possible_values, rank_cells_by_conflict_involvement,
    resolve_conflicts, resolve_with_constraints, validate_predictions,
)
from tests.test_solver import EASY, EASY_SOLUTION


def probs_for(grid, conf=0.95, alt=None):
    """(81, 10) prob array putting `conf` on the grid digit."""
    grid = np.asarray(grid).reshape(-1)
    probs = np.full((81, 10), (1 - conf) / 9)
    for i, d in enumerate(grid):
        probs[i, d] = conf
    if alt:
        for i, d, p in alt:
            probs[i] = (1 - conf - p) / 8
            probs[i, grid[i]] = conf
            probs[i, d] = p
    return probs


def test_validate_clean_grid():
    res = validate_predictions(EASY)
    assert res.is_valid
    assert res.n_filled == int((EASY != 0).sum())


def test_validate_detects_conflicts():
    g = EASY.copy()
    g[0, 2] = 5  # duplicates the 5 at (0,0) in row 0 and box 0
    res = validate_predictions(g)
    assert not res.is_valid
    types = {c.unit_type for c in res.conflicts}
    assert "row" in types and "box" in types
    assert (0, 0) in res.conflicted_cells and (0, 2) in res.conflicted_cells
    graph = get_conflict_graph(res)
    assert (0, 2) in graph[(0, 0)]


def test_rank_cells_prefers_low_confidence():
    g = EASY.copy()
    g[0, 2] = 5
    res = validate_predictions(g)
    conf = np.ones((9, 9))
    conf[0, 2] = 0.3  # the wrong cell is less confident
    ranked = rank_cells_by_conflict_involvement(res, conf)
    assert ranked[0] == (0, 2)


def test_possible_values():
    vals = get_possible_values(EASY, 0, 2)
    # row 0 has 5,3,7; col 2 has 8; box 0 has 5,3,6,9,8
    assert 5 not in vals and 3 not in vals and 8 not in vals
    assert EASY_SOLUTION[0, 2] in vals


def test_conflict_resolver_fixes_single_error():
    g = EASY.copy()
    wrong_rc = (0, 2)
    g[wrong_rc] = 5  # misread: should be 4 (solution digit) but cell empty
    # model is confident of 5 but has 0 as strong alternative? Use a digit
    # cell scenario: overwrite a real clue instead.
    g = EASY.copy()
    r, c = 2, 1  # clue 9 at (2,1)
    assert g[r, c] == 9
    g[r, c] = 8  # conflicts with the 8 at (3,0)? construct conflict:
    # (2,1)=8 duplicates (2,2)=8 in row 2 and box 0.
    probs = probs_for(g, conf=0.9)
    i = r * 9 + c
    probs[i] = 0.05 / 8
    probs[i, 8] = 0.55   # wrong digit the model chose
    probs[i, 9] = 0.40   # correct digit as strong alternative
    res = resolve_conflicts(g, probs)
    assert res.success
    assert res.grid[r, c] == 9
    assert ((r, c), 8, 9) in res.corrections
    assert validate_predictions(res.grid).is_valid


def test_conflict_resolver_noop_on_valid():
    probs = probs_for(EASY)
    res = resolve_conflicts(EASY, probs)
    assert res.success and not res.corrections


def test_constraint_propagation_solves_easy():
    """Naked+hidden singles alone solve the easy puzzle."""
    res = resolve_with_constraints(EASY, np.ones((9, 9)))
    assert res.success
    assert np.array_equal(res.grid, EASY_SOLUTION)
    assert len(res.assigned) == int((EASY == 0).sum())


def test_constraint_propagation_contradiction():
    g = np.zeros((9, 9), np.int32)
    g[0, :8] = range(1, 9)   # row 0 = 1..8
    g[1, 8] = 9              # 9 in box 2 -> (0,8) has no candidate
    res = resolve_with_constraints(g, np.ones((9, 9)))
    assert not res.success
    assert res.contradiction is not None


def test_try_value_speculative():
    from sudoku_vision_tpu.reasoning.constraint_resolver import ConstraintResolver

    r = ConstraintResolver(EASY, np.ones((9, 9)))
    base = r.propagate()
    assert base.success
    # Speculating the known-correct value keeps consistency.
    rr = ConstraintResolver(EASY, np.ones((9, 9)))
    spec = rr.try_value(0, 2, int(EASY_SOLUTION[0, 2]))
    assert spec.success
    # rr itself must be untouched by the speculation.
    assert rr.grid[0, 2] == 0


def test_resolve_with_solver_confidently_wrong():
    """Beam search can't fix alternatives below min_alt_prob; the
    solver-backed escalation blanks the conflicted cells and picks the
    most probable LEGAL joint reassignment (the handwritten 1-read-as-7
    class of failure, scene_033)."""
    import numpy as np

    from sudoku_vision_tpu.reasoning import (
        resolve_with_solver, validate_predictions,
    )
    from tests.test_solver import EASY

    grid = np.asarray(EASY).reshape(9, 9).copy()
    # Introduce a confidently-wrong duplicate: row 0 holds 5 at (0,0);
    # overwrite the empty (0,2) with another 5.
    assert grid[0, 0] == 5 and grid[0, 2] == 0
    grid[0, 2] = 5
    probs = np.zeros((81, 10), np.float32)
    for i, d in enumerate(grid.reshape(-1)):
        probs[i, d] = 0.93 if d else 1.0
    # True reading of (0, 2) is empty/unknown; give digit 4 a small
    # (sub-0.1) probability so only the escalation can surface it.
    probs[2, 5] = 0.93
    probs[2, 4] = 0.05
    res = resolve_with_solver(grid, probs)
    assert res.success
    assert validate_predictions(res.grid).is_valid
    # (0,0) keeps its 5; (0,2) was reassigned (4 is legal there) or
    # blanked — either way the grid is consistent and solvable.
    assert res.grid[0, 0] == 5
    assert res.grid[0, 2] != 5
    assert any(cell == (0, 2) for cell, _, _ in res.corrections)


def test_resolve_with_solver_valid_grid_untouched():
    import numpy as np

    from sudoku_vision_tpu.reasoning import resolve_with_solver
    from tests.test_solver import EASY

    grid = np.asarray(EASY).reshape(9, 9)
    probs = np.full((81, 10), 0.1, np.float32)
    res = resolve_with_solver(grid, probs)
    assert res.success and np.array_equal(res.grid, grid)
    assert res.corrections == []


def test_resolve_with_solver_too_many_suspects():
    import numpy as np

    from sudoku_vision_tpu.reasoning import resolve_with_solver

    grid = np.zeros((9, 9), np.int64)
    grid[0] = 5  # nine-way conflict: 9 suspects > max_suspects
    probs = np.full((81, 10), 0.1, np.float32)
    res = resolve_with_solver(grid, probs, max_suspects=6)
    assert not res.success


def test_resolve_unsolvable_certificate_repair():
    """A valid-but-unsolvable grid (confidently-wrong read with no unit
    conflict) is repaired via removal certificates: blank each filled
    cell, find which restore solvability, reassign by probability."""
    import numpy as np

    from sudoku_vision_tpu import solver as native_solver
    from sudoku_vision_tpu.reasoning import resolve_unsolvable
    from tests.test_solver import EASY, EASY_SOLUTION

    grid = np.asarray(EASY).reshape(9, 9).copy()
    sol = np.asarray(EASY_SOLUTION).reshape(9, 9)
    # Corrupt an empty cell with a digit that is legal per units but
    # contradicts the unique solution -> valid, unsolvable.
    target = None
    for r in range(9):
        for c in range(9):
            if grid[r, c]:
                continue
            for d in range(1, 10):
                if d == sol[r, c]:
                    continue
                test = grid.copy()
                test[r, c] = d
                from sudoku_vision_tpu.reasoning import validate_predictions
                if (validate_predictions(test).is_valid
                        and not native_solver.solve(test.copy()).solved):
                    target = (r, c, d)
                    break
            if target:
                break
        if target:
            break
    assert target, "no corruptible cell found"
    r, c, d = target
    grid[r, c] = d
    probs = np.zeros((81, 10), np.float32)
    for i, dd in enumerate(grid.reshape(-1)):
        probs[i, dd] = 0.9 if dd else 1.0
    probs[r * 9 + c, sol[r, c]] = 0.04  # truth far below the beam floor
    res = resolve_unsolvable(grid, probs)
    assert res.success
    assert native_solver.solve(res.grid.copy()).solved
    assert any(cell == (r, c) for cell, _, _ in res.corrections)


def test_resolve_unsolvable_passthrough():
    import numpy as np

    from sudoku_vision_tpu.reasoning import resolve_unsolvable
    from tests.test_solver import EASY

    grid = np.asarray(EASY).reshape(9, 9)
    probs = np.full((81, 10), 0.1, np.float32)
    res = resolve_unsolvable(grid, probs)
    assert res.success and np.array_equal(res.grid, grid)
    assert res.corrections == []
