"""Tests for the Python solver binding (native + pure-Python fallback).

Mirrors the fixture coverage of the reference C test suite
(reference solver/tests/test_solver.c — easy/hard/evil/invalid/unsolvable/
empty/solved fixtures, independent verification) at the Python layer.
"""

import numpy as np
import pytest

from sudoku_vision_tpu import solver


def parse(s: str) -> np.ndarray:
    out = np.array([0 if ch in "0." else int(ch) for ch in s], dtype=np.int32)
    assert out.size == 81
    return out.reshape(9, 9)


EASY = parse(
    "530070000600195000098000060800060003400803001700020006"
    "060000280000419005000080079"
)
EASY_SOLUTION = parse(
    "534678912672195348198342567859761423426853791713924856"
    "961537284287419635345286179"
)
EVIL = parse(
    "8..........36......7..9.2...5...7.......457.....1...3..."
    "1....68..85...1..9....4.."
)
UNSOLVABLE = parse(
    "123456780000000900000000000000000000000000000000000000"
    "000000000000000000000000000"
)


def verify_solution(sol: np.ndarray, clues: np.ndarray) -> bool:
    sol = sol.reshape(9, 9)
    clues = clues.reshape(9, 9)
    if not np.all((sol >= 1) & (sol <= 9)):
        return False
    if not np.all((clues == 0) | (clues == sol)):
        return False
    want = set(range(1, 10))
    for i in range(9):
        if set(sol[i]) != want or set(sol[:, i]) != want:
            return False
        box = sol[3 * (i // 3):3 * (i // 3) + 3, 3 * (i % 3):3 * (i % 3) + 3]
        if set(box.ravel()) != want:
            return False
    return True


def test_native_library_loads():
    assert solver.native_available(), "native libsudoku.so should build/load"


def test_solve_easy_matches_known_solution():
    res = solver.solve(EASY)
    assert res.solved
    assert np.array_equal(res.grid, EASY_SOLUTION)


def test_solve_does_not_mutate_input():
    before = EASY.copy()
    solver.solve(EASY)
    assert np.array_equal(EASY, before)


def test_solve_evil():
    res = solver.solve(EVIL)
    assert res.solved
    assert verify_solution(res.grid, EVIL)


def test_solve_empty_grid():
    res = solver.solve(np.zeros((9, 9), dtype=np.int32))
    assert res.solved
    assert verify_solution(res.grid, np.zeros((9, 9), dtype=np.int32))


def test_invalid_duplicate():
    g = np.zeros((9, 9), dtype=np.int32)
    g[0, 0] = 5
    g[0, 4] = 5
    res = solver.solve(g)
    assert res.status == solver.SV_INVALID
    assert not solver.validate(g)


def test_out_of_range():
    g = np.zeros((9, 9), dtype=np.int32)
    g[4, 4] = 12
    assert solver.solve(g).status == solver.SV_INVALID


def test_unsolvable():
    res = solver.solve(UNSOLVABLE)
    assert res.status == solver.SV_UNSOLVABLE
    assert solver.validate(UNSOLVABLE)  # valid clues, just no completion


def test_candidates_masks():
    cands = solver.candidates(np.zeros((9, 9), dtype=np.int32))
    assert cands.shape == (9, 9)
    assert np.all(cands == 0x3FE)
    cands = solver.candidates(EASY)
    assert cands[0, 0] == 1 << 5  # filled cell → singleton mask
    # row 0 contains 5,3,7 → excluded from (0,2)'s mask
    for d in (5, 3, 7):
        assert not (int(cands[0, 2]) >> d) & 1


def test_count_solutions():
    assert solver.count_solutions(EASY, limit=2) == 1
    assert solver.count_solutions(UNSOLVABLE, limit=2) == 0
    assert solver.count_solutions(np.zeros((9, 9), np.int32), limit=3) == 3


def test_solve_batch():
    results = solver.solve_batch([EASY, UNSOLVABLE, EVIL])
    assert [r.status for r in results] == [
        solver.SV_OK, solver.SV_UNSOLVABLE, solver.SV_OK]
    assert np.array_equal(results[0].grid, EASY_SOLUTION)
    assert np.array_equal(results[1].grid, UNSOLVABLE)  # unchanged on failure


def test_python_fallback_matches_native():
    g = EASY.reshape(-1).copy()
    st = solver._py_solve(g)
    assert st == solver.SV_OK
    assert np.array_equal(g.reshape(9, 9), EASY_SOLUTION)
    g2 = UNSOLVABLE.reshape(-1).copy()
    assert solver._py_solve(g2) == solver.SV_UNSOLVABLE


@pytest.mark.parametrize("puzzle,expected", [
    ("easy", solver.SV_OK),
])
def test_status_names(puzzle, expected):
    res = solver.solve(EASY)
    assert res.status_name == "solved"


def test_solve_with_timeout_generous():
    """A generous deadline must not change results (run_v2 passes 5 s)."""
    res = solver.solve(EASY, timeout_s=30.0)
    assert res.solved and np.array_equal(res.grid, EASY_SOLUTION)


def test_python_fallback_timeout():
    """The pure-Python fallback honors the deadline on a search-heavy grid."""
    g = np.zeros(81, np.int64)  # empty grid: maximal branching
    st = solver._py_solve(g, timeout_s=1e-9)
    # Either it timed out, or (implausibly) solved before the first check.
    assert st in (solver.SV_TIMEOUT, solver.SV_OK)
    assert st == solver.SV_TIMEOUT  # deadline checked at every dfs entry


def test_timeout_status_name():
    assert solver.STATUS_NAMES[solver.SV_TIMEOUT] == "timeout"
