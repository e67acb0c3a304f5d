"""Uniqueness gate: erased givens are restored or surfaced, never
silently coin-flipped.

Found by the round-4 fresh-seed sweep (seed base 90210,
s077_low_light): a low-contrast printed digit was claimed by the empty
mask, the weakened puzzle still SOLVED — to one of its now-multiple
solutions — and the pipeline reported it at "confidence 1.0". A proper
sudoku has exactly one solution, so `count_solutions > 1` on a solvable
recognized grid is a fingerprint of an upstream erasure; the reference
never checks (its solver returns the first solution found,
reference solver/src/sudoku.c:72).

Layers covered here: the restoration primitive
(reasoning.restore_erased_givens), and the shared serving solve path
(serve.server.InferenceEngine.reason_and_solve) which carries the same
gate as pipeline/run_v2.py's (run_v2's wiring is exercised by the TPU
sweeps and the daily CPU sweep in test_sweep_ci.py).
"""

import numpy as np
import pytest

from sudoku_vision_tpu import solver as native_solver
from sudoku_vision_tpu.reasoning import restore_erased_givens

PUZZLE = ("530070000600195000098000060800060003400803001"
          "700020006060000280000419005000080079")
SOLUTION = ("534678912672195348198342567859761423426853791"
            "713924856961537284287419635345286179")


def parse(s):
    return np.array([int(c) for c in s], np.int64).reshape(9, 9)


@pytest.fixture(scope="module")
def erased():
    """The puzzle with one given removed such that it stops being
    unique, plus the removed (cell, digit)."""
    grid = parse(PUZZLE)
    assert native_solver.count_solutions(grid, 2) == 1
    for idx in np.flatnonzero(grid.reshape(-1)):
        g = grid.copy()
        r, c = divmod(int(idx), 9)
        d = int(g[r, c])
        g[r, c] = 0
        if native_solver.count_solutions(g, 2) > 1:
            return g, (r, c), d
    raise AssertionError("no removable given breaks uniqueness")


def probs_for(grid, extra=None):
    """Near-one-hot (81, 10) distribution matching a digits grid;
    `extra` overrides {flat_index: (digit, p)}."""
    p = np.full((81, 10), 1e-4)
    flat = np.asarray(grid).reshape(-1)
    for i in range(81):
        p[i, int(flat[i])] = 0.99
    for i, (d, pv) in (extra or {}).items():
        p[i] = 1e-4
        p[i, d] = pv
        p[i, 0] = 1.0 - pv
    return p / p.sum(1, keepdims=True)


def test_restores_erased_given_from_cnn_evidence(erased):
    g, (r, c), d = erased
    # the CNN still saw the digit; only the mask erased it
    probs = probs_for(g, extra={r * 9 + c: (d, 0.95)})
    res = restore_erased_givens(g, probs)
    assert res.success
    assert res.corrections == [((r, c), 0, d)]
    assert native_solver.count_solutions(res.grid, 2) == 1
    sres = native_solver.solve(res.grid)
    assert sres.solved
    assert "".join(map(str, sres.grid.reshape(-1))) == SOLUTION


def test_no_evidence_means_ambiguous(erased):
    g, (r, c), d = erased
    probs = probs_for(g)          # erased cell reads confidently EMPTY
    res = restore_erased_givens(g, probs)
    assert not res.success
    assert res.corrections == []


def test_unique_puzzle_untouched():
    g = parse(PUZZLE)
    res = restore_erased_givens(g, probs_for(g))
    assert res.success and res.corrections == []
    assert np.array_equal(res.grid, g)


def test_restoration_never_invents_invalid_digits(erased):
    """Evidence pointing at a digit that conflicts with the row is
    skipped (validity guard), leaving the ambiguity surfaced."""
    g, (r, c), d = erased
    row_digits = set(int(x) for x in g[r] if x) | {d}
    bad = next(x for x in range(1, 10) if x in row_digits and x != d)
    probs = probs_for(g, extra={r * 9 + c: (bad, 0.97)})
    res = restore_erased_givens(g, probs)
    assert not res.success
    assert res.corrections == []


def test_budget_not_wasted_on_noop_restorations(erased):
    """Advisor regression (round-4 ADVICE #2): a candidate whose digit
    is common to ALL remaining solutions is valid + solvable yet
    narrows nothing; it must be skipped (not committed) so the budget
    reaches the actually-erased given."""
    g, (r, c), d = erased
    sol = native_solver.solve(g).grid.reshape(-1)
    # find an empty cell whose solved digit does NOT narrow the count
    noop = None
    for idx in np.flatnonzero(g.reshape(-1) == 0):
        if (int(idx) // 9, int(idx) % 9) == (r, c):
            continue
        t = g.copy()
        t[idx // 9, idx % 9] = int(sol[idx])
        if native_solver.count_solutions(t, 2) > 1:
            noop = (int(idx), int(sol[idx]))
            break
    assert noop is not None
    # no-op candidate outranks the real erased given in confidence
    probs = probs_for(g, extra={noop[0]: (noop[1], 0.97),
                                r * 9 + c: (d, 0.8)})
    res = restore_erased_givens(g, probs, limit=1)
    assert res.success
    assert res.corrections == [((r, c), 0, d)]


def test_reason_and_solve_restores_and_flags(erased):
    from sudoku_vision_tpu.serve.server import InferenceEngine

    g, (r, c), d = erased
    # with evidence: restored + solved to the true solution
    out = InferenceEngine.reason_and_solve(
        g.copy(), probs_for(g, extra={r * 9 + c: (d, 0.95)}))
    assert out["status"] == "solved"
    assert out["corrected"] is True
    assert out["solution"] == SOLUTION
    # without evidence: honest "ambiguous" — the coin-flip grid is
    # withheld from "solution" (advisor finding: it rendered exactly
    # like a real answer) and shipped tentatively instead
    out = InferenceEngine.reason_and_solve(g.copy(), probs_for(g))
    assert out["status"] == "ambiguous"
    assert out["solution"] is None
    assert out["tentative_solution"] is not None
    assert len(out["tentative_solution"]) == 81


def test_sweep_classifies_ambiguous_as_honest():
    from sudoku_vision_tpu.harness.scene_sweep import HONEST

    assert "ambiguous" in HONEST
