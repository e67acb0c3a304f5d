"""Execute the shipped sudoku.wasm against the native solver oracle.

The reference proves its wasm solver in a real browser
(reference web/test-browser.mjs + solver/src/wasm_api.c). No JS engine
exists in this image, so these tests run the actual shipped artifact
(serve/static/sudoku.wasm, hand-assembled by native/solver/emit_wasm.py)
in the in-repo WebAssembly interpreter (utils/wasm_vm.py) and assert
its behavior cell-for-cell against libsudoku.so — the same
solve/validate/candidates contract the JS frontend consumes through
serve/static/sudoku.js's cwrap shim.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from sudoku_vision_tpu import solver
from sudoku_vision_tpu.utils import wasm_vm

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(
    REPO, "sudoku_vision_tpu", "serve", "static", "sudoku.wasm")
EMITTER = os.path.join(REPO, "native", "solver", "emit_wasm.py")


def parse(s: str) -> np.ndarray:
    out = np.array([0 if ch in "0." else int(ch) for ch in s], np.int32)
    return out.reshape(9, 9)


EASY = parse(
    "530070000600195000098000060800060003400803001700020006"
    "060000280000419005000080079")
HARD = parse(  # reference test_solver.c "Arto Inkala" tier analog
    "..53.....8......2..7..1.5..4....53...1..7...6..32...8.."
    "6.5....9..4....3......97..")
EVIL = parse(
    "8..........36......7..9.2...5...7.......457.....1...3..."
    "1....68..85...1..9....4..")
MINIMAL17 = parse(
    "000000010400000000020000000000050407008000300001090000"
    "300400200050100000000806000")
UNSOLVABLE = parse(
    "123456780000000900000000000000000000000000000000000000"
    "000000000000000000000000000")
INVALID_ROW = parse(
    "550070000600195000098000060800060003400803001700020006"
    "060000280000419005000080079")


@pytest.fixture(scope="module")
def vm():
    return wasm_vm.load(ARTIFACT)


def put(vm, grid: np.ndarray) -> None:
    vm.call("clear_grid")
    flat = grid.reshape(-1)
    for i in range(81):
        if flat[i]:
            vm.call("set_cell", i // 9, i % 9, int(flat[i]))


def read(vm) -> np.ndarray:
    return np.array([vm.call("get_cell", i // 9, i % 9)
                     for i in range(81)], np.int32).reshape(9, 9)


@pytest.mark.parametrize("puzzle", [EASY, HARD, EVIL, MINIMAL17],
                         ids=["easy", "hard", "evil", "minimal17"])
def test_solves_match_native(vm, puzzle):
    put(vm, puzzle)
    assert vm.call("is_valid") == 1
    assert vm.call("solve") == 1
    got = read(vm)
    want = solver.solve(puzzle)
    assert want.status == solver.SV_OK
    assert np.array_equal(got, want.grid)


def test_unsolvable_rc_and_grid_preserved(vm):
    put(vm, UNSOLVABLE)
    assert vm.call("is_valid") == 1           # no duplicate clue
    assert vm.call("solve") == 0              # reference wasm rc: 0
    assert np.array_equal(read(vm), UNSOLVABLE)  # sv_solve leaves it intact


def test_invalid_grid(vm):
    put(vm, INVALID_ROW)
    assert vm.call("is_valid") == 0
    assert vm.call("solve") == -1
    assert vm.call("cell_candidates", 0, 2) == 0  # wasm_api: invalid -> 0


def test_out_of_range_value_is_invalid(vm):
    put(vm, EASY)
    vm.call("set_cell", 4, 4, 12)             # set_cell stores any int;
    assert vm.call("is_valid") == 0           # validation rejects (init_state)
    assert vm.call("solve") == -1


def test_bounds_checks(vm):
    put(vm, EASY)
    assert vm.call("get_cell", 9, 0) == -1
    assert vm.call("get_cell", 0, -1) == -1
    vm.call("set_cell", -1, 5, 9)             # silently ignored
    vm.call("set_cell", 5, 9, 9)
    assert np.array_equal(read(vm), EASY)
    assert vm.call("cell_candidates", 9, 9) == 0


def test_candidates_match_native(vm):
    put(vm, EASY)
    want = solver.candidates(EASY)            # native sv_candidates
    for i in range(81):
        got = vm.call("cell_candidates", i // 9, i % 9)
        assert got == int(want.reshape(-1)[i]), f"cell {i}"


def test_empty_grid_solves(vm):
    vm.call("clear_grid")
    assert vm.call("is_valid") == 1
    assert vm.call("solve") == 1
    sol = read(vm)
    # independent check: each row/col/box is a permutation of 1..9
    want = set(range(1, 10))
    for k in range(9):
        assert set(sol[k, :]) == want
        assert set(sol[:, k]) == want
        r, c = 3 * (k // 3), 3 * (k % 3)
        assert set(sol[r:r + 3, c:c + 3].reshape(-1)) == want


def test_already_solved_grid(vm):
    want = solver.solve(EASY).grid
    put(vm, want)
    assert vm.call("solve") == 1
    assert np.array_equal(read(vm), want)


def test_artifact_reproducible(tmp_path):
    """Re-running the emitter reproduces the checked-in bytes — the
    `make -C native/solver wasm` build is deterministic without emcc."""
    rebuild = tmp_path / "sudoku_rebuild.wasm"
    out = subprocess.run(
        [sys.executable, EMITTER, str(rebuild)],
        capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    with open(ARTIFACT, "rb") as f:
        shipped = f.read()
    rebuilt = rebuild.read_bytes()
    assert shipped == rebuilt
    assert shipped[:8] == b"\x00asm\x01\x00\x00\x00"


def test_loader_shim_contract():
    """sudoku.js must define the SudokuSolver factory scanner.js expects
    and wrap every export scanner.js cwraps (executed-contract cousin of
    the js_subset scanner tests; the loader itself needs fetch/
    WebAssembly so it is contract-checked, not interpreted)."""
    path = os.path.join(REPO, "sudoku_vision_tpu", "serve", "static",
                        "sudoku.js")
    with open(path) as f:
        src = f.read()
    assert "var SudokuSolver = async function" in src
    assert "/sudoku.wasm" in src
    assert "cwrap" in src
    # every name scanner.js cwraps must be an export of the artifact
    vm = wasm_vm.load(ARTIFACT)
    for fn in ("set_cell", "get_cell", "clear_grid", "solve", "is_valid",
               "cell_candidates"):
        assert fn in vm.exports and vm.exports[fn][0] == "func"
    assert vm.exports["memory"][0] == "memory"


# ----------------------------------------------------- validator (negative)

def _module_with_body(body_bytes: bytes, n_results: int = 0) -> bytes:
    """Assemble a 1-function module: () -> i32*n_results, given raw body
    instruction bytes (validator negative-test harness)."""
    sys.path.insert(0, os.path.dirname(EMITTER))
    try:
        import emit_wasm as ew
    finally:
        sys.path.pop(0)
    ftype = b"\x60" + ew.vec([]) + ew.vec([bytes([ew.I32])] * n_results)
    code = ew.vec([]) + body_bytes + b"\x0B"
    return (b"\x00asm\x01\x00\x00\x00"
            + ew.section(1, ew.vec([ftype]))
            + ew.section(3, ew.vec([ew.uleb(0)]))
            + ew.section(5, ew.vec([b"\x00\x01"]))      # 1 page memory
            + ew.section(7, ew.vec([ew.name("f") + b"\x00" + ew.uleb(0)]))
            + ew.section(10, ew.vec([ew.uleb(len(code)) + code])))


@pytest.mark.parametrize("body,n_results,msg", [
    (b"\x6A", 0, "underflow"),                      # add on empty stack
    (b"\x41\x01\x0C\x05", 0, "br depth"),           # br 5: no such label
    (b"\x41\x01", 0, "arity"),                      # void fn leaves a value
    (b"", 1, "arity"),                              # i32 fn leaves nothing
    (b"\x41\x01\x21\x07", 0, "local index"),        # local.set 7: none exist
    (b"\x41\x01\x04\x7F\x41\x01\x0B", 1, "else"),   # if with result, no else
])
def test_validator_rejects_invalid_modules(body, n_results, msg):
    """Spec-invalid bodies must fail at load (WasmModule.__init__), not
    misexecute — this is what a browser's WebAssembly.instantiate would
    reject, so emitter regressions fail loudly without one."""
    blob = _module_with_body(body, n_results)
    with pytest.raises(ValueError, match=msg):
        wasm_vm.WasmModule(blob)


def test_oob_memory_access_traps():
    """Unsigned effective addresses: a 'negative' (high-bit) address must
    trap, not silently read the last bytes of memory (the artifact's own
    exports bounds-check row/col, so drive the VM with a raw body)."""
    # i32.const -4; i32.load; drop — old code read end-relative, new traps.
    blob = _module_with_body(b"\x41\x7C\x28\x02\x00\x1A", 0)
    m = wasm_vm.WasmModule(blob)
    with pytest.raises(IndexError):
        m.call("f")
    # in-range store/load still fine
    blob = _module_with_body(
        b"\x41\x08\x41\x07\x36\x02\x00"        # mem[8] = 7
        b"\x41\x08\x28\x02\x00\x1A", 0)        # load it back, drop
    wasm_vm.WasmModule(blob).call("f")
