"""Python interface to the native C++ sudoku solver.

Binds native/solver/build/libsudoku.so via ctypes (the environment has no
pybind11; ctypes keeps the dependency surface at zero). If the shared
library is missing it is built on first use with `make` when a toolchain is
available; otherwise a pure-Python solver with identical semantics serves
as fallback so the framework works everywhere.

Capability parity: reference solver/include/sudoku.h:24-50 (solve/validate/
file I/O/candidates) plus batch and solution-counting APIs the reference
lacks (needed by the TPU pipeline's host side, which drains frames in
batches).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np

SV_OK = 0
SV_INVALID = 1
SV_UNSOLVABLE = 2
SV_IOERROR = 3
SV_TIMEOUT = 4

STATUS_NAMES = {
    SV_OK: "solved",
    SV_INVALID: "invalid",
    SV_UNSOLVABLE: "unsolvable",
    SV_IOERROR: "io_error",
    SV_TIMEOUT: "timeout",
}

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SOLVER_DIR = os.path.join(_REPO_ROOT, "native", "solver")
_LIB_PATH = os.path.join(_SOLVER_DIR, "build", "libsudoku.so")

_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _try_load_library() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    def _build() -> bool:
        if not os.path.isdir(_SOLVER_DIR):
            return False
        try:
            subprocess.run(
                ["make", "lib"], cwd=_SOLVER_DIR, check=True,
                capture_output=True, timeout=120,
            )
            return True
        except (OSError, subprocess.SubprocessError):
            return False

    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    if not hasattr(lib, "sv_solve_deadline"):
        # Stale library from before the deadline API; rebuild in place.
        del lib
        if not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    u16p = ctypes.POINTER(ctypes.c_uint16)
    lib.sv_solve.argtypes = [i32p]
    lib.sv_solve.restype = ctypes.c_int
    lib.sv_solve_deadline.argtypes = [i32p, ctypes.c_double]
    lib.sv_solve_deadline.restype = ctypes.c_int
    lib.sv_validate.argtypes = [i32p]
    lib.sv_validate.restype = ctypes.c_int
    lib.sv_candidates.argtypes = [i32p, u16p]
    lib.sv_candidates.restype = ctypes.c_int
    lib.sv_count_solutions.argtypes = [i32p, ctypes.c_int]
    lib.sv_count_solutions.restype = ctypes.c_int
    lib.sv_solve_batch.argtypes = [i32p, ctypes.c_int, i32p]
    lib.sv_solve_batch.restype = ctypes.c_int
    _lib = lib
    return _lib


def native_available() -> bool:
    return _try_load_library() is not None


def _as_grid(grid) -> np.ndarray:
    g = np.ascontiguousarray(np.asarray(grid, dtype=np.int32)).reshape(-1)
    if g.size != 81:
        raise ValueError(f"grid must have 81 cells, got {g.size}")
    return g


# ---------------------------------------------------------------------------
# Pure-Python fallback (same algorithm family: bitmask MRV backtracking with
# naked/hidden-single propagation — semantics identical to the C++ core).
# ---------------------------------------------------------------------------

_ALL = 0x3FE


def _py_init(grid: np.ndarray):
    rows, cols, boxes = [0] * 9, [0] * 9, [0] * 9
    for i in range(81):
        d = int(grid[i])
        if d == 0:
            continue
        if d < 0 or d > 9:
            return None
        r, c = divmod(i, 9)
        b = (r // 3) * 3 + c // 3
        bit = 1 << d
        if (rows[r] | cols[c] | boxes[b]) & bit:
            return None
        rows[r] |= bit
        cols[c] |= bit
        boxes[b] |= bit
    return rows, cols, boxes


def _py_solve(grid: np.ndarray, timeout_s: float = 0.0) -> int:
    import time as _time

    st = _py_init(grid)
    if st is None:
        return SV_INVALID
    rows, cols, boxes = st
    cells = [i for i in range(81) if grid[i] == 0]
    deadline = _time.monotonic() + timeout_s if timeout_s > 0 else None
    timed_out = False

    def cands(i: int) -> int:
        r, c = divmod(i, 9)
        return ~(rows[r] | cols[c] | boxes[(r // 3) * 3 + c // 3]) & _ALL

    def dfs() -> bool:
        nonlocal timed_out
        if deadline is not None and _time.monotonic() >= deadline:
            timed_out = True
            return False
        # propagate naked singles
        placed = []
        progress = True
        while progress:
            progress = False
            for i in list(cells):
                m = cands(i)
                if m == 0:
                    for j in reversed(placed):
                        _unplace(j)
                    return False
                if m & (m - 1) == 0:
                    _place(i, m.bit_length() - 1)
                    placed.append(i)
                    progress = True
        if not cells:
            return True
        best = min(cells, key=lambda i: bin(cands(i)).count("1"))
        m = cands(best)
        d = 1
        while m:
            if m & 1 << d:
                m &= ~(1 << d)
                _place(best, d)
                if dfs():
                    return True
                _unplace(best)
            d += 1
        for j in reversed(placed):
            _unplace(j)
        return False

    def _place(i: int, d: int):
        r, c = divmod(i, 9)
        bit = 1 << d
        grid[i] = d
        rows[r] |= bit
        cols[c] |= bit
        boxes[(r // 3) * 3 + c // 3] |= bit
        cells.remove(i)

    def _unplace(i: int):
        r, c = divmod(i, 9)
        bit = 1 << int(grid[i])
        grid[i] = 0
        rows[r] &= ~bit
        cols[c] &= ~bit
        boxes[(r // 3) * 3 + c // 3] &= ~bit
        cells.append(i)

    if dfs():
        return SV_OK
    return SV_TIMEOUT if timed_out else SV_UNSOLVABLE


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


@dataclass
class SolveResult:
    status: int
    grid: np.ndarray  # (9, 9) int32 — solution if solved, else input

    @property
    def solved(self) -> bool:
        return self.status == SV_OK

    @property
    def status_name(self) -> str:
        return STATUS_NAMES.get(self.status, "unknown")


def solve(grid, timeout_s: Optional[float] = None) -> SolveResult:
    """Solve one 9x9 puzzle (0 = empty). Never mutates the input.

    timeout_s bounds the search wall-clock (reference run_v2.py:230 killed
    the solver subprocess at 5 s; here the deadline aborts inside the
    search and yields status "timeout").
    """
    g = _as_grid(grid).copy()
    lib = _try_load_library()
    deadline = float(timeout_s or 0.0)
    if lib is not None:
        st = lib.sv_solve_deadline(
            g.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), deadline)
    else:
        st = _py_solve(g, deadline)
    if st != SV_OK:
        g = _as_grid(grid).copy()
    return SolveResult(status=int(st), grid=g.reshape(9, 9))


def validate(grid) -> bool:
    """True iff the grid is within range and duplicate-free."""
    g = _as_grid(grid)
    lib = _try_load_library()
    if lib is not None:
        return lib.sv_validate(
            g.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))) == SV_OK
    return _py_init(g) is not None


def candidates(grid) -> np.ndarray:
    """(9, 9) uint16 bitmasks of legal digits (bit d set = digit d legal)."""
    g = _as_grid(grid)
    lib = _try_load_library()
    if lib is not None:
        out = np.zeros(81, dtype=np.uint16)
        lib.sv_candidates(
            g.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        )
        return out.reshape(9, 9)
    st = _py_init(g)
    rows, cols, boxes = st if st is not None else ([0] * 9, [0] * 9, [0] * 9)
    out = np.zeros(81, dtype=np.uint16)
    for i in range(81):
        d = int(g[i])
        r, c = divmod(i, 9)
        if 1 <= d <= 9:
            out[i] = 1 << d
        else:
            out[i] = ~(rows[r] | cols[c] | boxes[(r // 3) * 3 + c // 3]) & _ALL
    return out.reshape(9, 9)


def count_solutions(grid, limit: int = 2) -> int:
    """Number of completions, saturated at `limit`; -1 if invalid."""
    g = _as_grid(grid)
    lib = _try_load_library()
    if lib is not None:
        return lib.sv_count_solutions(
            g.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), limit)
    if _py_init(g) is None:
        return -1
    # Fallback: repeated solve is incorrect for counting; do a simple DFS.
    count = 0

    def dfs(gg: np.ndarray) -> None:
        nonlocal count
        if count >= limit:
            return
        empties = np.flatnonzero(gg == 0)
        if empties.size == 0:
            count += 1
            return
        st = _py_init(gg)
        if st is None:
            return
        rows, cols, boxes = st
        i = int(empties[0])
        r, c = divmod(i, 9)
        m = ~(rows[r] | cols[c] | boxes[(r // 3) * 3 + c // 3]) & _ALL
        for d in range(1, 10):
            if m & (1 << d):
                gg[i] = d
                dfs(gg)
                gg[i] = 0

    dfs(g.copy())
    return count


def solve_batch(grids: Sequence) -> list[SolveResult]:
    """Solve N puzzles; uses the native batch entry point when available."""
    arr = np.ascontiguousarray(np.asarray(grids, dtype=np.int32)).reshape(-1, 81)
    lib = _try_load_library()
    if lib is not None:
        work = arr.copy()
        statuses = np.zeros(len(work), dtype=np.int32)
        lib.sv_solve_batch(
            work.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(work),
            statuses.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return [
            SolveResult(
                status=int(st),
                grid=(work[i] if st == SV_OK else arr[i]).reshape(9, 9),
            )
            for i, st in enumerate(statuses)
        ]
    return [solve(arr[i]) for i in range(len(arr))]
