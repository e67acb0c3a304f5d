/* wasm_api.cpp — browser-facing WASM exports of the native solver.
 *
 * Capability parity with the reference's emscripten surface (reference
 * solver/src/wasm_api.c: set_cell / get_cell / clear_grid / solve /
 * is_valid over a static grid), re-expressed over this repo's
 * bitmask-table solver API (sv_solve / sv_validate, include/sudoku.h).
 *
 * Build (gated on emcc being installed — it is not in the CI image):
 *     make -C native/solver wasm
 * which emits sudoku.js + sudoku.wasm next to the web assets
 * (serve/static), MODULARIZE'd as `SudokuSolver` so the scanner page
 * can solve locally when the HTTP endpoint is unreachable.
 *
 * The same translation unit also compiles with plain g++ (the
 * EMSCRIPTEN_KEEPALIVE markers no-op outside emscripten), so the JS
 * contract is exercised by the native test suite
 * (tests/test_solver.cpp: wasm_api section) even though this image
 * cannot run the wasm artifact itself.
 */
#include "../include/sudoku.h"

#ifdef __EMSCRIPTEN__
#include <emscripten/emscripten.h>
#define SV_EXPORT EMSCRIPTEN_KEEPALIVE
#else
#define SV_EXPORT
#endif

/* Grid storage for the JS interface (reference wasm_api.c:5). */
static int32_t wasm_grid[81];

extern "C" {

/* Set a cell value (JS builds the puzzle cell by cell). */
SV_EXPORT void set_cell(int row, int col, int value) {
  if (row >= 0 && row < 9 && col >= 0 && col < 9)
    wasm_grid[row * 9 + col] = value;
}

/* Read a cell (JS reads the solution back). -1 on out-of-range. */
SV_EXPORT int get_cell(int row, int col) {
  if (row >= 0 && row < 9 && col >= 0 && col < 9)
    return (int)wasm_grid[row * 9 + col];
  return -1;
}

SV_EXPORT void clear_grid(void) {
  for (int i = 0; i < 81; i++) wasm_grid[i] = 0;
}

/* Solve the stored grid in place. Same JS-facing contract as the
 * reference (1 solved / 0 no solution / -1 invalid input): the richer
 * SV_* statuses fold down so existing frontend glue ports unchanged. */
SV_EXPORT int solve(void) {
  int rc = sv_solve(wasm_grid);
  if (rc == SV_OK) return 1;
  if (rc == SV_UNSOLVABLE) return 0;
  return -1;
}

/* 1 if the stored grid violates no constraint, else 0. */
SV_EXPORT int is_valid(void) {
  return sv_validate(wasm_grid) == SV_OK ? 1 : 0;
}

/* Candidate bitmask for a cell (bit d set iff digit d legal) — goes
 * beyond the reference surface so the manual-correction UI can offer
 * legal digits without a server round-trip. 0 on invalid grid/index. */
SV_EXPORT int cell_candidates(int row, int col) {
  if (row < 0 || row >= 9 || col < 0 || col >= 9) return 0;
  uint16_t cands[81];
  if (sv_candidates(wasm_grid, cands) != SV_OK &&
      sv_validate(wasm_grid) != SV_OK)
    return 0;
  return (int)cands[row * 9 + col];
}

} /* extern "C" */
