/* sudoku.h — public C API of the TPU-sudoku-vision native solver.
 *
 * Capability parity with the reference solver API (reference:
 * solver/include/sudoku.h:24-50 — solve_sudoku / validate_grid /
 * load_from_file / save_to_file / candidate helpers), re-designed:
 * the search state is three 9-entry bitmask tables (rows/cols/boxes)
 * maintained incrementally, instead of an 81-cell candidate grid
 * memcpy'd per branch (reference solver/src/sudoku.c:42-44).
 *
 * Grid encoding: int32 grid[81], row-major, 0 = empty, 1..9 = digit.
 */
#ifndef SV_SUDOKU_H
#define SV_SUDOKU_H

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

/* Status codes (mirror the reference's SOLVE_SUCCESS/INVALID/NOSOLUTION
 * contract, reference solver/include/sudoku.h:13-15). */
enum {
  SV_OK = 0,          /* solved / valid */
  SV_INVALID = 1,     /* grid violates sudoku rules or has out-of-range cells */
  SV_UNSOLVABLE = 2,  /* valid clues but no completion exists */
  SV_IOERROR = 3,     /* file I/O failure */
  SV_TIMEOUT = 4      /* deadline expired before the search finished */
};

/* Solve in place. Returns SV_OK and fills grid with the solution,
 * or SV_INVALID / SV_UNSOLVABLE (grid left in input state on failure). */
int sv_solve(int32_t grid[81]);

/* Solve in place with a wall-clock deadline (reference run_v2.py:230 uses
 * a 5 s subprocess timeout; here the abort happens inside the search, so
 * the grid is left in input state and SV_TIMEOUT returned instead of the
 * caller killing a process). timeout_s <= 0 means no deadline. */
int sv_solve_deadline(int32_t grid[81], double timeout_s);

/* Validate clues only (range + row/col/box duplicates). SV_OK or SV_INVALID. */
int sv_validate(const int32_t grid[81]);

/* Candidate bitmask per cell: bit d (1..9) set iff digit d is legal.
 * Filled cells get the singleton mask of their digit. Returns SV_OK,
 * or SV_INVALID (cands still filled; conflicting cells get mask 0). */
int sv_candidates(const int32_t grid[81], uint16_t cands[81]);

/* Count completions up to `limit` (e.g. limit=2 for uniqueness checks).
 * Returns the count (saturated at limit), or -1 if the grid is invalid. */
int sv_count_solutions(const int32_t grid[81], int limit);

/* Solve `n` independent grids stored contiguously (n*81 int32).
 * statuses[i] receives the per-grid status. Returns number solved. */
int sv_solve_batch(int32_t* grids, int n, int32_t* statuses);

/* 81-character file format: digits, '0' or '.' for empty; whitespace
 * ignored (same on-disk contract as reference load_from_file,
 * solver/src/sudoku.c:476). */
int sv_load_file(const char* path, int32_t grid[81]);
int sv_save_file(const char* path, const int32_t grid[81]);

/* Human-readable grid with box separators, written into buf (>= 512 bytes). */
void sv_format_grid(const int32_t grid[81], char* buf, int buflen);

#ifdef __cplusplus
}
#endif

#endif /* SV_SUDOKU_H */
