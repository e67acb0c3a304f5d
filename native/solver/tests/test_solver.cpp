// test_solver.cpp — unit tests for the native solver.
//
// Mirrors the coverage of the reference suite (reference
// solver/tests/test_solver.c: fixtures for easy/hard/evil/17-clue/
// one-empty/invalid-row/col/box/out-of-range/valid-but-unsolvable/
// empty/already-solved, an independent solution verifier, and
// performance limits hard<100ms evil<1000ms), with extra tests for the
// new batch + count_solutions APIs.

#include <chrono>
#include <cstdio>
#include <cstring>

#include "sudoku.h"

// wasm_api.cpp exports (plain C symbols; EMSCRIPTEN_KEEPALIVE no-ops
// outside emscripten so the JS contract is testable natively).
extern "C" {
void set_cell(int row, int col, int value);
int get_cell(int row, int col);
void clear_grid(void);
int solve(void);
int is_valid(void);
int cell_candidates(int row, int col);
}

static int g_tests = 0, g_failures = 0;

#define CHECK(name, cond)                                         \
  do {                                                            \
    ++g_tests;                                                    \
    if (!(cond)) {                                                \
      ++g_failures;                                               \
      std::printf("FAIL %s (%s:%d)\n", name, __FILE__, __LINE__); \
    }                                                             \
  } while (0)

namespace {

void parse81(const char* s, int32_t grid[81]) {
  int n = 0;
  for (const char* p = s; *p && n < 81; ++p) {
    if (*p >= '0' && *p <= '9') grid[n++] = *p - '0';
    else if (*p == '.') grid[n++] = 0;
  }
}

// ---- Fixtures (classic public puzzles) ----

// Wikipedia's example puzzle and its unique solution.
const char* kEasy =
    "530070000600195000098000060800060003400803001700020006060000280000419005"
    "000080079";
const char* kEasySolution =
    "534678912672195348198342567859761423426853791713924856961537284287419635"
    "345286179";

const char* kHard =  // AI Escargot-class
    "1....7.9..3..2...8..96..5....53..9...1..8...26....4...3......1..4......7"
    "..7...3..";

const char* kEvil =  // Arto Inkala's puzzle
    "8..........36......7..9.2...5...7.......457.....1...3...1....68..85...1."
    ".9....4..";

// A 17-clue minimal puzzle (Royle collection).
const char* kSeventeen =
    "000000010400000000020000000000050407008000300001090000300400200050100000"
    "000806000";

// Valid clues (no duplicates) but provably unsolvable: row 0 holds 1..8,
// so (0,8) must be 9, yet 9 already sits elsewhere in box 2 at (1,6).
const char* kUnsolvable =
    "123456780000000900000000000000000000000000000000000000000000000000000000"
    "000000000";

// Independent verifier: complete grid, all units are permutations of 1..9,
// and solution respects the original clues.
bool verify_solution(const int32_t sol[81], const int32_t clues[81]) {
  for (int i = 0; i < 81; ++i) {
    if (sol[i] < 1 || sol[i] > 9) return false;
    if (clues[i] != 0 && clues[i] != sol[i]) return false;
  }
  for (int u = 0; u < 27; ++u) {
    int seen = 0;
    for (int k = 0; k < 9; ++k) {
      int r, c;
      if (u < 9) { r = u; c = k; }
      else if (u < 18) { r = k; c = u - 9; }
      else { int b = u - 18; r = (b / 3) * 3 + k / 3; c = (b % 3) * 3 + k % 3; }
      seen |= 1 << sol[r * 9 + c];
    }
    if (seen != 0x3FE) return false;
  }
  return true;
}

double solve_ms(const char* puzzle, int* status) {
  int32_t g[81];
  parse81(puzzle, g);
  auto t0 = std::chrono::steady_clock::now();
  *status = sv_solve(g);
  auto t1 = std::chrono::steady_clock::now();
  return std::chrono::duration_cast<std::chrono::nanoseconds>(t1 - t0).count() /
         1e6;
}

// ---- Validation tests ----

void test_validate() {
  int32_t g[81];

  parse81(kEasy, g);
  CHECK("validate easy ok", sv_validate(g) == SV_OK);

  std::memset(g, 0, sizeof(g));
  CHECK("validate empty ok", sv_validate(g) == SV_OK);

  // Row duplicate.
  std::memset(g, 0, sizeof(g));
  g[0] = 5; g[4] = 5;
  CHECK("validate row dup", sv_validate(g) == SV_INVALID);

  // Column duplicate.
  std::memset(g, 0, sizeof(g));
  g[0 * 9 + 2] = 7; g[6 * 9 + 2] = 7;
  CHECK("validate col dup", sv_validate(g) == SV_INVALID);

  // Box duplicate (different row and column, same 3x3 box).
  std::memset(g, 0, sizeof(g));
  g[0 * 9 + 0] = 3; g[1 * 9 + 1] = 3;
  CHECK("validate box dup", sv_validate(g) == SV_INVALID);

  // Out of range.
  std::memset(g, 0, sizeof(g));
  g[40] = 12;
  CHECK("validate out of range high", sv_validate(g) == SV_INVALID);
  g[40] = -1;
  CHECK("validate out of range low", sv_validate(g) == SV_INVALID);

  // Unsolvable-but-valid passes validation (it only checks duplicates).
  parse81(kUnsolvable, g);
  CHECK("validate unsolvable is valid", sv_validate(g) == SV_OK);
}

// ---- Solving tests ----

void test_solve_easy() {
  int32_t g[81], clues[81], expect[81];
  parse81(kEasy, g);
  std::memcpy(clues, g, sizeof(g));
  parse81(kEasySolution, expect);
  CHECK("solve easy status", sv_solve(g) == SV_OK);
  CHECK("solve easy verified", verify_solution(g, clues));
  CHECK("solve easy matches known solution",
        std::memcmp(g, expect, sizeof(g)) == 0);
}

void test_solve_hard_evil_17() {
  const char* puzzles[] = {kHard, kEvil, kSeventeen};
  const char* names[] = {"hard", "evil", "17-clue"};
  for (int i = 0; i < 3; ++i) {
    int32_t g[81], clues[81];
    parse81(puzzles[i], g);
    std::memcpy(clues, g, sizeof(g));
    char buf[64];
    std::snprintf(buf, sizeof(buf), "solve %s status", names[i]);
    CHECK(buf, sv_solve(g) == SV_OK);
    std::snprintf(buf, sizeof(buf), "solve %s verified", names[i]);
    CHECK(buf, verify_solution(g, clues));
  }
}

void test_solve_one_empty() {
  int32_t g[81], clues[81];
  parse81(kEasySolution, g);
  g[40] = 0;  // knock out the centre cell
  std::memcpy(clues, g, sizeof(g));
  CHECK("one-empty status", sv_solve(g) == SV_OK);
  CHECK("one-empty restored", g[40] == 5 && verify_solution(g, clues));
}

void test_solve_already_solved() {
  int32_t g[81], expect[81];
  parse81(kEasySolution, g);
  parse81(kEasySolution, expect);
  CHECK("already-solved status", sv_solve(g) == SV_OK);
  CHECK("already-solved unchanged", std::memcmp(g, expect, sizeof(g)) == 0);
}

void test_solve_empty_grid() {
  int32_t g[81] = {0};
  int32_t clues[81] = {0};
  CHECK("empty grid status", sv_solve(g) == SV_OK);
  CHECK("empty grid verified", verify_solution(g, clues));
}

void test_solve_invalid_and_unsolvable() {
  int32_t g[81] = {0};
  g[0] = 5; g[1] = 5;
  int32_t before[81];
  std::memcpy(before, g, sizeof(g));
  CHECK("solve invalid status", sv_solve(g) == SV_INVALID);
  CHECK("solve invalid untouched", std::memcmp(g, before, sizeof(g)) == 0);

  parse81(kUnsolvable, g);
  std::memcpy(before, g, sizeof(g));
  CHECK("solve unsolvable status", sv_solve(g) == SV_UNSOLVABLE);
  CHECK("solve unsolvable untouched", std::memcmp(g, before, sizeof(g)) == 0);
}

// ---- Helper API tests ----

void test_candidates() {
  int32_t g[81] = {0};
  uint16_t cands[81];
  CHECK("candidates empty status", sv_candidates(g, cands) == SV_OK);
  CHECK("candidates empty full mask", cands[0] == 0x3FE);

  parse81(kEasy, g);
  CHECK("candidates easy status", sv_candidates(g, cands) == SV_OK);
  // Filled cell → singleton mask of its digit (g[0]=5).
  CHECK("candidates filled singleton", cands[0] == (1u << 5));
  // (0,2) peers: row0 {5,3,7}, col2 {8,9?}… just check mask excludes row digits.
  CHECK("candidates exclude peers", (cands[2] & (1u << 5)) == 0 &&
                                        (cands[2] & (1u << 3)) == 0 &&
                                        (cands[2] & (1u << 7)) == 0);
}

void test_count_solutions() {
  int32_t g[81];
  parse81(kEasy, g);
  CHECK("count easy unique", sv_count_solutions(g, 2) == 1);
  parse81(kUnsolvable, g);
  CHECK("count unsolvable zero", sv_count_solutions(g, 2) == 0);
  std::memset(g, 0, sizeof(g));
  CHECK("count empty many", sv_count_solutions(g, 5) == 5);
  g[0] = 5; g[1] = 5;
  CHECK("count invalid -1", sv_count_solutions(g, 2) == -1);
}

void test_batch() {
  int32_t grids[3 * 81];
  int32_t statuses[3];
  parse81(kEasy, grids);
  parse81(kUnsolvable, grids + 81);
  parse81(kHard, grids + 162);
  CHECK("batch solved count", sv_solve_batch(grids, 3, statuses) == 2);
  CHECK("batch statuses", statuses[0] == SV_OK &&
                              statuses[1] == SV_UNSOLVABLE &&
                              statuses[2] == SV_OK);
  int32_t clues[81];
  parse81(kHard, clues);
  CHECK("batch third verified", verify_solution(grids + 162, clues));
}

void test_deadline() {
  int32_t g[81], before[81];
  // Generous deadline: solves normally.
  parse81(kEvil, g);
  parse81(kEvil, before);
  int32_t clues[81];
  parse81(kEvil, clues);
  CHECK("deadline generous solves", sv_solve_deadline(g, 30.0) == SV_OK);
  CHECK("deadline generous verified", verify_solution(g, clues));
  // Zero/negative deadline means "no deadline".
  parse81(kEasy, g);
  CHECK("deadline zero = unlimited", sv_solve_deadline(g, 0.0) == SV_OK);
  // Impossibly tight deadline on a search-heavy grid: SV_TIMEOUT, grid
  // untouched. (The deadline is sampled every 4096 nodes, so a puzzle
  // must branch enough to hit the first check; the evil tier does.)
  parse81(kEvil, g);
  int st = sv_solve_deadline(g, 1e-9);
  if (st == SV_TIMEOUT) {
    CHECK("deadline timeout status", st == SV_TIMEOUT);
    CHECK("deadline leaves input grid",
          std::memcmp(g, before, sizeof(g)) == 0);
  } else {
    // Solver beat the first clock check — acceptable on very fast hosts.
    CHECK("deadline fast-solve fallback", st == SV_OK);
    CHECK("deadline fast-solve verified", verify_solution(g, before));
  }
}

// ---- Performance tests (limits mirror reference test_solver.c:471,:494) ----

void test_performance() {
  int st;
  double hard_ms = solve_ms(kHard, &st);
  CHECK("perf hard solved", st == SV_OK);
  CHECK("perf hard <100ms", hard_ms < 100.0);
  double evil_ms = solve_ms(kEvil, &st);
  CHECK("perf evil solved", st == SV_OK);
  CHECK("perf evil <1000ms", evil_ms < 1000.0);
  std::printf("  perf: hard %.3f ms, evil %.3f ms\n", hard_ms, evil_ms);
}

// ---- File I/O round trip ----

void test_file_io() {
  const char* path = "/tmp/sv_test_grid.txt";
  int32_t g[81], g2[81];
  parse81(kEasy, g);
  CHECK("save file", sv_save_file(path, g) == SV_OK);
  CHECK("load file", sv_load_file(path, g2) == SV_OK);
  CHECK("file round trip", std::memcmp(g, g2, sizeof(g)) == 0);
  CHECK("load missing file", sv_load_file("/tmp/sv_nonexistent.txt", g2) ==
                                 SV_IOERROR);
  std::remove(path);
}

void test_wasm_api() {
  // The browser-facing surface (src/wasm_api.cpp): build the easy
  // puzzle cell by cell, solve, read back — the exact call sequence
  // the scanner page's JS glue makes (reference solver/src/wasm_api.c).
  int32_t g[81], want[81];
  parse81(kEasy, g);
  parse81(kEasySolution, want);
  clear_grid();
  CHECK("wasm cleared", get_cell(4, 4) == 0);
  for (int r = 0; r < 9; ++r)
    for (int c = 0; c < 9; ++c) set_cell(r, c, g[r * 9 + c]);
  CHECK("wasm is_valid", is_valid() == 1);
  CHECK("wasm solve rc", solve() == 1);
  for (int r = 0; r < 9; ++r)
    for (int c = 0; c < 9; ++c)
      if (get_cell(r, c) != want[r * 9 + c]) {
        CHECK("wasm solution cell", false);
        r = c = 9;
      }
  // Out-of-range reads/writes are rejected, not UB.
  CHECK("wasm oob read", get_cell(9, 0) == -1);
  set_cell(-1, 0, 5);
  // Invalid grid (duplicate in row) -> is_valid 0, solve -1.
  clear_grid();
  set_cell(0, 0, 5);
  set_cell(0, 1, 5);
  CHECK("wasm invalid", is_valid() == 0);
  CHECK("wasm solve invalid", solve() == -1);
  // Candidates: empty row with a 5 at (0,0) -> (0,2) cannot be 5.
  clear_grid();
  set_cell(0, 0, 5);
  int m = cell_candidates(0, 2);
  CHECK("wasm cands exclude", (m & (1 << 5)) == 0);
  CHECK("wasm cands include", (m & (1 << 6)) != 0);
}

void test_format() {
  int32_t g[81];
  parse81(kEasy, g);
  char buf[512];
  sv_format_grid(g, buf, sizeof(buf));
  CHECK("format nonempty", std::strlen(buf) > 100);
  CHECK("format has separators", std::strstr(buf, "+-------+") != nullptr);
}

}  // namespace

int main() {
  test_validate();
  test_solve_easy();
  test_solve_hard_evil_17();
  test_solve_one_empty();
  test_solve_already_solved();
  test_solve_empty_grid();
  test_solve_invalid_and_unsolvable();
  test_candidates();
  test_count_solutions();
  test_batch();
  test_deadline();
  test_performance();
  test_file_io();
  test_format();
  test_wasm_api();

  std::printf("%d tests, %d failures\n", g_tests, g_failures);
  return g_failures == 0 ? 0 : 1;
}
