// sudoku.cpp — bitmask constraint-propagation + MRV backtracking solver.
//
// Same capability as the reference C solver (reference solver/src/sudoku.c:
// propagate:287 naked+hidden singles, solve_with_candidates:6 MRV recursion)
// but a different design: instead of storing a 9x9 candidate grid and
// memcpy'ing it on every branch, we keep three 9-entry "used digit" bitmask
// tables (rows/cols/boxes) updated incrementally; a cell's candidate set is
// derived on demand as ~(row|col|box). Branch state is ~380 bytes and the
// propagation loop touches only empty cells.

#include "sudoku.h"

#include <cstdio>
#include <cstring>
#include <ctime>

namespace {

constexpr uint16_t kAll = 0x3FE;  // bits 1..9

struct State {
  int32_t grid[81];
  uint16_t rows[9];
  uint16_t cols[9];
  uint16_t boxes[9];
  int empties;
};

inline int box_of(int r, int c) { return (r / 3) * 3 + c / 3; }

inline int popcount16(uint16_t m) { return __builtin_popcount(m); }

// Index of the single set bit (mask must be a power of two), as digit 1..9.
inline int bit_digit(uint16_t m) { return __builtin_ctz(m); }

inline uint16_t cell_cands(const State& s, int r, int c) {
  return static_cast<uint16_t>(~(s.rows[r] | s.cols[c] | s.boxes[box_of(r, c)]) &
                               kAll);
}

inline void place(State& s, int r, int c, int d) {
  uint16_t bit = static_cast<uint16_t>(1u << d);
  s.grid[r * 9 + c] = d;
  s.rows[r] |= bit;
  s.cols[c] |= bit;
  s.boxes[box_of(r, c)] |= bit;
  s.empties--;
}

// Build mask tables from the grid. Returns false on duplicate digits.
bool init_state(const int32_t grid[81], State& s) {
  std::memcpy(s.grid, grid, sizeof(s.grid));
  std::memset(s.rows, 0, sizeof(s.rows));
  std::memset(s.cols, 0, sizeof(s.cols));
  std::memset(s.boxes, 0, sizeof(s.boxes));
  s.empties = 81;
  for (int r = 0; r < 9; ++r) {
    for (int c = 0; c < 9; ++c) {
      int d = grid[r * 9 + c];
      if (d == 0) continue;
      if (d < 0 || d > 9) return false;
      uint16_t bit = static_cast<uint16_t>(1u << d);
      int b = box_of(r, c);
      if ((s.rows[r] | s.cols[c] | s.boxes[b]) & bit) return false;
      s.rows[r] |= bit;
      s.cols[c] |= bit;
      s.boxes[b] |= bit;
      s.empties--;
    }
  }
  return true;
}

// Constraint propagation to fixpoint: naked singles (a cell with one
// candidate) and hidden singles (a digit with one home in a unit).
// Returns false on contradiction.
bool propagate(State& s) {
  bool progress = true;
  while (progress && s.empties > 0) {
    progress = false;
    // Naked singles.
    for (int r = 0; r < 9; ++r) {
      for (int c = 0; c < 9; ++c) {
        if (s.grid[r * 9 + c] != 0) continue;
        uint16_t m = cell_cands(s, r, c);
        if (m == 0) return false;
        if ((m & (m - 1)) == 0) {
          place(s, r, c, bit_digit(m));
          progress = true;
        }
      }
    }
    // Hidden singles, per unit. For each unit collect, per digit, how many
    // empty cells admit it ("once" has exactly-one tracking via once/twice).
    for (int u = 0; u < 27; ++u) {
      uint16_t once = 0, twice = 0;
      int home_r[10], home_c[10];
      for (int k = 0; k < 9; ++k) {
        int r, c;
        if (u < 9) { r = u; c = k; }
        else if (u < 18) { r = k; c = u - 9; }
        else { int b = u - 18; r = (b / 3) * 3 + k / 3; c = (b % 3) * 3 + k % 3; }
        if (s.grid[r * 9 + c] != 0) continue;
        uint16_t m = cell_cands(s, r, c);
        twice |= static_cast<uint16_t>(once & m);
        once |= m;
        for (uint16_t t = m; t; t &= static_cast<uint16_t>(t - 1)) {
          int d = bit_digit(static_cast<uint16_t>(t & -t));
          home_r[d] = r;
          home_c[d] = c;
        }
      }
      // Digits missing from the unit that no empty cell admits → contradiction.
      uint16_t unit_used;
      if (u < 9) unit_used = s.rows[u];
      else if (u < 18) unit_used = s.cols[u - 9];
      else unit_used = s.boxes[u - 18];
      uint16_t missing = static_cast<uint16_t>(~unit_used & kAll);
      if (missing & ~once) return false;
      uint16_t singles = static_cast<uint16_t>(once & ~twice & missing);
      for (uint16_t t = singles; t; t &= static_cast<uint16_t>(t - 1)) {
        int d = bit_digit(static_cast<uint16_t>(t & -t));
        int r = home_r[d], c = home_c[d];
        if (s.grid[r * 9 + c] != 0) continue;  // placed earlier this sweep
        if (!(cell_cands(s, r, c) & (1u << d))) return false;
        place(s, r, c, d);
        progress = true;
      }
    }
  }
  return true;
}

// MRV: cell with the fewest candidates. Returns false if grid is full.
bool find_mrv(const State& s, int& out_r, int& out_c, uint16_t& out_m) {
  int best = 10;
  for (int r = 0; r < 9; ++r) {
    for (int c = 0; c < 9; ++c) {
      if (s.grid[r * 9 + c] != 0) continue;
      uint16_t m = cell_cands(s, r, c);
      int n = popcount16(m);
      if (n < best) {
        best = n;
        out_r = r;
        out_c = c;
        out_m = m;
        if (n <= 1) return true;
      }
    }
  }
  return best <= 9;
}

// Deadline bookkeeping for sv_solve_deadline: the clock syscall is only
// paid once per kDeadlineStride branch nodes.
struct Deadline {
  double end = 0.0;  // CLOCK_MONOTONIC seconds; 0 = no deadline
  long nodes = 0;
  bool expired = false;

  bool check() {
    if (end == 0.0 || expired) return expired;
    if ((++nodes & 4095) == 0) {
      timespec ts;
      clock_gettime(CLOCK_MONOTONIC, &ts);
      if (ts.tv_sec + ts.tv_nsec * 1e-9 >= end) expired = true;
    }
    return expired;
  }
};

// Tri-state search: 1 solved, 0 unsolvable, -1 deadline expired.
int dfs(State& s, Deadline& dl) {
  if (dl.check()) return -1;
  if (!propagate(s)) return 0;
  if (s.empties == 0) return 1;
  int r, c;
  uint16_t m;
  if (!find_mrv(s, r, c, m)) return 0;
  for (uint16_t t = m; t; t &= static_cast<uint16_t>(t - 1)) {
    State branch = s;
    place(branch, r, c, bit_digit(static_cast<uint16_t>(t & -t)));
    int res = dfs(branch, dl);
    if (res == 1) {
      s = branch;
      return 1;
    }
    if (res == -1) return -1;
  }
  return 0;
}

// Count solutions up to limit.
int dfs_count(State& s, int limit) {
  if (!propagate(s)) return 0;
  if (s.empties == 0) return 1;
  int r, c;
  uint16_t m;
  if (!find_mrv(s, r, c, m)) return 0;
  int total = 0;
  for (uint16_t t = m; t; t &= static_cast<uint16_t>(t - 1)) {
    State branch = s;
    place(branch, r, c, bit_digit(static_cast<uint16_t>(t & -t)));
    total += dfs_count(branch, limit - total);
    if (total >= limit) return limit;
  }
  return total;
}

}  // namespace

extern "C" {

int sv_validate(const int32_t grid[81]) {
  for (int i = 0; i < 81; ++i)
    if (grid[i] < 0 || grid[i] > 9) return SV_INVALID;
  State s;
  return init_state(grid, s) ? SV_OK : SV_INVALID;
}

int sv_solve_deadline(int32_t grid[81], double timeout_s) {
  int v = sv_validate(grid);
  if (v != SV_OK) return v;
  State s;
  init_state(grid, s);
  Deadline dl;
  if (timeout_s > 0) {
    timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    dl.end = ts.tv_sec + ts.tv_nsec * 1e-9 + timeout_s;
  }
  int res = dfs(s, dl);
  if (res == -1) return SV_TIMEOUT;
  if (res == 0) return SV_UNSOLVABLE;
  std::memcpy(grid, s.grid, sizeof(s.grid));
  return SV_OK;
}

int sv_solve(int32_t grid[81]) { return sv_solve_deadline(grid, 0.0); }

int sv_candidates(const int32_t grid[81], uint16_t cands[81]) {
  State s;
  bool ok = true;
  if (!init_state(grid, s)) {
    // Build best-effort masks even for invalid grids so callers can inspect.
    ok = false;
    std::memcpy(s.grid, grid, sizeof(s.grid));
    std::memset(s.rows, 0, sizeof(s.rows));
    std::memset(s.cols, 0, sizeof(s.cols));
    std::memset(s.boxes, 0, sizeof(s.boxes));
    for (int r = 0; r < 9; ++r)
      for (int c = 0; c < 9; ++c) {
        int d = grid[r * 9 + c];
        if (d >= 1 && d <= 9) {
          s.rows[r] |= 1u << d;
          s.cols[c] |= 1u << d;
          s.boxes[box_of(r, c)] |= 1u << d;
        }
      }
  }
  for (int r = 0; r < 9; ++r)
    for (int c = 0; c < 9; ++c) {
      int d = grid[r * 9 + c];
      cands[r * 9 + c] = (d >= 1 && d <= 9) ? static_cast<uint16_t>(1u << d)
                                            : cell_cands(s, r, c);
    }
  return ok ? SV_OK : SV_INVALID;
}

int sv_count_solutions(const int32_t grid[81], int limit) {
  if (sv_validate(grid) != SV_OK) return -1;
  State s;
  init_state(grid, s);
  return dfs_count(s, limit);
}

int sv_solve_batch(int32_t* grids, int n, int32_t* statuses) {
  int solved = 0;
  for (int i = 0; i < n; ++i) {
    int st = sv_solve(grids + i * 81);
    if (statuses) statuses[i] = st;
    if (st == SV_OK) ++solved;
  }
  return solved;
}

int sv_load_file(const char* path, int32_t grid[81]) {
  FILE* f = std::fopen(path, "r");
  if (!f) return SV_IOERROR;
  int n = 0, ch;
  while (n < 81 && (ch = std::fgetc(f)) != EOF) {
    if (ch >= '0' && ch <= '9') grid[n++] = ch - '0';
    else if (ch == '.') grid[n++] = 0;
    // other characters (whitespace, separators) ignored
  }
  std::fclose(f);
  return n == 81 ? SV_OK : SV_IOERROR;
}

int sv_save_file(const char* path, const int32_t grid[81]) {
  FILE* f = std::fopen(path, "w");
  if (!f) return SV_IOERROR;
  for (int r = 0; r < 9; ++r) {
    for (int c = 0; c < 9; ++c) std::fputc('0' + grid[r * 9 + c], f);
    std::fputc('\n', f);
  }
  std::fclose(f);
  return SV_OK;
}

void sv_format_grid(const int32_t grid[81], char* buf, int buflen) {
  int pos = 0;
  auto put = [&](const char* s) {
    while (*s && pos < buflen - 1) buf[pos++] = *s++;
  };
  for (int r = 0; r < 9; ++r) {
    if (r % 3 == 0) put("+-------+-------+-------+\n");
    for (int c = 0; c < 9; ++c) {
      if (c % 3 == 0) put("| ");
      char cell[3] = {grid[r * 9 + c] ? static_cast<char>('0' + grid[r * 9 + c])
                                      : '.',
                      ' ', 0};
      put(cell);
    }
    put("|\n");
  }
  put("+-------+-------+-------+\n");
  buf[pos] = 0;
}

}  // extern "C"
