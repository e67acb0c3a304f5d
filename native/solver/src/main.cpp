// main.cpp — CLI for the native solver.
//
// Modes mirror the reference CLI (reference solver/src/main.c): solve a
// puzzle file, read from stdin, `-o` to write the solution, and `-b`
// benchmark mode timing four difficulty tiers over many iterations.
//
// Usage:
//   sudoku_solver puzzle.txt [-o out.txt]
//   sudoku_solver -            (read 81 chars from stdin)
//   sudoku_solver -b [iters]   (benchmark, default 100 iterations/tier)

#include <chrono>
#include <cstdio>
#include <cstring>
#include <string>

#include "sudoku.h"

namespace {

// Well-known public benchmark puzzles by difficulty tier.
struct Tier {
  const char* name;
  const char* puzzle;  // 81 chars, '.' = empty
};

const Tier kTiers[] = {
    {"Easy",
     "53..7....6..195....98....6.8...6...34..8.3..17...2...6.6....28....419..5"
     "....8..79"},
    {"Medium",
     ".2.6.8...58...97......4....37....5..6.......4..8....13....2......98...36"
     "...3.6.9."},
    {"Hard",  // "AI Escargot"-class
     "1....7.9..3..2...8..96..5....53..9...1..8...26....4...3......1..4......7"
     "..7...3.."},
    {"Evil",  // Arto Inkala's "world's hardest" puzzle
     "8..........36......7..9.2...5...7.......457.....1...3...1....68..85...1."
     ".9....4.."},
};

void parse81(const char* s, int32_t grid[81]) {
  int n = 0;
  for (const char* p = s; *p && n < 81; ++p) {
    if (*p >= '0' && *p <= '9') grid[n++] = *p - '0';
    else if (*p == '.') grid[n++] = 0;
  }
}

int run_benchmark(int iters) {
  std::printf("Benchmark: %d iterations per tier\n", iters);
  for (const Tier& t : kTiers) {
    int32_t base[81];
    parse81(t.puzzle, base);
    // Warm up + verify solvable.
    int32_t warm[81];
    std::memcpy(warm, base, sizeof(warm));
    if (sv_solve(warm) != SV_OK) {
      std::printf("%-8s UNSOLVABLE?!\n", t.name);
      continue;
    }
    auto t0 = std::chrono::steady_clock::now();
    for (int i = 0; i < iters; ++i) {
      int32_t g[81];
      std::memcpy(g, base, sizeof(g));
      sv_solve(g);
    }
    auto t1 = std::chrono::steady_clock::now();
    double us =
        std::chrono::duration_cast<std::chrono::nanoseconds>(t1 - t0).count() /
        1000.0 / iters;
    std::printf("%-8s %10.2f us/solve\n", t.name, us);
  }
  return 0;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr,
                 "usage: %s <puzzle.txt|-> [-o out.txt] | -b [iters]\n",
                 argv[0]);
    return 2;
  }

  if (std::strcmp(argv[1], "-b") == 0)
    return run_benchmark(argc > 2 ? std::atoi(argv[2]) : 100);

  int32_t grid[81] = {0};
  if (std::strcmp(argv[1], "-") == 0) {
    std::string input;
    int ch;
    while ((ch = std::fgetc(stdin)) != EOF) input.push_back(char(ch));
    parse81(input.c_str(), grid);
  } else if (sv_load_file(argv[1], grid) != SV_OK) {
    std::fprintf(stderr, "error: cannot read %s\n", argv[1]);
    return 2;
  }

  char buf[512];
  sv_format_grid(grid, buf, sizeof(buf));
  std::printf("Puzzle:\n%s", buf);

  int st = sv_solve(grid);
  if (st == SV_INVALID) {
    std::printf("INVALID puzzle\n");
    return 1;
  }
  if (st == SV_UNSOLVABLE) {
    std::printf("NO SOLUTION\n");
    return 1;
  }
  sv_format_grid(grid, buf, sizeof(buf));
  std::printf("Solution:\n%s", buf);

  for (int i = 2; i + 1 < argc; ++i)
    if (std::strcmp(argv[i], "-o") == 0) sv_save_file(argv[i + 1], grid);
  return 0;
}
