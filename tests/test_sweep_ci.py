"""Always-on fresh-seed robustness sweep (VERDICT r3 #7).

The full scene sweep (harness/scene_sweep.py) only ran when someone
remembered, so thresholds kept being tuned against fixed sets. This is
the small always-on variant: reduced-res scenes on CPU with a seed
derived from TODAY'S DATE — no threshold in the repo was ever fit to
these scenes, and a wrong-solve regression fails CI within a day of
introduction (reference tests/metrics.py:254 detect_regression intent).

Contract: `wrong_solve` (confidently wrong answer) is the release
blocker and must be 0. `honest_fail` (pipeline says it failed) is
tolerated at reduced res — 512x512 renders lose fine grid detail that
the deployment resolution keeps.
"""

import datetime

import pytest

from sudoku_vision_tpu.harness.scene_sweep import run_sweep, summarize
from sudoku_vision_tpu.ml.generate_scenes import CATEGORIES

N_SCENES = 8
SIZE = (512, 512)  # matches tests/test_orientation.py: compile is cached


def _today_seed() -> int:
    d = datetime.date.today()
    return 42_000_000 + d.year * 10_000 + d.month * 100 + d.day


@pytest.fixture(scope="module")
def records():
    # rotate which categories run by day so the whole list is covered
    # over time, not just the first N
    day = datetime.date.today().toordinal()
    off = day % len(CATEGORIES)
    cats = CATEGORIES[off:] + CATEGORIES[:off]
    return run_sweep(N_SCENES, _today_seed(), SIZE, cats, verbose=False)


def test_no_wrong_solves_on_fresh_seeds(records):
    s = summarize(records)
    assert s["wrong_solve"] == 0, (
        "confidently-wrong answers on never-seen scenes: "
        f"{[r['name'] for r in records if r['outcome'] == 'wrong_solve']}")


def test_fresh_seed_solve_rate_floor(records):
    """Reduced-res honest-fail slack, but the pipeline must still
    actually work on most fresh scenes (all-honest-fail would make the
    wrong-solve gate vacuous)."""
    s = summarize(records)
    assert s["solved_correct"] >= N_SCENES // 2, s
