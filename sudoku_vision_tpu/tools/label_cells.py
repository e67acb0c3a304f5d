"""Interactive terminal cell labeler.

Capability parity with reference tools/label_cells.py: raw-mode single
keypress input (:28), inline cell preview (ASCII-art fallback — the
reference also supports iTerm2/sixel; ASCII is the portable path, :97),
CSV progress persistence with resume-at-first-unlabeled and undo (:117).

Keys: 0-9 label, SPACE = 0 (empty), u undo, s skip, q quit.

CLI:
    python -m sudoku_vision_tpu.tools.label_cells --cells data/cells \
        [--out labels.csv]
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

import numpy as np
from PIL import Image

ASCII_RAMP = " .:-=+*#%@"


def get_single_char() -> str:
    """Raw-mode keypress (reference :28)."""
    import termios
    import tty

    fd = sys.stdin.fileno()
    old = termios.tcgetattr(fd)
    try:
        tty.setraw(fd)
        ch = sys.stdin.read(1)
    finally:
        termios.tcsetattr(fd, termios.TCSADRAIN, old)
    return ch


def display_cell(path: str, width: int = 28):
    """ASCII-art preview (reference :97 fallback path)."""
    with Image.open(path) as im:
        arr = np.asarray(im.convert("L").resize((width, width // 2)))
    lo, hi = arr.min(), max(int(arr.max()), int(arr.min()) + 1)
    norm = (arr.astype(float) - lo) / (hi - lo)
    for row in norm:
        print("".join(ASCII_RAMP[int(v * (len(ASCII_RAMP) - 1))]
                      for v in row))


class LabelingSession:
    """CSV-backed resumable session (reference :117)."""

    def __init__(self, cells_dir: str, out_csv: str):
        self.cells_dir = cells_dir
        self.out_csv = out_csv
        self.items = []
        for entry in sorted(os.listdir(cells_dir)):
            d = os.path.join(cells_dir, entry)
            if not os.path.isdir(d):
                continue
            for f in sorted(os.listdir(d)):
                if f.startswith("cell_") and f.endswith(".png"):
                    self.items.append((entry, f))
        self.labels: dict = {}
        self._load_progress()

    def _load_progress(self):
        if not os.path.exists(self.out_csv):
            return
        with open(self.out_csv) as f:
            for row in csv.DictReader(f):
                self.labels[(row["image"], row["filename"])] = int(
                    row["label"])

    def _save(self):
        with open(self.out_csv, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["image", "filename", "label"])
            for (img, fn), lab in sorted(self.labels.items()):
                w.writerow([img, fn, lab])

    def first_unlabeled(self) -> int:
        for i, key in enumerate(self.items):
            if key not in self.labels:
                return i
        return len(self.items)

    def run(self):
        i = self.first_unlabeled()
        history = []
        while i < len(self.items):
            img, fn = self.items[i]
            print(f"\n[{i + 1}/{len(self.items)}] {img}/{fn} "
                  f"(labeled: {len(self.labels)})")
            display_cell(os.path.join(self.cells_dir, img, fn))
            print("label 0-9 (space=0) | u undo | s skip | q quit: ",
                  end="", flush=True)
            ch = get_single_char()
            print(ch)
            if ch == "q":
                break
            if ch == "s":
                i += 1
                continue
            if ch == "u":
                if history:
                    i = history.pop()
                    self.labels.pop(self.items[i], None)
                    self._save()
                continue
            if ch == " ":
                ch = "0"
            if ch.isdigit():
                self.labels[(img, fn)] = int(ch)
                self._save()
                history.append(i)
                i += 1
        self._save()
        print(f"\nsaved {len(self.labels)} labels to {self.out_csv}")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="terminal cell labeler")
    p.add_argument("--cells", required=True)
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)
    out = args.out or os.path.join(args.cells, "labels.csv")
    LabelingSession(args.cells, out).run()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
