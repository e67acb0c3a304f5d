"""Synthetic digit-cell generation (v1 + v2 capabilities in one module).

Capability parity with the reference generators:
  * digits 1-9 rendered from system fonts with position/size jitter
    (reference ml/generate_synthetic.py:82 generate_digit_image);
  * empty cells in several variants — plain / noisy / gradient / artifact
    (reference ml/generate_synthetic.py:126);
  * v2 realism: paper textures and gradients (reference
    ml/generate_synthetic_v2.py:128 generate_paper_background), grid-line
    artifacts at cell borders (:177 add_grid_artifacts), multiply-blend
    ink (:247), smudge hard-negatives for the empty class (:252);
  * per-sample augmentation: rotate, scale, blur, brightness/contrast,
    noise, erode/dilate, perspective (reference
    ml/generate_synthetic.py:192 apply_augmentation);
  * train/val split + metadata.json (reference :272 generate_dataset).

CLI:
    python -m sudoku_vision_tpu.ml.generate_synthetic --out data/synthetic \
        --per-class 500 [--val-frac 0.1] [--seed 0]

Output layout matches the reference dataset convention consumed by
datasets.py: <out>/{train,val}/<class 0..9>/*.png + metadata.json.

Host-side by design: dataset synthesis is an offline tool; the training
input pipeline feeds the TPU from the generated files (and applies
additional on-device augmentation, see ml/augment.py).
"""

from __future__ import annotations

import argparse
import json
import os
import random

import numpy as np
from PIL import Image, ImageDraw, ImageFilter, ImageFont

CELL = 28
RENDER = 64  # render large, downsample for anti-aliasing

FONT_DIRS = [
    "/usr/share/fonts/truetype/dejavu",
    "/usr/share/fonts/truetype",
    "/usr/share/fonts",
]


def find_available_fonts() -> list[str]:
    """Scan font directories (reference generate_synthetic_v2.py:59)."""
    fonts = []
    for d in FONT_DIRS:
        if not os.path.isdir(d):
            continue
        for root, _, files in os.walk(d):
            for f in files:
                if f.lower().endswith((".ttf", ".otf")):
                    fonts.append(os.path.join(root, f))
    return sorted(set(fonts))


def generate_paper_background(rng: random.Random, size: int) -> np.ndarray:
    """Paper-like background: base tone + low-freq gradient + grain
    (reference generate_synthetic_v2.py:128)."""
    npr = np.random.default_rng(rng.getrandbits(32))
    base = rng.uniform(190, 250)
    img = np.full((size, size), base, np.float32)
    # Low-frequency illumination gradient.
    gx = npr.uniform(-30, 30)
    gy = npr.uniform(-30, 30)
    xs = np.linspace(-0.5, 0.5, size)
    img += gx * xs[None, :] + gy * xs[:, None]
    # Paper grain.
    grain = npr.normal(0, rng.uniform(1, 6), (size, size))
    img += grain
    return np.clip(img, 0, 255)


def add_grid_artifacts(img: np.ndarray, rng: random.Random) -> np.ndarray:
    """Partial grid-line strokes at cell borders
    (reference generate_synthetic_v2.py:177)."""
    size = img.shape[0]
    out = img.copy()
    for side in ("top", "bottom", "left", "right"):
        if rng.random() > 0.4:
            continue
        darkness = rng.uniform(40, 140)
        thick = rng.randint(1, max(1, size // 14))
        frac = rng.uniform(0.4, 1.0)
        run = int(size * frac)
        start = rng.randint(0, size - run) if run < size else 0
        if side == "top":
            out[:thick, start:start + run] = darkness
        elif side == "bottom":
            out[-thick:, start:start + run] = darkness
        elif side == "left":
            out[start:start + run, :thick] = darkness
        else:
            out[start:start + run, -thick:] = darkness
    return out


_STROKE_FRAC = 0.30  # module default; --stroke-frac overrides per run


def _render_digit_mask(
    digit: int, font_path: str, rng: random.Random
) -> np.ndarray:
    """Anti-aliased ink mask (0..1) of a digit with jitter, RENDER size.

    A _STROKE_FRAC share of digits is procedurally stroke-rendered
    (ml/stroke_digits.py) for glyph diversity beyond the few system
    fonts — raise it (--stroke-frac) to emphasize handwritten-style
    glyphs (the pen-filled-puzzle scene category)."""
    if rng.random() < _STROKE_FRAC:
        from sudoku_vision_tpu.ml.stroke_digits import render_stroke_digit

        mask = render_stroke_digit(digit, RENDER, rng)
        if rng.random() < 0.3:
            img = Image.fromarray((mask * 255).astype(np.uint8))
            img = img.filter(ImageFilter.GaussianBlur(rng.uniform(0.3, 1.0)))
            mask = np.asarray(img, np.float32) / 255.0
        return mask
    fsize = rng.randint(int(RENDER * 0.5), int(RENDER * 0.85))
    try:
        font = ImageFont.truetype(font_path, fsize)
    except OSError:
        font = ImageFont.load_default()
    canvas = Image.new("L", (RENDER, RENDER), 0)
    draw = ImageDraw.Draw(canvas)
    bbox = draw.textbbox((0, 0), str(digit), font=font)
    tw, th = bbox[2] - bbox[0], bbox[3] - bbox[1]
    cx = (RENDER - tw) / 2 - bbox[0] + rng.uniform(-RENDER * 0.08, RENDER * 0.08)
    cy = (RENDER - th) / 2 - bbox[1] + rng.uniform(-RENDER * 0.08, RENDER * 0.08)
    draw.text((cx, cy), str(digit), fill=255, font=font)
    if rng.random() < 0.3:
        canvas = canvas.filter(ImageFilter.GaussianBlur(rng.uniform(0.3, 1.0)))
    return np.asarray(canvas, np.float32) / 255.0


def apply_augmentation(img: np.ndarray, rng: random.Random) -> np.ndarray:
    """Geometric + photometric jitter (reference generate_synthetic.py:192).

    img: float (S, S) grayscale 0..255.
    """
    pil = Image.fromarray(np.clip(img, 0, 255).astype(np.uint8))
    size = pil.size[0]
    # Rotation.
    if rng.random() < 0.7:
        pil = pil.rotate(rng.uniform(-12, 12), resample=Image.BILINEAR,
                         fillcolor=int(np.median(img)))
    # Perspective-ish shear via affine.
    if rng.random() < 0.4:
        sh = rng.uniform(-0.15, 0.15)
        pil = pil.transform(
            pil.size, Image.AFFINE, (1, sh, -sh * size / 2, 0, 1, 0),
            resample=Image.BILINEAR, fillcolor=int(np.median(img)))
    out = np.asarray(pil, np.float32)
    npr = np.random.default_rng(rng.getrandbits(32))
    # Brightness / contrast.
    if rng.random() < 0.6:
        out = np.clip((out - 128) * rng.uniform(0.75, 1.25)
                      + 128 + rng.uniform(-25, 25), 0, 255)
    # Gaussian noise.
    if rng.random() < 0.5:
        out = np.clip(out + npr.normal(0, rng.uniform(2, 10), out.shape),
                      0, 255)
    # Erode/dilate-ish via min/max filter.
    if rng.random() < 0.2:
        p = Image.fromarray(out.astype(np.uint8))
        p = p.filter(ImageFilter.MinFilter(3) if rng.random() < 0.5
                     else ImageFilter.MaxFilter(3))
        out = np.asarray(p, np.float32)
    return out


def generate_digit_cell(
    digit: int, fonts: list[str], rng: random.Random, realistic: bool = True
) -> np.ndarray:
    """One (CELL, CELL) uint8 cell image containing `digit` (1..9)."""
    bg = (generate_paper_background(rng, RENDER) if realistic
          else np.full((RENDER, RENDER), rng.uniform(200, 255), np.float32))
    if realistic and rng.random() < 0.5:
        bg = add_grid_artifacts(bg, rng)
    if realistic and rng.random() < 0.3:
        # Show-through ghost of a digit on the reverse page (thin paper).
        ghost = _render_digit_mask(rng.randint(1, 9), rng.choice(fonts), rng)
        bg = bg * (1 - ghost * rng.uniform(0.05, 0.18))
    mask = _render_digit_mask(digit, rng.choice(fonts), rng)
    ink = rng.uniform(10, 130)
    # Multiply-style blend (reference generate_synthetic_v2.py:247).
    img = bg * (1 - mask) + (bg * (ink / 255.0)) * mask
    img = apply_augmentation(img, rng)
    small = Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).resize(
        (CELL, CELL), Image.BILINEAR)
    return np.asarray(small)


def generate_empty_cell(rng: random.Random, realistic: bool = True,
                        fonts: list[str] | None = None) -> np.ndarray:
    """Empty cell: plain / noisy / gradient / artifact / smudge variants
    (reference generate_synthetic.py:126, v2 smudges :252)."""
    bg = (generate_paper_background(rng, RENDER) if realistic
          else np.full((RENDER, RENDER), rng.uniform(200, 255), np.float32))
    variant = rng.choice(
        ["plain", "noisy", "gradient", "artifact", "smudge", "ghost"])
    npr = np.random.default_rng(rng.getrandbits(32))
    if variant == "ghost":
        # Faint show-through digit: must still classify as EMPTY.
        ghost = _render_digit_mask(
            rng.randint(1, 9),
            rng.choice(fonts or find_available_fonts() or [None]), rng)
        bg = bg * (1 - ghost * rng.uniform(0.05, 0.20))
    elif variant == "noisy":
        bg = np.clip(bg + npr.normal(0, 10, bg.shape), 0, 255)
    elif variant == "gradient":
        xs = np.linspace(0, 1, RENDER)
        bg = np.clip(bg - 40 * np.outer(xs, xs), 0, 255)
    elif variant == "artifact":
        bg = add_grid_artifacts(bg, rng)
    elif variant == "smudge":
        # Faint blob hard-negative (not a digit).
        yy, xx = np.mgrid[0:RENDER, 0:RENDER]
        cy, cx = rng.uniform(16, 48), rng.uniform(16, 48)
        r2 = (yy - cy) ** 2 + (xx - cx) ** 2
        blob = np.exp(-r2 / rng.uniform(20, 120)) * rng.uniform(20, 70)
        bg = np.clip(bg - blob, 0, 255)
    bg = apply_augmentation(bg, rng)
    small = Image.fromarray(np.clip(bg, 0, 255).astype(np.uint8)).resize(
        (CELL, CELL), Image.BILINEAR)
    return np.asarray(small)


def generate_dataset(
    out_dir: str,
    per_class: int = 500,
    val_frac: float = 0.1,
    seed: int = 0,
    realistic: bool = True,
) -> dict:
    """Write <out>/{train,val}/<class>/NNNN.png; returns metadata dict."""
    rng = random.Random(seed)
    fonts = find_available_fonts() or [None]
    meta = {"per_class": per_class, "val_frac": val_frac, "seed": seed,
            "fonts": len(fonts), "realistic": realistic, "classes": 10}
    for cls in range(10):
        n_val = max(1, int(per_class * val_frac))
        for split, count in (("train", per_class - n_val), ("val", n_val)):
            d = os.path.join(out_dir, split, str(cls))
            os.makedirs(d, exist_ok=True)
            for i in range(count):
                img = (generate_empty_cell(rng, realistic, fonts)
                       if cls == 0
                       else generate_digit_cell(cls, fonts, rng, realistic))
                Image.fromarray(img).save(os.path.join(d, f"{i:05d}.png"))
    with open(os.path.join(out_dir, "metadata.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return meta


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="synthetic digit-cell generator")
    p.add_argument("--out", default="data/synthetic")
    p.add_argument("--per-class", type=int, default=500)
    p.add_argument("--val-frac", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--simple", action="store_true",
                   help="v1-style plain backgrounds (no paper/artifacts)")
    p.add_argument("--stroke-frac", type=float, default=0.30,
                   help="share of stroke-rendered (handwriting-style) "
                        "digit glyphs")
    args = p.parse_args(argv)
    global _STROKE_FRAC
    _STROKE_FRAC = args.stroke_frac
    meta = generate_dataset(args.out, args.per_class, args.val_frac,
                            args.seed, realistic=not args.simple)
    print(json.dumps(meta))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
