"""Offline dataset augmentation xN.

Capability parity with reference tools/augment_data.py: ten ops — rotate
(:28), perspective (:44), brightness (:68), contrast (:78), blur (:89),
gaussian + salt-pepper noise (:102), elastic (:126), erasing (:152),
translate (:182), scale (:199) — composed into light/medium/heavy
pipelines (:230), with an augmentation preview grid (:355).

Host-side PIL/numpy by design (offline tool); the ON-DEVICE equivalent
used during training lives in ml/augment.py.

CLI:
    python -m sudoku_vision_tpu.tools.augment_data --input data/real/train \
        --output data/real_aug --times 3 --intensity medium [--preview p.png]
"""

from __future__ import annotations

import argparse
import os
import random

import numpy as np
from PIL import Image, ImageFilter


def _np(img):
    return np.asarray(img, np.float32)


def _pil(arr):
    return Image.fromarray(np.clip(arr, 0, 255).astype(np.uint8))


def rotate(img, rng, limit=12):
    return img.rotate(rng.uniform(-limit, limit), resample=Image.BILINEAR,
                      fillcolor=int(np.median(_np(img))))


def perspective(img, rng, strength=0.12):
    w, h = img.size
    d = strength * w
    src = [(0, 0), (w, 0), (w, h), (0, h)]
    dst = [(x + rng.uniform(-d, d), y + rng.uniform(-d, d)) for x, y in src]
    coeffs = _persp_coeffs(src, dst)
    return img.transform(img.size, Image.PERSPECTIVE, coeffs,
                         resample=Image.BILINEAR,
                         fillcolor=int(np.median(_np(img))))


def _persp_coeffs(src, dst):
    a = []
    b = []
    for (x, y), (u, v) in zip(dst, src):
        a.append([x, y, 1, 0, 0, 0, -u * x, -u * y])
        a.append([0, 0, 0, x, y, 1, -v * x, -v * y])
        b += [u, v]
    return np.linalg.solve(np.asarray(a, float), np.asarray(b, float))


def brightness(img, rng, limit=30):
    return _pil(_np(img) + rng.uniform(-limit, limit))


def contrast(img, rng, lo=0.75, hi=1.25):
    return _pil((_np(img) - 128) * rng.uniform(lo, hi) + 128)


def blur(img, rng, max_radius=1.2):
    return img.filter(ImageFilter.GaussianBlur(rng.uniform(0.2, max_radius)))


def gaussian_noise(img, rng, sigma=8):
    npr = np.random.default_rng(rng.getrandbits(32))
    return _pil(_np(img) + npr.normal(0, rng.uniform(2, sigma),
                                      _np(img).shape))


def salt_pepper(img, rng, amount=0.01):
    arr = _np(img)
    npr = np.random.default_rng(rng.getrandbits(32))
    mask = npr.random(arr.shape)
    arr[mask < amount / 2] = 0
    arr[mask > 1 - amount / 2] = 255
    return _pil(arr)


def elastic(img, rng, alpha=3.0, sigma=4):
    """Small elastic warp via smoothed random displacement."""
    arr = _np(img)
    h, w = arr.shape
    npr = np.random.default_rng(rng.getrandbits(32))
    dx = _pil(npr.normal(0, 1, (h, w)) * 50 + 128).filter(
        ImageFilter.GaussianBlur(sigma))
    dy = _pil(npr.normal(0, 1, (h, w)) * 50 + 128).filter(
        ImageFilter.GaussianBlur(sigma))
    dx = (_np(dx) - 128) / 50 * alpha
    dy = (_np(dy) - 128) / 50 * alpha
    ys, xs = np.mgrid[0:h, 0:w]
    sx = np.clip(xs + dx, 0, w - 1)
    sy = np.clip(ys + dy, 0, h - 1)
    x0 = sx.astype(int)
    y0 = sy.astype(int)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    fx = sx - x0
    fy = sy - y0
    out = (arr[y0, x0] * (1 - fy) * (1 - fx) + arr[y0, x1] * (1 - fy) * fx
           + arr[y1, x0] * fy * (1 - fx) + arr[y1, x1] * fy * fx)
    return _pil(out)


def erasing(img, rng, max_frac=0.15):
    arr = _np(img)
    h, w = arr.shape
    eh = rng.randint(2, max(3, int(h * max_frac)))
    ew = rng.randint(2, max(3, int(w * max_frac)))
    y = rng.randint(0, h - eh)
    x = rng.randint(0, w - ew)
    arr[y:y + eh, x:x + ew] = arr.mean()
    return _pil(arr)


def translate(img, rng, max_px=2):
    tx = rng.uniform(-max_px, max_px)
    ty = rng.uniform(-max_px, max_px)
    return img.transform(img.size, Image.AFFINE, (1, 0, tx, 0, 1, ty),
                         resample=Image.BILINEAR,
                         fillcolor=int(np.median(_np(img))))


def scale(img, rng, lo=0.88, hi=1.12):
    s = rng.uniform(lo, hi)
    w, h = img.size
    c = (1 - 1 / s) / 2
    return img.transform(img.size, Image.AFFINE,
                         (1 / s, 0, c * w, 0, 1 / s, c * h),
                         resample=Image.BILINEAR,
                         fillcolor=int(np.median(_np(img))))


OPS = {
    "rotate": rotate, "perspective": perspective, "brightness": brightness,
    "contrast": contrast, "blur": blur, "gaussian_noise": gaussian_noise,
    "salt_pepper": salt_pepper, "elastic": elastic, "erasing": erasing,
    "translate": translate, "scale": scale,
}

PIPELINES = {
    "light": (["rotate", "brightness", "contrast", "translate"], 2),
    "medium": (["rotate", "perspective", "brightness", "contrast", "blur",
                "gaussian_noise", "translate", "scale"], 3),
    "heavy": (list(OPS), 4),
}


def create_augmentation_pipeline(intensity: str, rng: random.Random):
    """Random subset of the intensity tier's ops (reference :230)."""
    names, k = PIPELINES[intensity]
    chosen = rng.sample(names, min(k, len(names)))

    def apply(img: Image.Image) -> Image.Image:
        for name in chosen:
            img = OPS[name](img, rng)
        return img

    return apply, chosen


def preview_augmentations(sample_path: str, out_path: str, seed: int = 0):
    """Grid preview (reference :355)."""
    rng = random.Random(seed)
    with Image.open(sample_path) as im:
        base = im.convert("L")
    tiles = [base]
    for _ in range(15):
        fn, _ = create_augmentation_pipeline("medium", rng)
        tiles.append(fn(base.copy()))
    w, h = base.size
    sheet = Image.new("L", (4 * w, 4 * h))
    for i, t in enumerate(tiles):
        sheet.paste(t, ((i % 4) * w, (i // 4) * h))
    sheet.save(out_path)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="offline dataset augmentation")
    p.add_argument("--input", required=True, help="class-dir root")
    p.add_argument("--output", required=True)
    p.add_argument("--times", type=int, default=3)
    p.add_argument("--intensity", choices=list(PIPELINES), default="medium")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--preview", help="write a preview grid PNG and exit")
    args = p.parse_args(argv)
    rng = random.Random(args.seed)

    if args.preview:
        sample = None
        for root, _, files in os.walk(args.input):
            for f in files:
                if f.endswith(".png"):
                    sample = os.path.join(root, f)
                    break
            if sample:
                break
        preview_augmentations(sample, args.preview, args.seed)
        print(f"preview written to {args.preview}")
        return 0

    n = 0
    for cls in sorted(os.listdir(args.input)):
        src_d = os.path.join(args.input, cls)
        if not os.path.isdir(src_d):
            continue
        dst_d = os.path.join(args.output, cls)
        os.makedirs(dst_d, exist_ok=True)
        for f in sorted(os.listdir(src_d)):
            if not f.endswith(".png"):
                continue
            with Image.open(os.path.join(src_d, f)) as im:
                base = im.convert("L")
            base.save(os.path.join(dst_d, f))
            for k in range(args.times):
                fn, _ = create_augmentation_pipeline(args.intensity, rng)
                fn(base.copy()).save(
                    os.path.join(dst_d, f"{f[:-4]}_aug{k}.png"))
                n += 1
    print(f"wrote {n} augmented samples to {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
