"""Full-scene synthetic sudoku photo generator.

Renders WHOLE sudoku photographs — page, grid, printed digits,
perspective, lighting, clutter — with exact ground truth (puzzle string,
solution, grid corner coordinates). This widens the e2e validation set
beyond the 5 hand-photographed golden images the detection/empty-cell
thresholds were originally tuned on (reference anchor: the e2e ground
truth schema with category/difficulty metadata, reference
tests/e2e_runner.py:193, and the v2 cell-level realism generator,
reference ml/generate_synthetic_v2.py:128).

Scene recipe:
  1. puzzle = random valid sudoku (band/stack/row/col/digit permutations
     of a base solution; cells removed to a target clue count);
  2. page render: paper texture, 9x9 lattice with thick box lines,
     printed digits from system fonts;
  3. composition: page quad perspective-warped onto a cluttered
     background, category-specific degradation (skew, low light, glare,
     shadow band, blur, sensor noise).

API:
  render_scene(rng, size=(H, W), category=...) -> (bgr_u8, truth_dict)
  generate_e2e_set(out_dir, n, ...) -> ground-truth records list

CLI:
    python -m sudoku_vision_tpu.ml.generate_scenes --out data/test_e2e \
        --n 24 [--seed 1] [--size 1512x2016]
"""

from __future__ import annotations

import argparse
import json
import os
import random

import numpy as np
from PIL import Image, ImageDraw, ImageFilter, ImageFont

from sudoku_vision_tpu.ml.generate_synthetic import find_available_fonts

CATEGORIES = (
    "printed_clean",
    "printed_skew",
    "low_light",
    "glare",
    "shadow",
    "cluttered",
    "newsprint",
    "facing_pages",
    "rotated",      # photo rotated a quarter-turn multiple +- 30 deg
    "handwritten",  # pen-filled grid: stroke-rendered digits, uneven ink
    "screen",       # photographed display: backlight, cool tint, moire
    "motion_blur",  # camera shake: directional blur along a random angle
    "far_away",     # small grid (~12-16% of frame, near the area gate)
    "occluded",     # finger/pen at the page margin breaking the outer line
    "curved_page",  # open-book cylindrical curvature: bowed grid lines
)


# ---------------------------------------------------------------------------
# Puzzle generation
# ---------------------------------------------------------------------------


def random_solution(rng: random.Random) -> np.ndarray:
    """A uniform-ish random completed sudoku grid (9, 9) int.

    Base pattern grid[r, c] = (3*(r%3) + r//3 + c) % 9 + 1 is a valid
    solution; randomize by digit relabeling + row/col permutations within
    bands + band/stack permutations + optional transpose.
    """
    base = np.array([[(3 * (r % 3) + r // 3 + c) % 9 + 1 for c in range(9)]
                     for r in range(9)])
    digits = np.array([0] + rng.sample(range(1, 10), 9))
    g = digits[base]
    band = rng.sample(range(3), 3)
    rows = [b * 3 + r for b in band for r in rng.sample(range(3), 3)]
    stack = rng.sample(range(3), 3)
    cols = [s * 3 + c for s in stack for c in rng.sample(range(3), 3)]
    g = g[np.ix_(rows, cols)]
    if rng.random() < 0.5:
        g = g.T.copy()
    return g


def make_puzzle(rng: random.Random, clues: int = 32, unique: bool = True):
    """(puzzle, solution): remove cells from a random solution down to
    ~`clues` givens. Always solvable (the source solution completes it);
    with unique=True, cells whose removal would admit a second solution
    are kept (checked with the native solver's count_solutions), so the
    ground-truth solution is THE solution."""
    from sudoku_vision_tpu import solver as native_solver

    solution = random_solution(rng)
    puzzle = solution.copy()
    order = rng.sample(range(81), 81)
    removed = 0
    for idx in order:
        if 81 - removed <= clues:
            break
        r, c = divmod(idx, 9)
        prev = puzzle[r, c]
        puzzle[r, c] = 0
        if unique and native_solver.count_solutions(puzzle, 2) != 1:
            puzzle[r, c] = prev
            continue
        removed += 1
    return puzzle, solution


# ---------------------------------------------------------------------------
# Page rendering
# ---------------------------------------------------------------------------


def _paper(rng: random.Random, h: int, w: int, newsprint: bool) -> np.ndarray:
    npr = np.random.default_rng(rng.getrandbits(32))
    base = rng.uniform(200, 245) if not newsprint else rng.uniform(175, 210)
    img = np.full((h, w), base, np.float32)
    xs = np.linspace(-0.5, 0.5, w)
    ys = np.linspace(-0.5, 0.5, h)
    img += npr.uniform(-18, 18) * xs[None, :] + npr.uniform(-18, 18) * ys[:, None]
    img += npr.normal(0, 5 if newsprint else 2.5, (h, w))
    return np.clip(img, 0, 255)


def render_page(puzzle: np.ndarray, rng: random.Random, grid_px: int = 360,
                newsprint: bool = False, handwritten: bool = False):
    """Render the puzzle page. Returns (page float (H, W), corners (4, 2)
    of the grid outline in page coords, tl/tr/br/bl order).

    handwritten=True draws the digits as jittered pen strokes
    (ml/stroke_digits.py) with per-digit ink variation instead of a
    system font — the filled-in-by-hand puzzle class."""
    margin = int(grid_px * rng.uniform(0.10, 0.25))
    page_w = grid_px + 2 * margin
    page_h = grid_px + 2 * margin + int(grid_px * rng.uniform(0, 0.3))
    page = _paper(rng, page_h, page_w, newsprint)
    ox = margin
    oy = margin
    pil = Image.fromarray(np.clip(page, 0, 255).astype(np.uint8))
    draw = ImageDraw.Draw(pil)
    cell = grid_px / 9.0
    ink = rng.uniform(20, 70)
    thin = max(1, round(grid_px / 360))
    thick = thin * 2 + (1 if grid_px > 500 else 0)
    for i in range(10):
        wdt = thick if i % 3 == 0 else thin
        x = ox + round(i * cell)
        y = oy + round(i * cell)
        draw.line([(x, oy), (x, oy + grid_px)], fill=int(ink), width=wdt)
        draw.line([(ox, y), (ox + grid_px, y)], fill=int(ink), width=wdt)
    if handwritten:
        from sudoku_vision_tpu.ml.stroke_digits import render_stroke_digit

        arr = np.asarray(pil, np.float32)
        ds = int(cell * 0.92)
        for r in range(9):
            for c in range(9):
                d = int(puzzle[r, c])
                if d == 0:
                    continue
                mask = render_stroke_digit(d, ds, rng)
                y0 = oy + round(r * cell + (cell - ds) / 2
                                + rng.uniform(-0.04, 0.04) * cell)
                x0 = ox + round(c * cell + (cell - ds) / 2
                                + rng.uniform(-0.04, 0.04) * cell)
                pen = rng.uniform(25, 85)  # ballpoint/pencil variation
                reg = arr[y0:y0 + ds, x0:x0 + ds]
                reg[:] = reg * (1 - mask) + pen * mask
        pil = Image.fromarray(np.clip(arr, 0, 255).astype(np.uint8))
    else:
        fonts = find_available_fonts() or [None]
        font_path = rng.choice(fonts)
        fsize = int(cell * rng.uniform(0.55, 0.72))
        try:
            font = ImageFont.truetype(font_path, fsize)
        except (OSError, TypeError):
            font = ImageFont.load_default()
        for r in range(9):
            for c in range(9):
                d = int(puzzle[r, c])
                if d == 0:
                    continue
                cx = ox + (c + 0.5) * cell
                cy = oy + (r + 0.5) * cell
                bbox = draw.textbbox((0, 0), str(d), font=font)
                tw, th = bbox[2] - bbox[0], bbox[3] - bbox[1]
                jx = rng.uniform(-0.05, 0.05) * cell
                jy = rng.uniform(-0.05, 0.05) * cell
                draw.text(
                    (cx - tw / 2 - bbox[0] + jx, cy - th / 2 - bbox[1] + jy),
                    str(d), fill=int(ink * rng.uniform(0.8, 1.2)), font=font)
    corners = np.array([[ox, oy], [ox + grid_px, oy],
                        [ox + grid_px, oy + grid_px], [ox, oy + grid_px]],
                       np.float64)
    return np.asarray(pil, np.float32), corners


def _cylinder_curve(page: np.ndarray, corners: np.ndarray,
                    rng: random.Random, grid_px: int):
    """Open-book page curvature: column-wise vertical bow y' = y + D(x).

    D(x) = A sin(pi x / W + phase), A ~ 0.8-1.8% of the grid size — the
    scale of a paperback page near the spine. Horizontal grid lines bow
    by several px off the straight corner-to-corner chord (what
    cv/extract.py::refine_boundaries exists to absorb); corner ground
    truth moves with the displacement field, exactly."""
    ph, pw = page.shape
    amp = grid_px * rng.uniform(0.008, 0.018) * rng.choice([-1, 1])
    phase = rng.uniform(0, np.pi)
    xs = np.arange(pw, dtype=np.float32)
    disp = (amp * np.sin(np.pi * xs / pw + phase)).astype(np.float32)
    disp -= disp.mean()
    yy = np.arange(ph, dtype=np.float32)[:, None] - disp[None, :]
    y0 = np.clip(np.floor(yy).astype(np.int32), 0, ph - 1)
    y1 = np.clip(y0 + 1, 0, ph - 1)
    f = yy - y0
    cols = np.arange(pw)[None, :]
    curved = page[y0, cols] * (1 - f) + page[y1, cols] * f
    c = corners.copy()
    c[:, 1] += np.interp(c[:, 0], xs, disp.astype(np.float64))
    return curved.astype(np.float32), c


def _draw_occluder(scene: np.ndarray, corners: np.ndarray,
                   rng: random.Random) -> np.ndarray:
    """Finger or pen at the page margin, breaking the grid's outer line.

    The real-world "thumb holding the book" / "pen on the desk" class:
    a large dark blob adjacent to (finger: slightly overlapping) the
    grid's outer border. The blob's long straight sides are single-family
    lines with no crossings into the lattice — region isolation must not
    absorb them and the extreme-point corners must survive (the peel
    validator catches a steal). No digit cell is covered, so the ground
    truth stays unambiguous.
    """
    h, w = scene.shape[:2]
    edge = rng.randrange(4)
    c0, c1 = corners[edge], corners[(edge + 1) % 4]
    center = corners.mean(axis=0)
    t = rng.uniform(0.25, 0.75)
    p = c0 + t * (c1 - c0)
    ev = (c1 - c0) / max(1e-6, np.hypot(*(c1 - c0)))
    n = np.array([-ev[1], ev[0]])
    if np.dot(n, center - p) > 0:       # make n point AWAY from the grid
        n = -n
    cell = np.hypot(*(c1 - c0)) / 9.0
    pil = Image.fromarray(np.clip(scene, 0, 255).astype(np.uint8))
    draw = ImageDraw.Draw(pil)
    kind = rng.choice(["finger", "pen"])
    if kind == "finger":
        # Capsule from the frame edge to just past the outer grid line.
        # The capsule's FARTHEST point (the round cap's edge, at
        # cap_center + ww/2 along n) intrudes <= 0.09 cell: enough to
        # break the line (1-3 px), short of the nearest digit glyph
        # (starts ~0.14 cell in). The cap center must therefore sit
        # ww/2 - intrusion OUTSIDE the line — centering it on the
        # intrusion point buries half a fingertip in the border cells
        # (measured: it covered given digits and made truth ambiguous).
        intrusion = rng.uniform(0.03, 0.09) * cell
        fw = int(cell * rng.uniform(0.8, 1.3))
        base = p + n * max(h, w)        # guaranteed off-frame
        skin = (int(rng.uniform(95, 130)), int(rng.uniform(135, 175)),
                int(rng.uniform(175, 215)))          # BGR skin tone
        rim = tuple(int(v * 0.72) for v in skin)     # shaded silhouette rim
        for col, ww in ((rim, fw + max(2, fw // 6)), (skin, fw)):
            tip = p + n * (ww / 2 - intrusion)       # cap edge at -intrusion
            draw.line([tuple(tip), tuple(base)], fill=col, width=ww)
            draw.ellipse([tip[0] - ww / 2, tip[1] - ww / 2,
                          tip[0] + ww / 2, tip[1] + ww / 2], fill=col)
    else:
        # Pen on the margin: a long thin dark capsule NEAR the grid,
        # roughly parallel to the edge — a decoy straight line the
        # lattice bank will see as a real line. The outward offset
        # covers the rotated ends' swing so the pen NEVER crosses the
        # grid (ground truth must stay unambiguous).
        ang = rng.uniform(-0.25, 0.25)
        half = rng.uniform(2.0, 4.5) * cell
        pw_ = max(2, int(cell * rng.uniform(0.15, 0.30)))
        off = half * abs(np.sin(ang)) + pw_ + rng.uniform(0.3, 1.0) * cell
        mid = p + n * off
        rot = np.array([[np.cos(ang), -np.sin(ang)],
                        [np.sin(ang), np.cos(ang)]])
        dv = rot @ ev
        a, b = mid - dv * half, mid + dv * half
        ink = rng.choice([(25, 25, 30), (140, 60, 35), (35, 35, 150)])
        draw.line([tuple(a), tuple(b)], fill=ink, width=pw_)
        for q in (a, b):
            draw.ellipse([q[0] - pw_ / 2, q[1] - pw_ / 2,
                          q[0] + pw_ / 2, q[1] + pw_ / 2], fill=ink)
    return np.asarray(pil, np.float32)


# ---------------------------------------------------------------------------
# Scene composition
# ---------------------------------------------------------------------------


def _persp_coeffs(src, dst):
    """PIL perspective coefficients mapping OUTPUT coords -> INPUT coords.

    PIL's Image.transform(PERSPECTIVE) samples input at (ax+by+c)/(gx+hy+1).
    To paste src-quad -> dst-quad we need the inverse map (dst -> src).
    """
    a = []
    b = []
    for (x, y), (u, v) in zip(dst, src):
        a.append([x, y, 1, 0, 0, 0, -u * x, -u * y])
        a.append([0, 0, 0, x, y, 1, -v * x, -v * y])
        b.extend([u, v])
    return np.linalg.solve(np.asarray(a, np.float64), np.asarray(b, np.float64))


def _background(rng: random.Random, h: int, w: int,
                cluttered: bool) -> np.ndarray:
    """Desk-like BGR background with optional clutter rectangles."""
    npr = np.random.default_rng(rng.getrandbits(32))
    tone = np.array([rng.uniform(40, 120) for _ in range(3)], np.float32)
    img = np.empty((h, w, 3), np.float32)
    xs = np.linspace(-0.5, 0.5, w, dtype=np.float32)
    ys = np.linspace(-0.5, 0.5, h, dtype=np.float32)
    grad = (npr.uniform(-25, 25) * xs[None, :]
            + npr.uniform(-25, 25) * ys[:, None])
    for ch in range(3):
        img[..., ch] = tone[ch] + grad
    img += npr.normal(0, 4, (h, w, 1))
    n_items = rng.randint(3, 9) if cluttered else rng.randint(0, 2)
    pil = Image.fromarray(np.clip(img, 0, 255).astype(np.uint8))
    draw = ImageDraw.Draw(pil)
    for _ in range(n_items):
        x0 = rng.randint(0, w - 2)
        y0 = rng.randint(0, h - 2)
        x1 = min(w - 1, x0 + rng.randint(w // 20, w // 3))
        y1 = min(h - 1, y0 + rng.randint(h // 20, h // 3))
        col = tuple(int(np.clip(t + rng.uniform(-60, 90), 0, 255))
                    for t in tone)
        if rng.random() < 0.5:
            draw.rectangle([x0, y0, x1, y1], fill=col)
        else:
            draw.ellipse([x0, y0, x1, y1], fill=col)
    return np.asarray(pil, np.float32)


def render_scene(rng, size=(1512, 2016), category: str | None = None,
                 clues: int | None = None, grid_px: int | None = None):
    """One synthetic sudoku photograph.

    rng: random.Random or numpy Generator seed source.
    size: (H, W) of the output image.
    Returns (bgr uint8 (H, W, 3), truth dict with keys puzzle, solution,
    corners [tl,tr,br,bl in image coords], category, difficulty, clues).
    """
    if not isinstance(rng, random.Random):
        rng = random.Random(int(np.random.default_rng(
            rng if isinstance(rng, (int, np.integer)) else
            rng.integers(0, 2**31)).integers(0, 2**31)))
    h, w = size
    category = category or rng.choice(CATEGORIES)
    n_clues = clues or rng.randint(26, 38)
    difficulty = ("easy" if n_clues >= 34 else
                  "medium" if n_clues >= 29 else "hard")
    puzzle, solution = make_puzzle(rng, n_clues)

    # Page: render large enough that warped grid lines stay >= 1 px.
    short = min(h, w)
    gfrac = ((0.34, 0.42) if category == "far_away"
             else (0.55, 0.72))
    gpx = grid_px or int(short * rng.uniform(*gfrac))
    page, page_corners = render_page(
        puzzle, rng, grid_px=gpx, newsprint=(category == "newsprint"),
        handwritten=(category == "handwritten"))
    if category == "curved_page":
        page, page_corners = _cylinder_curve(page, page_corners, rng, gpx)
    if category == "facing_pages":
        # Open puzzle book: a decoy page with ANOTHER full sudoku grid
        # sits left of the target page across a shaded gutter (the
        # sample_4/sample_5 golden class — the decoy's crossings are a
        # real lattice that must not steal the extreme points). The
        # composition below pushes most of the decoy out of frame, so
        # the target grid stays dominant and the ground truth is
        # unambiguous.
        decoy_puzzle, _ = make_puzzle(rng, rng.randint(26, 38))
        decoy, _ = render_page(decoy_puzzle, rng, grid_px=gpx,
                               newsprint=False)
        gut = max(6, int(gpx * rng.uniform(0.04, 0.10)))
        ph0 = max(page.shape[0], decoy.shape[0])
        pw0 = decoy.shape[1] + gut + page.shape[1]
        spread = np.full((ph0, pw0), float(np.median(page)), np.float32)
        spread[:decoy.shape[0], :decoy.shape[1]] = decoy
        spread[:page.shape[0], decoy.shape[1] + gut:] = page
        # Spine shading: darken a band around the gutter (cosine falloff).
        x0 = decoy.shape[1] + gut / 2.0
        xs_p = np.arange(pw0, dtype=np.float32)
        shade = 1.0 - 0.45 * np.exp(-((xs_p - x0) / (gpx * 0.18)) ** 2)
        spread *= shade[None, :]
        page_corners = page_corners + np.array([decoy.shape[1] + gut, 0.0])
        focus = (np.array([decoy.shape[1] + gut, 0.0]),
                 np.array([page.shape[1], page.shape[0]], np.float64))
        page = spread
    else:
        focus = None
    ph, pw = page.shape

    # Target quad for the PAGE in the scene: centered, mild perspective.
    max_tilt = {"printed_skew": 0.18}.get(category, 0.08)
    if category == "printed_skew":
        angle = rng.uniform(-30, 30)
    elif category == "rotated":
        # Beyond the +-45-deg lattice bank: sideways / upside-down
        # photos (+-30-deg jitter keeps clear of the degenerate 45-deg
        # extreme-corner boundary). Exercises auto-orientation.
        angle = rng.choice([90, 180, 270]) + rng.uniform(-30, 30)
    else:
        angle = rng.uniform(-8, 8)
    theta = np.deg2rad(angle)
    rot = np.array([[np.cos(theta), -np.sin(theta)],
                    [np.sin(theta), np.cos(theta)]])
    if focus is None:
        f_orig = np.array([0.0, 0.0])
        f_size = np.array([pw, ph], np.float64)
    else:
        f_orig, f_size = focus
    # Scale/center so the FOCUS region (the target page; the whole page
    # unless a decoy spread extends it) fills the frame as usual — any
    # overhang (the facing page) runs off-frame like a real book photo.
    # The fit is measured on the ROTATED focus extents (identical to
    # f_size at angle 0) so quarter-turned pages don't overflow into
    # the corner clip and warp the quad.
    f_center = f_orig + f_size / 2.0
    f_half = np.array([[-f_size[0], -f_size[1]], [f_size[0], -f_size[1]],
                       [f_size[0], f_size[1]], [-f_size[0], f_size[1]]]) / 2.0
    ext = 2.0 * np.abs(f_half @ rot.T).max(axis=0)
    scale = min((w * 0.86) / ext[0], (h * 0.86) / ext[1])
    base = (np.array([[0.0, 0.0], [pw, 0.0], [pw, ph], [0.0, ph]])
            - f_center) * scale
    quad = base @ rot.T
    # Perspective jitter per corner (relative to the focus size so the
    # tilt of a wide spread matches a single page's).
    jit = np.array([[rng.uniform(-max_tilt, max_tilt) * f_size[0] * scale,
                     rng.uniform(-max_tilt, max_tilt) * f_size[1] * scale]
                    for _ in range(4)])
    quad = quad + jit + np.array([w / 2, h / 2])
    if focus is None:
        quad[:, 0] = np.clip(quad[:, 0], 4, w - 5)
        quad[:, 1] = np.clip(quad[:, 1], 4, h - 5)

    src_quad = [(0, 0), (pw, 0), (pw, ph), (0, ph)]
    coeffs = _persp_coeffs(src_quad, [tuple(p) for p in quad])

    # Warp page + its alpha mask into the scene.
    page_pil = Image.fromarray(np.clip(page, 0, 255).astype(np.uint8))
    mask_pil = Image.new("L", (pw, ph), 255)
    warped = page_pil.transform((w, h), Image.PERSPECTIVE, tuple(coeffs),
                                resample=Image.BILINEAR, fillcolor=0)
    warped_mask = mask_pil.transform((w, h), Image.PERSPECTIVE, tuple(coeffs),
                                     resample=Image.BILINEAR, fillcolor=0)
    bg = _background(rng, h, w, cluttered=(category == "cluttered"))
    alpha = np.asarray(warped_mask, np.float32)[..., None] / 255.0
    gray_page = np.asarray(warped, np.float32)
    # Slight warm paper tint (BGR).
    tint = np.array([rng.uniform(0.90, 1.0), rng.uniform(0.95, 1.0), 1.0],
                    np.float32)
    scene = bg * (1 - alpha) + gray_page[..., None] * tint * alpha

    # Grid corners in scene coords: forward map page->scene. coeffs give
    # scene->page; invert the homography for page->scene.
    m = np.array([[coeffs[0], coeffs[1], coeffs[2]],
                  [coeffs[3], coeffs[4], coeffs[5]],
                  [coeffs[6], coeffs[7], 1.0]])
    m_fwd = np.linalg.inv(m)
    pts = np.concatenate([page_corners, np.ones((4, 1))], axis=1) @ m_fwd.T
    corners = pts[:, :2] / pts[:, 2:3]

    if category == "occluded":
        scene = _draw_occluder(scene, corners, rng)

    # Category-specific photometrics.
    npr = np.random.default_rng(rng.getrandbits(32))
    if category == "low_light":
        scene = scene * rng.uniform(0.35, 0.55) + npr.normal(
            0, 6, scene.shape)
    elif category == "glare":
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        cx = rng.uniform(corners[:, 0].min(), corners[:, 0].max())
        cy = rng.uniform(corners[:, 1].min(), corners[:, 1].max())
        r2 = ((xx - cx) ** 2 + (yy - cy) ** 2) / (short * rng.uniform(
            0.08, 0.18)) ** 2
        scene = scene + np.exp(-r2)[..., None] * rng.uniform(60, 120)
    elif category == "shadow":
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        nx, ny = np.cos(theta + rng.uniform(0, 3.14)), np.sin(
            theta + rng.uniform(0, 3.14))
        d = (xx - w / 2) * nx + (yy - h / 2) * ny
        soft = 1.0 / (1.0 + np.exp(-d / (short * 0.03)))
        scene = scene * (rng.uniform(0.45, 0.7) + (1 - rng.uniform(
            0.45, 0.7)) * soft)[..., None]
    elif category == "screen":
        # Photographed display: raised black level / compressed
        # contrast (backlight), cool tint, low-frequency moire beat
        # bands (two near-frequency gratings) and a faint pixel-pitch
        # grating. Amplitudes sit well inside what the 11-px adaptive
        # threshold treats as smooth illumination.
        scene = scene * rng.uniform(0.62, 0.75) + rng.uniform(35, 60)
        scene *= np.array([rng.uniform(1.02, 1.08),   # B up (cool)
                           1.0,
                           rng.uniform(0.88, 0.96)],  # R down
                          np.float32)
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        ang = rng.uniform(0, 3.14)
        u = xx * np.cos(ang) + yy * np.sin(ang)
        f1 = rng.uniform(0.055, 0.085)
        f2 = f1 + rng.uniform(0.008, 0.016)  # beat period ~60-125 px
        moire = (np.sin(2 * np.pi * f1 * u) + np.sin(2 * np.pi * f2 * u))
        scene = scene + (rng.uniform(3, 6) * moire)[..., None]
        pitch = rng.uniform(2.6, 3.4)  # subpixel grating, mostly blurs out
        scene = scene + (1.5 * np.sin(2 * np.pi * xx / pitch))[..., None]
    if category == "motion_blur":
        # Camera shake: mean of K copies shifted along a random
        # direction (a length-K directional box kernel).
        klen = rng.randint(5, 11)
        ang = rng.uniform(0, 3.14)
        acc = np.zeros_like(scene)
        for t in range(klen):
            s = t - (klen - 1) / 2.0
            dy = int(round(s * np.sin(ang)))
            dx = int(round(s * np.cos(ang)))
            acc += np.roll(np.roll(scene, dy, axis=0), dx, axis=1)
        scene = acc / klen

    # Global blur + sensor noise.
    pil = Image.fromarray(np.clip(scene, 0, 255).astype(np.uint8))
    if rng.random() < 0.6:
        pil = pil.filter(ImageFilter.GaussianBlur(rng.uniform(0.3, 0.9)))
    out = np.asarray(pil, np.float32)
    out = np.clip(out + npr.normal(0, rng.uniform(1, 4), out.shape), 0, 255)

    truth = {
        "puzzle": "".join(str(d) for d in puzzle.reshape(-1)),
        "solution": "".join(str(d) for d in solution.reshape(-1)),
        "corners": corners.round(2).tolist(),
        "category": category,
        "difficulty": difficulty,
        "clues": int((puzzle > 0).sum()),
    }
    return out.astype(np.uint8), truth


# ---------------------------------------------------------------------------
# E2E set generation
# ---------------------------------------------------------------------------


def generate_e2e_set(out_dir: str, n: int = 24, seed: int = 1,
                     size=(1512, 2016)) -> list[dict]:
    """Write n scene JPEGs + per-case ground truth records.

    Cases cycle through CATEGORIES so every category is represented
    (reference e2e schema: tests/e2e_runner.py:193 category breakdown).
    """
    os.makedirs(out_dir, exist_ok=True)
    rng = random.Random(seed)
    records = []
    for i in range(n):
        category = CATEGORIES[i % len(CATEGORIES)]
        img, truth = render_scene(rng, size=size, category=category)
        name = f"scene_{i:03d}_{category}.jpg"
        path = os.path.join(out_dir, name)
        Image.fromarray(img[..., ::-1]).save(path, quality=92)
        records.append({
            "image_path": path,
            "puzzle": truth["puzzle"],
            "solution": truth["solution"],
            "metadata": {
                "category": truth["category"],
                "difficulty": truth["difficulty"],
                "clues": truth["clues"],
                "synthetic": True,
                "corners": truth["corners"],
            },
        })
    return records


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="full-scene sudoku generator")
    p.add_argument("--out", default="data/test_e2e/scenes")
    p.add_argument("--n", type=int, default=24)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--size", default="1512x2016",
                   help="HxW of generated photos")
    p.add_argument("--ground-truth", default=None,
                   help="merge records into this ground_truth.json")
    args = p.parse_args(argv)
    h, w = (int(t) for t in args.size.split("x"))
    records = generate_e2e_set(args.out, args.n, args.seed, (h, w))
    if args.ground_truth:
        gt = {"test_cases": []}
        if os.path.exists(args.ground_truth):
            with open(args.ground_truth) as f:
                gt = json.load(f)
        known = {c["image_path"] for c in gt["test_cases"]}
        gt["test_cases"].extend(
            r for r in records if r["image_path"] not in known)
        with open(args.ground_truth, "w") as f:
            json.dump(gt, f, indent=1)
    print(json.dumps({"written": len(records), "out": args.out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
