"""Procedural stroke-rendered digits — font diversity beyond system fonts.

The environment ships only the 6 DejaVu faces; real puzzle books use many
print styles (with/without serifs on '1', with/without crossbar on '7',
open/closed '4'...). This module draws digits as jittered polyline/bezier
strokes so the classifier sees glyph-shape variety the fonts can't
provide. Used by ml/generate_synthetic.py as an extra "font".
"""

from __future__ import annotations

import random

import numpy as np
from PIL import Image, ImageDraw


def _bezier(p0, p1, p2, n=12):
    t = np.linspace(0, 1, n)[:, None]
    pts = ((1 - t) ** 2 * np.array(p0) + 2 * (1 - t) * t * np.array(p1)
           + t ** 2 * np.array(p2))
    return [tuple(p) for p in pts]


def _digit_strokes(digit: int, rng: random.Random) -> list[list[tuple]]:
    """Strokes in normalized [0,1]^2 coords (x, y), y down."""
    j = lambda v, a=0.04: v + rng.uniform(-a, a)  # noqa: E731

    if digit == 1:
        # Flag length/steepness varies widely across print faces; long
        # steep flags are the ones classifiers confuse with 7 (whose bar
        # always spans the full top), so sample them aggressively.
        fx = rng.uniform(0.22, 0.38)
        fy = rng.uniform(0.22, 0.45)
        strokes = [[(j(fx, 0.02), j(fy, 0.02)), (j(0.52), j(0.12)),
                    (j(0.52), j(0.88))]]
        if rng.random() < 0.5:  # base serif
            strokes.append([(j(0.32), j(0.88)), (j(0.72), j(0.88))])
        if rng.random() < 0.25:  # bare stick variant
            strokes = [[(j(0.5), j(0.12)), (j(0.5), j(0.88))]]
        return strokes
    if digit == 2:
        return [
            _bezier((j(0.22), j(0.3)), (j(0.5), j(0.02)), (j(0.78), j(0.3)))
            + [(j(0.3), j(0.88))],
            [(j(0.28), j(0.88)), (j(0.8), j(0.88))],
        ]
    if digit == 3:
        return [
            _bezier((j(0.25), j(0.2)), (j(0.8), j(0.08)), (j(0.52), j(0.48))),
            _bezier((j(0.52), j(0.48)), (j(0.9), j(0.75)), (j(0.25), j(0.85))),
        ]
    if digit == 4:
        x = j(0.62)
        strokes = [[(x, j(0.1)), (j(0.2), j(0.62)), (j(0.85), j(0.62))],
                   [(x, j(0.35)), (x, j(0.9))]]
        return strokes
    if digit == 5:
        return [
            [(j(0.75), j(0.12)), (j(0.3), j(0.12)), (j(0.27), j(0.45))],
            _bezier((j(0.27), j(0.45)), (j(0.95), j(0.55)), (j(0.3), j(0.88))),
        ]
    if digit == 6:
        return [
            _bezier((j(0.7), j(0.1)), (j(0.25), j(0.35)), (j(0.28), j(0.65))),
            _bezier((j(0.28), j(0.5)), (j(0.85), j(0.5)), (j(0.62), j(0.9)))
            + _bezier((j(0.62), j(0.9)), (j(0.2), j(0.95)), (j(0.28), j(0.6))),
        ]
    if digit == 7:
        strokes = [[(j(0.2), j(0.14)), (j(0.8), j(0.14)), (j(0.42), j(0.9))]]
        if rng.random() < 0.35:  # European crossbar
            strokes.append([(j(0.33), j(0.5)), (j(0.67), j(0.5))])
        return strokes
    if digit == 8:
        return [
            _bezier((j(0.5), j(0.5)), (j(0.15), j(0.28)), (j(0.5), j(0.1)))
            + _bezier((j(0.5), j(0.1)), (j(0.85), j(0.28)), (j(0.5), j(0.5))),
            _bezier((j(0.5), j(0.5)), (j(0.12), j(0.72)), (j(0.5), j(0.92)))
            + _bezier((j(0.5), j(0.92)), (j(0.88), j(0.72)), (j(0.5), j(0.5))),
        ]
    if digit == 9:
        return [
            _bezier((j(0.72), j(0.35)), (j(0.25), j(0.05)), (j(0.3), j(0.4)))
            + _bezier((j(0.3), j(0.4)), (j(0.4), j(0.6)), (j(0.72), j(0.4))),
            [(j(0.72), j(0.18)), (j(0.72), j(0.55)), (j(0.55), j(0.9))],
        ]
    raise ValueError(digit)


def render_stroke_digit(digit: int, size: int,
                        rng: random.Random) -> np.ndarray:
    """Anti-aliased ink mask (0..1) of a stroke-rendered digit."""
    ss = 2  # supersample
    canvas = Image.new("L", (size * ss, size * ss), 0)
    draw = ImageDraw.Draw(canvas)
    scale = size * ss * rng.uniform(0.55, 0.8)
    ox = (size * ss - scale) / 2 + rng.uniform(-0.05, 0.05) * size * ss
    oy = (size * ss - scale) / 2 + rng.uniform(-0.05, 0.05) * size * ss
    width = max(2, int(size * ss * rng.uniform(0.04, 0.10)))
    for stroke in _digit_strokes(digit, rng):
        pts = [(ox + x * scale, oy + y * scale) for x, y in stroke]
        draw.line(pts, fill=255, width=width, joint="curve")
        # round caps
        r = width / 2
        for (x, y) in (pts[0], pts[-1]):
            draw.ellipse([x - r, y - r, x + r, y + r], fill=255)
    small = canvas.resize((size, size), Image.BILINEAR)
    return np.asarray(small, np.float32) / 255.0
