"""Solution overlay rendering (host-side, PIL — no OpenCV dependency).

Capability parity with the reference's visualization (reference
pipeline/overlay.py:22 create_solution_overlay: 3-panel composite
original | warped | solution grid with color-coded digits — black =
recognized clue, blue = solved fill-in, red = low-confidence <0.7; and
:104 create_debug_overlay: per-cell confidence-colored grid).
"""

from __future__ import annotations

import numpy as np
from PIL import Image, ImageDraw, ImageFont

from sudoku_vision_tpu.utils.cv_ref import warp_perspective_np
from sudoku_vision_tpu.ops.warp import homography_np

_PANEL = 450
_CELL = _PANEL // 9

# BGR colors (API keeps the reference's BGR framing).
_BLACK = (0, 0, 0)
_BLUE = (200, 80, 0)
_RED = (40, 40, 230)
_GREEN = (60, 180, 60)
_YELLOW = (40, 200, 230)


def _font(size: int):
    try:
        return ImageFont.truetype(
            "/usr/share/fonts/truetype/dejavu/DejaVuSans-Bold.ttf", size)
    except OSError:
        return ImageFont.load_default()


def _draw_grid_panel(draw: ImageDraw.ImageDraw, x0: int):
    for i in range(10):
        width = 3 if i % 3 == 0 else 1
        draw.line([(x0 + i * _CELL, 0), (x0 + i * _CELL, _PANEL)],
                  fill=(80, 80, 80), width=width)
        draw.line([(x0, i * _CELL), (x0 + _PANEL, i * _CELL)],
                  fill=(80, 80, 80), width=width)


def _bgr_to_pil(img_bgr: np.ndarray) -> Image.Image:
    return Image.fromarray(img_bgr[..., ::-1])


def create_solution_overlay(
    img_bgr: np.ndarray,
    recognized: np.ndarray,
    solved: np.ndarray,
    corners: np.ndarray,
    confidence: np.ndarray,
    confidence_threshold: float = 0.7,
) -> np.ndarray:
    """3-panel composite, returns uint8 BGR (450, 1350, 3)."""
    # Panel 1: original (resized) with the detected quad.
    orig = _bgr_to_pil(img_bgr).resize((_PANEL, _PANEL))
    sx = _PANEL / img_bgr.shape[1]
    sy = _PANEL / img_bgr.shape[0]
    d1 = ImageDraw.Draw(orig)
    quad = [(float(x) * sx, float(y) * sy) for x, y in corners]
    d1.polygon(quad, outline=(0, 200, 0), width=3)

    # Panel 2: rectified grid.
    gray = img_bgr if img_bgr.ndim == 2 else np.round(
        0.114 * img_bgr[..., 0] + 0.587 * img_bgr[..., 1]
        + 0.299 * img_bgr[..., 2]).astype(np.uint8)
    m = homography_np(np.asarray(corners, np.float64), (_PANEL, _PANEL))
    warped = warp_perspective_np(gray, m, (_PANEL, _PANEL))
    warped_im = Image.fromarray(warped).convert("RGB")

    # Panel 3: solution grid.
    board = Image.new("RGB", (_PANEL, _PANEL), (255, 255, 255))
    d3 = ImageDraw.Draw(board)
    _draw_grid_panel(d3, 0)
    font = _font(int(_CELL * 0.6))
    for r in range(9):
        for c in range(9):
            val = int(solved[r, c]) if solved is not None else int(
                recognized[r, c])
            if val == 0:
                continue
            if recognized[r, c] != 0:
                color = (_RED if confidence[r, c] < confidence_threshold
                         else _BLACK)
            else:
                color = _BLUE
            d3.text((c * _CELL + _CELL // 2, r * _CELL + _CELL // 2),
                    str(val), fill=color[::-1], font=font, anchor="mm")

    combo = Image.new("RGB", (_PANEL * 3, _PANEL))
    combo.paste(orig, (0, 0))
    combo.paste(warped_im, (_PANEL, 0))
    combo.paste(board, (_PANEL * 2, 0))
    return np.asarray(combo)[..., ::-1].copy()


def create_debug_overlay(
    cells: np.ndarray,
    digits: np.ndarray,
    confidence: np.ndarray,
) -> np.ndarray:
    """Per-cell debug grid with confidence-colored borders
    (reference pipeline/overlay.py:104). cells: (81, S, S) u8."""
    s = cells.shape[-1]
    pad = 4
    tile = s + 2 * pad
    canvas = Image.new("RGB", (9 * tile, 9 * tile), (30, 30, 30))
    draw = ImageDraw.Draw(canvas)
    font = _font(12)
    digits = np.asarray(digits).reshape(9, 9)
    confidence = np.asarray(confidence).reshape(9, 9)
    for r in range(9):
        for c in range(9):
            conf = float(confidence[r, c])
            color = (_GREEN if conf >= 0.9 else
                     _YELLOW if conf >= 0.7 else _RED)
            x0, y0 = c * tile, r * tile
            draw.rectangle([x0, y0, x0 + tile - 1, y0 + tile - 1],
                           outline=color[::-1], width=2)
            cell_im = Image.fromarray(cells[r * 9 + c]).convert("RGB")
            canvas.paste(cell_im, (x0 + pad, y0 + pad))
            draw.text((x0 + 3, y0 + 1), f"{digits[r, c]}",
                      fill=color[::-1], font=font)
    return np.asarray(canvas)[..., ::-1].copy()
