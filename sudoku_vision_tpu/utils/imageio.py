"""Host image IO via PIL (the framework core never imports OpenCV)."""

from __future__ import annotations

import numpy as np
from PIL import Image


def load_bgr(path: str) -> np.ndarray:
    """Load an image file as uint8 (H, W, 3) BGR (reference pipelines use
    BGR framing from cv2.imread; we keep that convention at the API edge)."""
    with Image.open(path) as im:
        rgb = np.asarray(im.convert("RGB"), dtype=np.uint8)
    return rgb[..., ::-1].copy()


def save_image(path: str, img: np.ndarray) -> None:
    """Save uint8 image; 3-channel input is interpreted as BGR."""
    arr = img[..., ::-1] if img.ndim == 3 else img
    Image.fromarray(arr).save(path)
