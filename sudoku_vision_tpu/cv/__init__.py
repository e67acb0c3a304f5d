"""On-device CV layer: preprocessing, grid detection, extraction, quality.

Capability map to the reference cv/ package (reference cv/__init__.py:8-18):
grayscale/blur/threshold -> preprocess.preprocess_for_grid_detection,
find_grid_contour/order_points -> grid.detect_grid (reformulated as
connected-component + extreme-point corner finding — contour walks don't
vectorize; label propagation does), warp_perspective/extract_cells ->
extract.extract_cells (fused gather).
"""

from sudoku_vision_tpu.cv.preprocess import preprocess_for_grid_detection
from sudoku_vision_tpu.cv.grid import detect_grid, order_corners
from sudoku_vision_tpu.cv.extract import extract_cells, preprocess_cells_for_model

__all__ = [
    "preprocess_for_grid_detection",
    "detect_grid",
    "order_corners",
    "extract_cells",
    "preprocess_cells_for_model",
]
