"""OpenCV-parity image kernels in pure JAX (lax/jnp, Pallas for hot paths).

Every op is jit-friendly, shape-static, and written for the TPU VPU/MXU:
separable filters are slice-multiply-accumulate chains (no host loops),
histograms use fixed 256-bin bincounts, warps are gather-based bilinear
sampling. Integer ops replicate OpenCV 5.0's exact arithmetic (verified
bit-for-bit in tests/test_ops_parity.py) so the perception pipeline can
match the CPU reference at the cell level.
"""

from sudoku_vision_tpu.ops.color import bgr_to_gray, pooled_gray, rgb_to_gray
from sudoku_vision_tpu.ops.filters import (
    box_filter_sum,
    box_mean_u8,
    gaussian_blur_u8,
    gaussian_kernel_fixed,
    sep_filter_int,
)
from sudoku_vision_tpu.ops.threshold import (
    adaptive_threshold,
    otsu_threshold,
    sauvola_threshold,
    threshold_binary,
)
from sudoku_vision_tpu.ops.morphology import (
    close_,
    dilate,
    erode,
    morphological_cleanup,
    open_,
)
from sudoku_vision_tpu.ops.clahe import clahe
from sudoku_vision_tpu.ops.resize import resize_bilinear_u8
from sudoku_vision_tpu.ops.warp import (
    homography_from_corners,
    warp_perspective,
    warp_extract_cells,
)
from sudoku_vision_tpu.ops.hist import histogram256

__all__ = [
    "bgr_to_gray", "pooled_gray", "rgb_to_gray",
    "box_filter_sum", "box_mean_u8", "gaussian_blur_u8",
    "gaussian_kernel_fixed", "sep_filter_int",
    "adaptive_threshold", "otsu_threshold", "sauvola_threshold",
    "threshold_binary",
    "erode", "dilate", "open_", "close_", "morphological_cleanup",
    "clahe", "resize_bilinear_u8",
    "homography_from_corners", "warp_perspective", "warp_extract_cells",
    "histogram256",
]
