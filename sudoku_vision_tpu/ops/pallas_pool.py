"""Pallas TPU kernel: fused BGR->gray + area pooling at HBM speed-of-light.

`ops.pooled_gray` is the perception graph's single largest HBM consumer:
it is the one pass that must read the full ~30 MB decoded frame. The
best XLA formulation (luma dot_general -> reduce_window, ops/color.py)
measures 0.19 ms/frame at batch 32 because the 10-megapixel luma
intermediate is materialized (write + read adds ~80 MB of traffic).
This kernel streams the frame through VMEM once: 0.11 ms/frame measured
at batch 32 (within ~0.02 of the dispatch floor), bit-identical output.

Input layout is the key: the kernel wants the frame as ROW-PACKED BGR
(H, W*3) uint8 — the exact byte order decoders and cameras produce, so
host-side packing is a free np.reshape. On device, however,
(H, W, 3) -> (H, W*3) is NOT free: XLA retiles the minor dims (measured
0.17 ms/frame — more than the whole kernel), which is why the packed
layout is threaded through the pipeline (pipeline/graph.py::perceive
`packed_bgr=True`) instead of reshaping on device.

Kernel shape (per 128-row grid block, Mosaic v5e findings inline):
  * vertical f-pooling is a (128/f, 128) 0/1 matrix times the block on
    the MXU — sublane-strided slices are not legal Mosaic
    (vector.extract_strided_slice requires stride 1), a tiny matmul
    does the same reduction at full speed;
  * BGR luma weighting is one multiply by a lane-periodic (period-3)
    f32 row, passed in as a constant input;
  * horizontal pooling sums groups of g = 3f lanes with log2
    pltpu.roll chains in int32 (group totals need up to 27 bits —
    beyond the f32 mantissa; rolls are the Mosaic-supported lane
    rotate, forward shifts only);
  * every g-th lane then holds one output pixel; the stride-g lane
    compaction is left to XLA outside the kernel (measured at the
    dispatch floor; strided lane slices are not legal Mosaic either).

Exactness (provable, not approximate): uint8 -> int32 -> f32 casts are
value-exact, the f32 matmul/multiply products stay below 2^24
(vertical sums <= f*255, weights <= 9617 -> products <= f*255*9617 <
2^24 for f <= 4), and group sums run in int32. The kernel computes the
EXACT integer
   floor((sum_{f x f block} (1868*B + 9617*G + 4899*R) + 2^(s-1)) / 2^s),
s = 14 + 2*log2(f) — bit-identical to ops/color.py::pooled_gray, which
uses the same integer-exact formulation (asserted equal on CPU
interpret and real TPU in tests/test_pallas_pool.py). Only f in {2, 4}
qualifies (f = 8 pushes the products past 2^24).

Reference capability anchor: reference cv/preprocess.py:15 `grayscale`
(cv2 BT.601 fixed point) + pyramid downsampling; here both are one
memory-bound kernel because TPU HBM bandwidth, not ALU, is the budget.
"""

from __future__ import annotations

import os
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sudoku_vision_tpu.ops.color import _B2Y, _G2Y, _R2Y, _SHIFT

_BLOCK_ROWS = 128


def _group_sum_plan(g: int) -> tuple[list[int], list[tuple[int, int]]]:
    """Doubling shifts + (power, lane offset) terms so that
    out(l) = sum_{j<g} p(l + j) = sum_terms S_{2^k}(l + off)."""
    doublings = []
    p = 1
    while 2 * p <= g:
        doublings.append(p)  # S_{2p}(l) = S_p(l) + S_p(l + p)
        p *= 2
    terms = []
    off = 0
    rem = g
    while rem:
        k = 1 << (rem.bit_length() - 1)
        terms.append((k, off))
        off += k
        rem -= k
    return doublings, terms


def _kernel(pool_ref, w_ref, x_ref, out_ref, *, f: int):
    x = x_ref[:]  # (BLOCK_ROWS, W3) uint8
    # Vertical pool as an MXU matmul with a (BR/f, BR) 0/1 matrix: each
    # output row is the sum of its f source rows. Exact in f32 (operands
    # <= 255, row sums <= f*255 < 2^24).
    xf = x.astype(jnp.int32).astype(jnp.float32)
    s = jnp.dot(pool_ref[:], xf, preferred_element_type=jnp.float32)
    # Lane-periodic luma weighting; products <= f*255*9617 < 2^24 stay
    # exact in f32, then move to int32 for the wider group sums.
    p = (s * w_ref[:]).astype(jnp.int32)
    g = 3 * f
    w3 = p.shape[1]
    doublings, terms = _group_sum_plan(g)

    def left(arr, d):  # lane l <- lane l+d (Mosaic rolls are forward-only)
        return pltpu.roll(arr, (-d) % w3, axis=1)

    sums = {1: p}
    for d in doublings:
        sums[2 * d] = sums[d] + left(sums[d], d)
    acc = None
    for k, off in terms:
        t = left(sums[k], off) if off else sums[k]
        acc = t if acc is None else acc + t
    shift = _SHIFT + 2 * (f.bit_length() - 1)
    y = (acc + (1 << (shift - 1))) >> shift
    out_ref[:] = y.astype(jnp.uint8)


@lru_cache(maxsize=8)
def _weight_row(w3: int) -> np.ndarray:
    w = np.array([_B2Y, _G2Y, _R2Y], np.float32)
    return np.tile(w, w3 // 3)[None, :]


@lru_cache(maxsize=4)
def _pool_matrix(br: int, f: int) -> np.ndarray:
    p = np.zeros((br // f, br), np.float32)
    for u in range(br // f):
        p[u, u * f:(u + 1) * f] = 1.0
    return p


def pooled_gray_supported(h: int, w: int, f: int) -> bool:
    return f in (2, 4) and h % f == 0 and w % f == 0 and h >= f \
        and w * 3 >= 6 * f


def pack_bgr(img) -> np.ndarray:
    """(..., H, W, 3) uint8 -> (..., H, W*3) row-packed BGR. Free on
    host arrays (a view); forces a minor-dim retile on device arrays
    (0.17 ms/frame at 10 MP) — pack on host whenever possible."""
    return img.reshape(*img.shape[:-2], img.shape[-2] * 3)


def pooled_gray_packed(x2: jnp.ndarray, f: int,
                       interpret: bool | None = None,
                       block_rows: int | None = None) -> jnp.ndarray:
    """Row-packed BGR (H, W*3) uint8 -> (H//f, W//f) uint8 pooled gray.

    Pallas on TPU for f in {2, 4} with f-divisible H/W; XLA fallback
    (via the 3D pooled_gray) elsewhere — both integer-exact, identical.

    block_rows: grid-block height (default _BLOCK_ROWS). Any multiple
    of f is exact — each output row depends only on its own f source
    rows, so partial trailing blocks can't leak across the boundary.
    Raced on TPU at the 10-MP batch-32 shape: 128 / 256 / 512 within
    noise of each other (grid-step overhead is already hidden by the
    double-buffered DMA pipeline); kept at 128 for the smaller VMEM
    footprint.
    """
    from sudoku_vision_tpu.ops.color import pooled_gray
    from sudoku_vision_tpu.ops.pallas_lattice import on_tpu

    h, w3 = x2.shape
    w = w3 // 3
    use_pallas = (pooled_gray_supported(h, w, f)
                  and os.environ.get("SV_NO_PALLAS_POOL") != "1")
    if interpret is None:  # auto: compiled kernel on TPU, XLA elsewhere
        use_pallas = use_pallas and on_tpu()
        interpret = False
    if not use_pallas:
        return pooled_gray(x2.reshape(h, w, 3), f)

    br = block_rows or _BLOCK_ROWS
    if br <= 0 or br % f != 0:
        raise ValueError(
            f"block_rows={br} must be a positive multiple of f={f} "
            "(the br//f block specs silently mis-tile otherwise)")
    out = pl.pallas_call(
        partial(_kernel, f=f),
        out_shape=jax.ShapeDtypeStruct((h // f, w3), jnp.uint8),
        grid=(-(-h // br),),
        in_specs=[
            pl.BlockSpec((br // f, br), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((br, w3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br // f, w3), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(_pool_matrix(br, f)), jnp.asarray(_weight_row(w3)), x2)
    return out[:, :: 3 * f]


def pooled_gray_pallas(img: jnp.ndarray, f: int,
                       interpret: bool = False) -> jnp.ndarray:
    """uint8 (H, W, 3) BGR -> uint8 (H//f, W//f). NOTE: reshaping a
    device-resident 3D frame retiles it (0.17 ms/frame); prefer
    pooled_gray_packed with host-packed input on the hot path."""
    h, w, _ = img.shape
    assert pooled_gray_supported(h, w, f), (img.shape, f)
    x2 = img.reshape(h, w * 3)
    return pooled_gray_packed(x2, f, interpret=interpret)
