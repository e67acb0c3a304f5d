"""Perspective warp and fused 81-cell extraction.

Parity target: cv2.getPerspectiveTransform + cv2.warpPerspective
(INTER_LINEAR, constant 0 border) as used by the reference to rectify the
detected grid to 450x450 (reference cv/grid.py:94, cv/grid_v2.py:511).
OpenCV 5's warp is float bilinear at unquantized inverse-mapped coordinates
rounded half-to-even — bit-exact reproducible (tests/test_ops_parity.py)
when the inverse homography is computed in float64.

Two paths:
  * warp_perspective: the parity path (full 450x450 rectified image).
  * warp_extract_cells: the TPU fast path — composes the per-cell resize
    sampling grid with the homography so the (81, 28, 28) CNN input is one
    fused gather from the raw frame, no 450x450 intermediate. This is the
    batched replacement for the reference's warp -> per-cell crop -> resize
    chain (reference cv/extract.py:13).
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from sudoku_vision_tpu.ops.resize import _axis_plan


def homography_from_corners(
    corners: jnp.ndarray, out_hw: tuple[int, int]
) -> jnp.ndarray:
    """DLT solve mapping 4 ordered corners (tl,tr,br,bl) -> output rect.

    Returns the 3x3 matrix H with dst ~ H @ src (cv2.getPerspectiveTransform
    convention). corners: (..., 4, 2) float (x, y). Batched over leading
    dims. Solve runs in float32 on device; for bit-parity with OpenCV use
    homography_np (float64 host math).
    """
    h, w = out_hw
    dst = jnp.asarray(
        [[0.0, 0.0], [w - 1.0, 0.0], [w - 1.0, h - 1.0], [0.0, h - 1.0]],
        dtype=jnp.float32,
    )
    src = corners.astype(jnp.float32)
    dst = jnp.broadcast_to(dst, src.shape)
    x, y = src[..., 0], src[..., 1]
    u, v = dst[..., 0], dst[..., 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    rows_u = jnp.stack([x, y, one, zero, zero, zero, -u * x, -u * y], axis=-1)
    rows_v = jnp.stack([zero, zero, zero, x, y, one, -v * x, -v * y], axis=-1)
    a = jnp.concatenate([rows_u, rows_v], axis=-2)  # (..., 8, 8)
    b = jnp.concatenate([u, v], axis=-1)[..., None]  # (..., 8, 1)
    sol = jnp.linalg.solve(a, b)[..., 0]
    ones = jnp.ones(sol.shape[:-1] + (1,), sol.dtype)
    return jnp.concatenate([sol, ones], axis=-1).reshape(
        sol.shape[:-1] + (3, 3))


def homography_np(corners: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """Float64 host-side homography (cv2.getPerspectiveTransform parity)."""
    h, w = out_hw
    dst = np.array(
        [[0.0, 0.0], [w - 1.0, 0.0], [w - 1.0, h - 1.0], [0.0, h - 1.0]])
    src = np.asarray(corners, dtype=np.float64).reshape(4, 2)
    a = np.zeros((8, 8))
    b = np.zeros(8)
    for i in range(4):
        x, y = src[i]
        u, v = dst[i]
        a[2 * i] = [x, y, 1, 0, 0, 0, -u * x, -u * y]
        a[2 * i + 1] = [0, 0, 0, x, y, 1, -v * x, -v * y]
        b[2 * i], b[2 * i + 1] = u, v
    sol = np.linalg.solve(a, b)
    return np.append(sol, 1.0).reshape(3, 3)


def nearest_sample_u8(
    img: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray
) -> jnp.ndarray:
    """Nearest-neighbor sampling (1 gather/px instead of 4).

    Measured on the golden set: identical digit output to bilinear after
    the binarizing cell preprocessing (CLAHE + adaptive threshold kills
    subpixel detail), at ~1.3x pipeline throughput — used by the fused
    perception fast path; parity-sensitive callers keep bilinear.
    """
    h, w = img.shape[-2], img.shape[-1]
    flat = img.reshape(img.shape[:-2] + (-1,))
    xi = jnp.clip(jnp.rint(xs).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.rint(ys).astype(jnp.int32), 0, h - 1)
    inb = (xs >= -0.5) & (xs < w - 0.5) & (ys >= -0.5) & (ys < h - 0.5)
    return jnp.where(inb, jnp.take(flat, yi * w + xi, axis=-1), 0).astype(
        jnp.uint8)


def bilinear_sample_u8(
    img: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray
) -> jnp.ndarray:
    """Sample uint8 (H, W) at float coords; constant-0 border; cv2 rounding.

    xs/ys may be any (equal) shape; returns uint8 of that shape.
    """
    h, w = img.shape[-2], img.shape[-1]
    flat = img.reshape(img.shape[:-2] + (-1,)).astype(jnp.float32)
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    fx = (xs - x0).astype(jnp.float32)
    fy = (ys - y0).astype(jnp.float32)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    acc = jnp.zeros(jnp.broadcast_shapes(xs.shape, ys.shape), jnp.float32)
    for dy in (0, 1):
        for dx in (0, 1):
            xx = x0i + dx
            yy = y0i + dy
            inb = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
            idx = jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1)
            pix = jnp.where(inb, jnp.take(flat, idx, axis=-1), 0.0)
            wgt = (fy if dy else 1.0 - fy) * (fx if dx else 1.0 - fx)
            acc = acc + pix * wgt
    return jnp.clip(jnp.rint(acc), 0, 255).astype(jnp.uint8)


def scanline_sample_cells_u8(
    img: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray
) -> jnp.ndarray:
    """Nearest-neighbor cell sampling with ~3x fewer gather offsets.

    Gathers on this runtime cost ~10 ns per OFFSET regardless of slice
    bytes (measured; a (81, 28, 28) nearest extraction = 63.5K offsets
    = ~0.65 ms/frame, the single most expensive perception stage). This
    sampler restructures the same warp so the gather count drops to one
    offset per OUTPUT ROW (2268), with everything else as dense VPU/MXU
    work:

      1. Global y-shear of the image by round(q*x) per column (q = the
         least-squares slope of the 2268 output-row source lines, i.e.
         the grid rotation). A warped row is a straight source line, so
         after the shear every output row lies in ~one image row
         (residual = per-cell perspective deviation from the global
         slope, sub-pixel for camera shots). The shear itself is 11
         select+static-roll stages over the whole image — ~0.4 MB per
         stage, essentially free.
      2. One row-gather (jnp.take along axis 0) of the 81*28 source
         rows: the only gather, at row granularity.
      3. Exact per-sample x selection as two tiny one-hot contractions
         (mixed-radix factorization of the column index: x = 16*hi+lo),
         which the MXU/VPU eats instead of 63K scalar offsets.

    vs nearest_sample_u8 the picks can differ by +-1 source pixel where
    the rounding of the shear or the row mean crosses half-pixel
    boundaries (A/B on the golden+synthetic e2e corpus: identical
    digits — the binarizing cell preprocessing absorbs it). Requires
    |grid rotation| <= ~45 deg (|q| <= 1), which is also the detector's
    lattice-bank range.

    xs/ys: (81, co, co) float32 source sample coordinates.
    """
    h, w = img.shape
    n, co = xs.shape[0], xs.shape[1]
    # Least-squares slope of all output-row lines: dy = q * dx.
    dy = ys[:, :, -1] - ys[:, :, 0]
    dx = xs[:, :, -1] - xs[:, :, 0]
    q = jnp.sum(dy * dx) / jnp.maximum(jnp.sum(dx * dx), 1e-6)
    cols = jnp.arange(w, dtype=jnp.float32)
    g = jnp.rint(q * cols).astype(jnp.int32)
    gmin = jnp.min(g)
    shift = g - gmin                     # per-column upward shift >= 0
    sh = img
    for k in range(11):                  # covers |q| <= 1 up to w = 2048
        bit = ((shift >> k) & 1).astype(bool)[None, :]
        sh = jnp.where(bit, jnp.roll(sh, -(1 << k), axis=0), sh)
    # Row index per output row in the sheared image (mean over j of the
    # per-sample residual row — sub-pixel spread by construction).
    gq = jnp.rint(q * jnp.rint(xs))
    # Row in the sheared image: y1 = Y - shift(X) = Y - g(X) + gmin.
    y1f = ys - gq + gmin.astype(jnp.float32)
    # The shear rolls cyclically, so per column the row map is a
    # bijection mod h — index modulo, never clip (a clip misreads every
    # sample the shear wrapped past an image edge).
    y1 = jnp.mod(jnp.rint(jnp.mean(y1f, axis=2)).astype(jnp.int32), h)
    rows = jnp.take(sh, y1.reshape(-1), axis=0).reshape(n, co, w)
    xi = jnp.clip(jnp.rint(xs).astype(jnp.int32), 0, w - 1)
    from sudoku_vision_tpu.ops.pallas_lattice import on_tpu

    if on_tpu() and os.environ.get("SV_PALLAS_PICK") == "1":
        # Pallas in-row pick with one-hots built and consumed in VMEM
        # (ops/pallas_pick.py). Opt-in only: measured 1386 fps vs the
        # XLA path's 1447 on the batch-32 production bench — the
        # einsum one-hots fuse well enough that HBM traffic was never
        # the bottleneck, and the kernel pays VPU one-hot construction
        # per row block. Kept as the template for in-VMEM gather work.
        from sudoku_vision_tpu.ops.pallas_pick import pick_columns_u8

        out = pick_columns_u8(rows.reshape(n * co, w),
                              xi.reshape(n * co, co)).reshape(n, co, co)
    else:
        # Exact x pick: factored one-hot over columns (w padded to
        # rlo*rhi). rlo = 128 puts the first contraction's output minor
        # dim at the full lane width (an rlo of 16 wasted 7/8 of every
        # lane register — measured 10% slower on the batch-32 production
        # shapes; results are bit-identical, it is pure layout).
        rlo = 128
        rhi = -(-w // rlo)
        pad = rhi * rlo - w
        rows_p = jnp.pad(rows, ((0, 0), (0, 0), (0, pad))) if pad else rows
        xhi, xlo = xi // rlo, xi % rlo
        whi = (xhi[..., None] == jnp.arange(rhi)[None, None, None, :]
               ).astype(jnp.bfloat16)                    # (n, co, co, rhi)
        wlo = (xlo[..., None] == jnp.arange(rlo)[None, None, None, :]
               ).astype(jnp.bfloat16)                    # (n, co, co, rlo)
        rhl = rows_p.reshape(n, co, rhi, rlo).astype(jnp.bfloat16)
        # Contract the LANE one-hot first: the (n, co, co, rhi)
        # intermediate is bf16 ~1 MB/frame vs ~16 MB for the
        # hi-first order's (n, co, co, rlo) — the one-hots themselves
        # fuse into the dots, so the materialized intermediate is the
        # whole HBM cost. Bit-identical (each sum has exactly one
        # nonzero term; values <= 255 are exact in bf16).
        t1 = jnp.einsum("cihl,cijl->cijh", rhl, wlo)
        out = jnp.einsum("cijh,cijh->cij", t1, whi)
    # Out-of-bounds samples -> 0 (same contract as nearest_sample_u8).
    inb = (xs >= -0.5) & (xs < w - 0.5) & (ys >= -0.5) & (ys < h - 0.5)
    return jnp.where(inb, jnp.clip(out, 0, 255), 0).astype(jnp.uint8)


def _project(m_inv: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray):
    """Apply inverse homography to dst pixel coords -> src coords."""
    den = m_inv[2, 0] * xs + m_inv[2, 1] * ys + m_inv[2, 2]
    sx = (m_inv[0, 0] * xs + m_inv[0, 1] * ys + m_inv[0, 2]) / den
    sy = (m_inv[1, 0] * xs + m_inv[1, 1] * ys + m_inv[1, 2]) / den
    return sx, sy


def warp_perspective(
    img: jnp.ndarray,
    m: jnp.ndarray,
    out_hw: tuple[int, int],
    inverse: bool = False,
) -> jnp.ndarray:
    """cv2.warpPerspective(INTER_LINEAR, BORDER_CONSTANT 0) for uint8 (H, W).

    m maps src->dst (cv2 convention) unless inverse=True (m already
    dst->src). For bit-exactness pass an inverse computed in float64
    (np.linalg.inv on host) with inverse=True; the in-graph f32 inversion
    is within +/-1 intensity of cv2 on a handful of pixels.
    """
    oh, ow = out_hw
    m = jnp.asarray(m, jnp.float32)
    m_inv = m if inverse else jnp.linalg.inv(m)
    ys, xs = jnp.mgrid[0:oh, 0:ow]
    sx, sy = _project(m_inv, xs.astype(jnp.float32), ys.astype(jnp.float32))
    return bilinear_sample_u8(img, sx, sy)


@lru_cache(maxsize=None)
def _cell_sample_positions(
    warp_size: int, cell_out: int, margin_frac: float
) -> np.ndarray:
    """Warped-space sample positions for all 81 cells, one axis.

    Per cell: crop [c*cs + margin, (c+1)*cs - margin) then the cv2 resize
    half-pixel sampling grid to cell_out px. Returns (9, cell_out) float32
    positions in warped coordinates.
    """
    cs = warp_size // 9
    margin = int(cs * margin_frac)
    crop = cs - 2 * margin
    i0, i1, w0, w1 = _axis_plan(crop, cell_out)
    # Effective float position = i0 + w1/2048 (w1 is the frac weight).
    pos = i0.astype(np.float64) + w1.astype(np.float64) / 2048.0
    base = np.arange(9, dtype=np.float64)[:, None] * cs + margin
    return (base + pos[None, :]).astype(np.float32)


def warp_extract_cells(
    img: jnp.ndarray,
    m_inv: jnp.ndarray,
    warp_size: int = 450,
    cell_out: int = 28,
    margin_frac: float = 0.10,
    boundaries_y: jnp.ndarray | None = None,
    boundaries_x: jnp.ndarray | None = None,
    sample_mode: str = "bilinear",
) -> jnp.ndarray:
    """Fused rectify + 81-cell crop + resize: (H, W) u8 -> (81, co, co) u8.

    m_inv maps warped-space -> source-frame coords (inverse homography).
    Composes the reference's three stages (warp_perspective 450x450 ->
    per-cell 10%-margin crop -> 28x28 resize, reference cv/extract.py:13)
    into a single gather of 81*cell_out^2 samples from the raw frame.

    boundaries_y/x: optional (10,) refined grid-line positions in warped
    space (see cv.extract.refine_boundaries) — cells are cropped between
    the detected lines instead of the uniform 9x9 split, correcting page
    curvature the single homography can't model.
    """
    if boundaries_y is None:
        pos = jnp.asarray(
            _cell_sample_positions(warp_size, cell_out, margin_frac))
        pos_y = pos_x = pos
    else:
        # Per-cell fractional sampling template in [margin, 1-margin).
        cs = warp_size // 9
        margin = int(cs * margin_frac)
        crop = cs - 2 * margin
        i0, _, _, w1 = _axis_plan(crop, cell_out)
        frac = ((margin + i0.astype(np.float64)
                 + w1.astype(np.float64) / 2048.0) / cs).astype(np.float32)
        frac = jnp.asarray(frac)  # (co,) in (0, 1)
        lo_y = boundaries_y[:9][:, None]
        hi_y = boundaries_y[1:][:, None]
        pos_y = lo_y + (hi_y - lo_y) * frac[None, :]      # (9, co)
        lo_x = boundaries_x[:9][:, None]
        hi_x = boundaries_x[1:][:, None]
        pos_x = lo_x + (hi_x - lo_x) * frac[None, :]
    # (9, co) positions per axis -> full (81, co, co) sample grid.
    wy = pos_y[:, None, :, None]  # (9, 1, co, 1)
    wx = pos_x[None, :, None, :]  # (1, 9, 1, co)
    wyf = jnp.broadcast_to(wy, (9, 9, cell_out, cell_out))
    wxf = jnp.broadcast_to(wx, (9, 9, cell_out, cell_out))
    sx, sy = _project(jnp.asarray(m_inv, jnp.float32), wxf, wyf)
    if sample_mode == "scanline":
        return scanline_sample_cells_u8(
            img, sx.reshape(81, cell_out, cell_out),
            sy.reshape(81, cell_out, cell_out))
    sampler = (nearest_sample_u8 if sample_mode == "nearest"
               else bilinear_sample_u8)
    cells = sampler(img, sx, sy)
    return cells.reshape(81, cell_out, cell_out)
