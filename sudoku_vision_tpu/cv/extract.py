"""81-cell extraction + model-input preprocessing, fully on device.

Reference contract: warp to 450x450, split 9x9 with a 10% margin crop,
resize each cell to 28x28 (reference cv/extract.py:13), Otsu-based empty
detection with a <2% ink-ratio rule (cv/extract.py:59), and the canonical
CNN input preproc CLAHE(2.0, 4x4) -> adaptive threshold(11, 2) -> invert
-> scale (reference ml/datasets.py:18, pipeline/run.py:73 — training and
inference MUST share this).

TPU design: the warp+crop+resize chain is one fused gather
(ops.warp_extract_cells); the 81 cells then ride a single (81, 28, 28)
batch through CLAHE/threshold/normalize — the reference's 81-iteration
Python loop (run.py:122-150) becomes one vectorized op chain.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sudoku_vision_tpu import ops
from sudoku_vision_tpu.ops.hist import histogram256_batched


def extract_cells(
    img_gray: jnp.ndarray,
    m_inv: jnp.ndarray,
    warp_size: int = 450,
    cell_size: int = 28,
    margin_frac: float = 0.10,
    boundaries_y: jnp.ndarray | None = None,
    boundaries_x: jnp.ndarray | None = None,
    sample_mode: str = "bilinear",
) -> jnp.ndarray:
    """(H, W) u8 + inverse homography -> (81, 28, 28) u8 cell images."""
    return ops.warp_extract_cells(
        img_gray, m_inv, warp_size, cell_size, margin_frac,
        boundaries_y, boundaries_x, sample_mode)


def refine_boundaries(
    lat_h: jnp.ndarray,
    lat_v: jnp.ndarray,
    m_inv: jnp.ndarray,
    ds: int,
    warp_size: int = 450,
    window: int = 16,
    n_along: int = 36,
    n_across: int = 9,
    comb: bool = True,
    comb_step: float = 4.0,
    comb_along: int = 4,
    comb_astep: float = 3.0,
    comb_dstep: float = 1.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Snap the 10 nominal grid-line positions to the detected lattice.

    A single homography cannot model page curvature: interior grid lines
    drift several px from their nominal warp positions, leaking grid-line
    ink into cell crops. For each nominal boundary (0, 50, ..., 450) this
    samples the matching detection lattice (h/v line families at detect
    scale, from cv.grid.detect_grid_full) on a band of ``n_across``
    offsets spanning +-window px around the line x ``n_along`` positions
    along it — all in WARPED space — and moves the boundary to the
    band's mass centroid. Returns ((10,), (10,)) refined y and x
    boundary positions in warped coordinates.

    TPU note: gathers cost ~10 ns/element regardless of table size
    (measured; pooling the lattice table does NOT help), so the sample
    grid is banded around the 10 lines (10*9*36 points/axis) instead of
    a dense profile (150x150). Density was tuned on TPU against the
    golden set: 64x11 -> 36x9 saves 0.08 ms/frame with bit-identical
    digits; 32x11 and below starts flipping marginal cells (the
    centroid noise exceeds the snap margin). Validated by the 29-scene
    golden gate (curvature categories included).

    SKEW-AWARE ANCHORING (round 5): bands were formerly centered on the
    nominal positions themselves, which silently assumes the detected
    corners are right. When a corner pair is stolen by a decoy edge
    (sweep 7000 s121_printed_skew: the page's right edge displaced
    TR/BR ~66 px outward), the true lines drift off nominal
    CUMULATIVELY — by mid-grid they leave the +-window band and the
    snap aliases onto the NEIGHBORING line, shifting every crop past
    it by one cell. So each axis first fits a global 10-line comb
    (offset a, spacing d) to a coarse lattice-mass profile over
    [-margin, warp+margin], and the bands anchor on the comb. The comb
    only ENGAGES when it beats the nominal comb (a=0, d=warp/9) by
    >= 2 full lines of evidence — normal scenes (including curvature
    bow, which the band centroid absorbs) keep nominal anchors and
    bit-identical behavior; a stolen corner scores ~9 vs ~2 and
    engages. A small deviation penalty breaks decoy ties toward
    nominal. The reference never snaps (fixed 450/9 splits, reference
    cv/extract.py:13) so it never mis-snaps — but it also never
    recovers the true lattice; the comb does both.
    """
    nominal = jnp.arange(10, dtype=jnp.float32) * (warp_size / 9.0)
    # (10, n_across) offsets spanning +-window around each anchor.
    offs = jnp.linspace(-window, window, n_across, dtype=jnp.float32)
    along = (jnp.arange(n_along, dtype=jnp.float32) + 0.5) \
        * (warp_size / n_along)                             # (L,)
    m = jnp.asarray(m_inv, jnp.float32)

    # BOTH axes ride every gather together (axis 0 = horizontal lines
    # in lat_h, axis 1 = vertical lines in lat_v): the two lattices
    # stack into one flat table and the axis index folds into the
    # gather offset. Per-axis sampling ran refine at 2x the kernel
    # launches for the same element count (raced on TPU, round 5:
    # fusing the axes + the coarser comb profile params recovers about
    # half of the comb's 0.024 ms/frame cost). comb_step 4 px is the
    # COARSEST profile that still engages on the stolen-edge fixture
    # (3 px lines vanish into an 8 px-bin profile and the engage
    # margin dies — tests/test_grid_detect.py); don't raise it for
    # throughput without re-running that test and the s121 sweep.
    h, w = lat_h.shape
    flat2 = jnp.concatenate([
        lat_h.reshape(-1).astype(jnp.float32),
        lat_v.reshape(-1).astype(jnp.float32)])
    ax_base = (jnp.arange(2) * (h * w)).astype(jnp.int32)

    def sample_axes(gx, gy):
        """(2, ...) warped coords -> lattice mass, axis k from table k."""
        den = m[2, 0] * gx + m[2, 1] * gy + m[2, 2]
        sx = (m[0, 0] * gx + m[0, 1] * gy + m[0, 2]) / den / ds
        sy = (m[1, 0] * gx + m[1, 1] * gy + m[1, 2]) / den / ds
        xi = jnp.clip(jnp.rint(sx).astype(jnp.int32), 0, w - 1)
        yi = jnp.clip(jnp.rint(sy).astype(jnp.int32), 0, h - 1)
        inb = (sx >= 0) & (sx < w) & (sy >= 0) & (sy < h)
        base = ax_base.reshape((2,) + (1,) * (gx.ndim - 1))
        idx = (base + yi * w + xi).reshape(-1)
        return jnp.where(inb, jnp.take(flat2, idx).reshape(gx.shape), 0.0)

    def swapstack(a0x, a0y):
        """Coords for axis 0 as (x, y); axis 1 gets them SWAPPED (a
        horizontal line varies y across / x along; vertical vice
        versa). Returns (gx, gy) each (2, ...)."""
        shape = jnp.broadcast_shapes(a0x.shape, a0y.shape)
        bx = jnp.broadcast_to(a0x, shape)
        by = jnp.broadcast_to(a0y, shape)
        return jnp.stack([bx, by]), jnp.stack([by, bx])

    def comb_anchors():
        """Best 10-line arithmetic comb per axis on coarse profiles."""
        step, margin, n_pal = comb_step, 57.0, comb_along
        xs = jnp.arange(-margin, warp_size + margin + 1, step,
                        dtype=jnp.float32)                  # (P,)
        pal = (jnp.arange(n_pal, dtype=jnp.float32) + 0.5) \
            * (warp_size / n_pal)
        gx, gy = swapstack(pal[None, :], xs[:, None])
        prof = sample_axes(gx, gy).mean(axis=2)             # (2, P)
        # Triangle smoothing tolerates comb quantization + curve smear.
        prof = (prof
                + 0.5 * jnp.pad(prof, ((0, 0), (1, 0)))[:, :-1]
                + 0.5 * jnp.pad(prof, ((0, 0), (0, 1)))[:, 1:]) / 2.0

        def comb_score(a, d):
            pos = a[..., None] + d[..., None] * jnp.arange(
                10, dtype=jnp.float32)
            fi = jnp.clip((pos + margin) / step, 0.0,
                          prof.shape[1] - 1.001)
            i0 = jnp.floor(fi).astype(jnp.int32)
            t = fi - i0
            tap = (jnp.take(prof, i0, axis=1) * (1 - t)
                   + jnp.take(prof, i0 + 1, axis=1) * t)   # (2, ..., 10)
            # Deviation prior: endpoints' distance from the corners.
            dev = jnp.abs(pos[..., 0]) + jnp.abs(pos[..., 9] - warp_size)
            return tap.sum(-1) - 0.006 * dev

        a_vals = jnp.arange(-57.0, 58.0, comb_astep, dtype=jnp.float32)
        d_vals = jnp.arange(36.0, 56.01, comb_dstep, dtype=jnp.float32)
        sc = comb_score(a_vals[:, None], d_vals[None, :])   # (2, A, D)
        flat = sc.reshape(2, -1)
        best = jnp.argmax(flat, axis=1)                     # (2,)
        a_b = a_vals[best // d_vals.shape[0]]
        d_b = d_vals[best % d_vals.shape[0]]
        sc_nom = comb_score(jnp.float32(0.0),
                            jnp.float32(warp_size / 9.0))   # (2,)
        engage = (jnp.take_along_axis(flat, best[:, None], 1)[:, 0]
                  >= sc_nom + 2.0)
        combp = (a_b[:, None] + d_b[:, None]
                 * jnp.arange(10, dtype=jnp.float32))       # (2, 10)
        return jnp.where(engage[:, None], combp, nominal[None, :])

    anchors = (comb_anchors() if comb
               else jnp.broadcast_to(nominal, (2, 10)))     # (2, 10)
    across = anchors[:, :, None] + offs[None, None, :]      # (2, 10, A)
    # axis-0 coords: y varies across, x along; axis 1 swapped — but
    # `across` itself DIFFERS per axis, so build explicitly:
    a0 = across[0][:, :, None]                              # (10, A, 1)
    a1 = across[1][:, :, None]
    al = along[None, None, :]                               # (1, 1, L)
    shape = jnp.broadcast_shapes(a0.shape, al.shape)
    gx = jnp.stack([jnp.broadcast_to(al, shape),
                    jnp.broadcast_to(a1, shape)])
    gy = jnp.stack([jnp.broadcast_to(a0, shape),
                    jnp.broadcast_to(al, shape)])
    v = sample_axes(gx, gy)                                 # (2, 10, A, L)
    mass_a = v.mean(axis=3)                                 # (2, 10, A)
    mass_full = mass_a.sum(axis=2)
    cent_full = ((mass_a * across).sum(axis=2)
                 / jnp.maximum(mass_full, 1e-6))
    # OUTER boundaries (0 and 9) get a decoy-robust snap: a straight
    # line on the page margin (a pen, the page edge) inside the
    # +-window band adds an off-nominal mass peak, and the plain
    # whole-band centroid drifts toward it (measured: a synthetic
    # pen 0.3 cells outside the bottom edge pulled the outer
    # boundary ~7 px out, silently shifting every crop in the
    # border row). Only the outer two bands are exposed — an
    # interior band sits >= 50 px - window inside the grid, beyond
    # any outside decoy's reach — so interior boundaries keep the
    # full centroid (real page curvature bows them ~10 px, and a
    # narrow snap measurably breaks the golden photos). Rule:
    # smooth the per-offset mass, take the bin NEAREST THE ANCHOR
    # among bins >= 50% of the peak (the true outer line passes
    # within the corner-pinned homography's few px of its anchor
    # at the span ends), centroid its +-2-bin (+-8 px) neighborhood.
    sm = (mass_a
          + 0.5 * jnp.pad(mass_a, ((0, 0), (0, 0), (1, 0)))[:, :, :-1]
          + 0.5 * jnp.pad(mass_a, ((0, 0), (0, 0), (0, 1)))[:, :, 1:])
    strong = sm >= 0.5 * jnp.max(sm, axis=2, keepdims=True)
    a_idx = jnp.arange(offs.shape[0])
    dist = jnp.where(strong, jnp.abs(offs)[None, None, :], jnp.inf)
    j = jnp.argmin(dist, axis=2)                            # (2, 10)
    nb = jnp.abs(a_idx[None, None, :] - j[:, :, None]) <= 2
    m_nb = jnp.where(nb, mass_a, 0.0)
    mass_nb = m_nb.sum(axis=2)
    cent_nb = (m_nb * across).sum(axis=2) / jnp.maximum(mass_nb, 1e-6)
    outer = (jnp.arange(10) == 0) | (jnp.arange(10) == 9)
    mass = jnp.where(outer[None, :], mass_nb, mass_full)
    cent = jnp.where(outer[None, :], cent_nb, cent_full)
    refined = jnp.where(mass > 0.25, cent, anchors)         # (2, 10)
    return refined[0], refined[1]


def cells_empty_mask(
    cells: jnp.ndarray,
    ink_thresh: float = 0.02,
    border_frac: float = 0.15,
    min_ink_depth: float = 45.0,
    depth_floor: float = 25.0,
    low_light_gate: float = 150.0,
) -> jnp.ndarray:
    """Ink-ratio empty-cell detection (reference cv/extract.py:59 rule:
    <2% ink pixels -> empty).

    cells: (81, S, S) uint8. The reference Otsu-binarizes the interior; an
    Otsu split misfires on faint show-through ghosts (thin paper), so ink
    is defined contrast-relatively: pixels sufficiently darker than the
    cell's median. Real print is dark; ghosts and paper grain are not.

    The depth cut is ADAPTIVE per cell, clip(0.5 * (median - dark2pct),
    depth_floor, min_ink_depth) where dark2pct is the cell's 2nd-
    percentile intensity (its robust darkest level): a fixed 45-level
    cut silently ERASED a printed digit in a low-light scene whose
    whole stroke contrast was compressed below 45 (sweep 90210
    s077_low_light — the weakened puzzle then solved to a WRONG grid
    at "confidence 1.0"). The floor keeps pure-grain empty cells from
    self-qualifying; the cap restores the calibrated 45 exactly for
    normal lighting.

    Adaptation is GATED on evidence of compressed illumination: it
    applies only when the cell's median (its paper level) is itself
    dark, < low_light_gate. Without the gate, a mid-contrast
    show-through ghost (25-45 below paper) in NORMAL light sets
    dark2pct ~ median - C and depth = floor < C, flagging a truly
    empty cell as a digit — exactly what the fixed 45 was calibrated
    against. Paper medians separate the regimes cleanly: the low-light
    scene family renders paper at 0.35-0.55 x 220 ~ 77-121 while
    normally lit paper sits >= ~190 (ml/generate_scenes.py:481), so
    bright cells keep the full 45 cut (ghost-proof) and only
    genuinely dark cells scale with their own contrast. A ghost seen
    THROUGH low light is compressed with everything else (0.45 x 45
    ~ 20 < floor), so the floor still rejects it.
    """
    n, s, _ = cells.shape
    b = int(s * border_frac)
    inner = cells[:, b:s - b, b:s - b].astype(jnp.float32).reshape(n, -1)
    # ONE sort serves both order statistics: jnp.median already paid a
    # full per-cell sort before this mask grew the dark percentile, and
    # a second sort/top_k for it measured 0.02 ms/frame of the 0.65
    # budget (TPU, batch 32) — deriving both from the same sorted array
    # keeps the adaptive mask at the fixed-depth mask's cost.
    srt = jnp.sort(inner, axis=1)
    m = inner.shape[1]
    med = ((srt[:, (m - 1) // 2] + srt[:, m // 2]) / 2.0
           if m % 2 == 0 else srt[:, m // 2])
    k = max(1, round(0.02 * m))
    dark = srt[:, k]
    depth_adapt = jnp.clip(0.5 * (med - dark), depth_floor, min_ink_depth)
    depth = jnp.where(med < low_light_gate, depth_adapt, min_ink_depth)
    ink = inner < (med - depth)[:, None]
    ink_ratio = ink.mean(axis=1, dtype=jnp.float32)
    return ink_ratio < ink_thresh


def preprocess_cells_for_model(cells: jnp.ndarray,
                               use_clahe: bool = True) -> jnp.ndarray:
    """Canonical CNN input preproc for (81, 28, 28) u8 cells.

    CLAHE(2.0, 4x4 tiles) -> adaptive gaussian threshold(11, 2, BINARY) ->
    invert -> [0,1] -> normalize to [-1,1]; returns float32 (81, 28, 28, 1).
    Matches reference ml/datasets.py:18 + pipeline/run.py:146 normalize.

    use_clahe=False skips the (expensive) CLAHE stage: the adaptive
    threshold is itself locally contrast-normalizing, so a model TRAINED
    with the same flag reaches the same accuracy at ~1.5x pipeline
    throughput. Train/serve must agree on the flag (checkpoint metadata
    records it).
    """
    cl = (jax.vmap(lambda c: ops.clahe(c, 2.0, (4, 4)))(cells)
          if use_clahe else cells)
    th = ops.adaptive_threshold(cl, 11, 2, method="gaussian", invert=False)
    inv = (255 - th.astype(jnp.int32)).astype(jnp.float32) / 255.0
    norm = (inv - 0.5) / 0.5
    return norm[..., None]
