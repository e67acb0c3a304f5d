"""Grid detection, reformulated for TPU.

The reference finds the grid as the largest external contour approximated
to a quadrilateral (reference cv/grid.py:16-72: cv2.findContours +
approxPolyDP, >=10% image area) and orders corners by coordinate sum/diff
(cv/grid.py:74). Contour walking is inherently sequential; this module
uses a dense, fully-vectorized formulation that is also more robust (5/5
golden images vs the reference contour method's 4/5):

  1. threshold a ~900px area-averaged pyramid level (averaging before
     thresholding kills print/paper speckle);
  2. extract the *line lattice* with a sheared orientation bank: for each
     angle in +-45deg, shear so lines of that slope become axis-aligned
     (per-column/row roll), apply a 1-D morphological opening of length L
     (only straight runs >= L survive — specks, digits and text die),
     unshear, and take the max over the bank. Every step is a gather or a
     windowed min/max — pure VPU work, no sequential walks;
  3. isolate the grid region by TWO-FAMILY line density: the grid is the
     only structure with both horizontal- and vertical-family lines
     everywhere, so min(density_h, density_v) peaks exactly on it; a
     short flood fill from the density argmax drops detached
     above-threshold specks (grid_region_from_lattice — replaces generic
     connected components, whose sequential label propagation dominated
     frame latency on this runtime);
  4. corners = extreme points argmax(+-x +- y) of the grid region —
     the same tl/tr/br/bl rule as the reference's order_points — mapped
     back to full resolution.

Everything is fixed-shape and jit/vmap-friendly: no data-dependent
shapes; validity is a boolean in the result, never an exception.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp


class GridDetection(NamedTuple):
    """Fixed-shape detection result (batchable)."""

    corners: jnp.ndarray     # (4, 2) float32 (x, y), order tl, tr, br, bl
    found: jnp.ndarray       # () bool — plausible grid component found
    area_frac: jnp.ndarray   # () float32 — corner-quad area / image area
    fill: jnp.ndarray        # () float32 — component line px / quad area
    edge_sup: jnp.ndarray    # (4,) float32 — lattice coverage of the quad
    #                          edges tl-tr/tr-br/br-bl/bl-tl (edge_support;
    #                          ~1 on a true grid, low on a stolen corner's
    #                          chords — structural confidence diagnostic)


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------

def _avg_pool(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """Area-average downsample by integer factor f (float32 out)."""
    h, w = x.shape
    ch, cw = h // f, w // f
    return jax.lax.reduce_window(
        x[:ch * f, :cw * f].astype(jnp.float32), 0.0,
        jax.lax.add, (f, f), (f, f), "VALID") / float(f * f)


def _window1d(x: jnp.ndarray, k: int, axis: int, op: str) -> jnp.ndarray:
    """1-D windowed min/max along axis (uint8/bool-as-int32 in, same out)."""
    pad_b, pad_a = k // 2, k - 1 - k // 2
    init, fn = (0, jax.lax.max) if op == "max" else (1, jax.lax.min)
    init = x.dtype.type(init)
    dims = [1, 1]
    dims[axis] = k
    pads = [(0, 0), (0, 0)]
    pads[axis] = (pad_b, pad_a)
    return jax.lax.reduce_window(x, init, fn, tuple(dims), (1, 1), pads)


def _shear_rows(x: jnp.ndarray, shift: jnp.ndarray) -> jnp.ndarray:
    """Roll each column vertically by shift[col] (gather along axis 0)."""
    h, w = x.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    idx = (rows + shift[None, :]) % h
    return jnp.take_along_axis(x, idx, axis=0)


def _shear_cols(x: jnp.ndarray, shift: jnp.ndarray) -> jnp.ndarray:
    """Roll each row horizontally by shift[row] (gather along axis 1)."""
    h, w = x.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    idx = (cols + shift[:, None]) % w
    return jnp.take_along_axis(x, idx, axis=1)


def _window1d_batched(x: jnp.ndarray, k: int, op: str) -> jnp.ndarray:
    """Windowed min/max along the LAST axis of an (A, H, W) batch."""
    pad_b, pad_a = k // 2, k - 1 - k // 2
    init, fn = (0, jax.lax.max) if op == "max" else (1, jax.lax.min)
    return jax.lax.reduce_window(
        x, init, fn, (1, 1, k), (1, 1, 1),
        [(0, 0), (0, 0), (pad_b, pad_a)])


def line_lattice(
    binary: jnp.ndarray,
    length: int = 31,
    angles_deg: Sequence[int] = tuple(range(-45, 46, 5)),
) -> jnp.ndarray:
    """Keep only pixels on straight runs >= `length` at any bank angle.

    binary: uint8 ink mask (0/255). Returns int32 0/1 lattice mask.

    The whole angle bank runs as ONE batched (A, H, W) computation — a
    single shear gather, a single 1-D opening, a single unshear gather per
    orientation family — so the XLA graph stays small (compile time) and
    the VPU sees large fused loops (run time).
    """
    lat_h, lat_v = line_lattice_hv(binary, length, angles_deg)
    return jnp.maximum(lat_h, lat_v)


def _translate2d(x: jnp.ndarray, dy: int, dx: int, fill) -> jnp.ndarray:
    """Shift a 2-D map by a STATIC offset, filling vacated pixels.

    Implemented as pad+slice — pure data movement, no gather. This is the
    whole trick that makes the orientation bank fast on TPU: per-pixel
    shear gathers cost ~50x more than static slices here.
    """
    h, w = x.shape
    py = (max(dy, 0), max(-dy, 0))
    px = (max(dx, 0), max(-dx, 0))
    xp = jnp.pad(x, (py, px), constant_values=fill)
    return xp[py[1]:py[1] + h, px[1]:px[1] + w]


def _directional_open(b: jnp.ndarray, slope: float, length: int,
                      vertical: bool) -> jnp.ndarray:
    """Morphological opening along a digital line (van Herk doubling).

    Erosion by a length-L segment at direction (1, slope) built from
    log2(L) min-with-translated-self steps (offsets double each step),
    then the mirrored dilation. Only straight runs >= `length` along the
    direction survive. All ops are static-shift mins/maxes.
    """
    def off(k: int):
        return ((int(round(k * slope)), k) if not vertical
                else (k, int(round(k * slope))))

    # Doubling shifts covering exactly [0, length): shift by
    # min(covered, length - covered) each step.
    shifts = []
    covered = 1
    while covered < length:
        s = min(covered, length - covered)
        shifts.append(s)
        covered += s

    # Erosion: e(p) = min over t in [0, length) of b(p + t*dir).
    e = b
    for k in shifts:
        dy, dx = off(k)
        e = jnp.minimum(e, _translate2d(e, -dy, -dx, 1))
    # Opening = dilation by the reflected segment (anchor-free):
    # o(p) = max over t in [0, length) of e(p - t*dir).
    d = e
    for k in shifts:
        dy, dx = off(k)
        d = jnp.maximum(d, _translate2d(d, dy, dx, 0))
    return d


def _line_lattice_hv_single(
    binary: jnp.ndarray,
    length: int,
    angles_deg: Sequence[int],
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-frame lattice bank (the original dense formulation)."""
    b = (binary > 0).astype(jnp.int8)
    thick_h = _window1d(b, 3, 0, "max")
    thick_v = _window1d(b, 3, 1, "max")
    lat_h = jnp.zeros_like(b)
    lat_v = jnp.zeros_like(b)
    for a in angles_deg:
        s = math.tan(math.radians(a))
        lat_h = jnp.maximum(
            lat_h, _directional_open(thick_h, s, length, vertical=False))
        lat_v = jnp.maximum(
            lat_v, _directional_open(thick_v, s, length, vertical=True))
    # int8 keeps the two lattice maps 4x smaller in HBM — they feed
    # several consumers (gates, density region, boundary refine) and the
    # traffic of rematerialized int32 copies measured ~0.3 ms/frame.
    return lat_h, lat_v


# --- bit-packed batched bank -------------------------------------------------
#
# On binary data, erosion = AND and dilation = OR, and every frame in a
# batch uses the SAME per-angle shift offsets — so 32 frames pack into
# the 32 bitplanes of one uint32 map and the whole orientation bank runs
# ONCE per batch as bitwise ops: ~32x less VPU traffic on the hottest
# detection stage (the bank is ~400 translate/min/max passes; measured
# ~0.6 ms/frame un-packed at batch 32). Wired in via custom_vmap so
# vmap(perceive) picks it up automatically; results are bit-identical
# to the per-frame path (same shift plan, same fill semantics).

_ONES32 = 0xFFFFFFFF


def _pack_bits(b01: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W) 0/1 -> (ceil(N/32), H, W) uint32 bitplanes."""
    n = b01.shape[0]
    g = -(-n // 32)
    words = []
    for gi in range(g):
        w = jnp.zeros(b01.shape[1:], jnp.uint32)
        for i in range(min(32, n - gi * 32)):
            w = w | (b01[gi * 32 + i].astype(jnp.uint32) << i)
        words.append(w)
    return jnp.stack(words)


def _unpack_bits(words: jnp.ndarray, n: int) -> jnp.ndarray:
    """(G, H, W) uint32 -> (N, H, W) int8 0/1."""
    return jnp.stack([
        ((words[i // 32] >> (i % 32)) & 1).astype(jnp.int8)
        for i in range(n)])


def _translate_packed(x: jnp.ndarray, dy: int, dx: int,
                      fill: int) -> jnp.ndarray:
    """_translate2d over the spatial dims of a (G, H, W) bitplane stack."""
    _, h, w = x.shape
    py = (max(dy, 0), max(-dy, 0))
    px = (max(dx, 0), max(-dx, 0))
    xp = jnp.pad(x, ((0, 0), py, px), constant_values=jnp.uint32(fill))
    return xp[:, py[1]:py[1] + h, px[1]:px[1] + w]


def _window_or_packed(x: jnp.ndarray, k: int, axis: int) -> jnp.ndarray:
    dims = [1, 1, 1]
    dims[axis] = k
    pads = [(0, 0), (0, 0), (0, 0)]
    pads[axis] = (k // 2, k - 1 - k // 2)
    return jax.lax.reduce_window(
        x, jnp.uint32(0), jax.lax.bitwise_or, tuple(dims), (1, 1, 1), pads)


def _directional_open_packed(b: jnp.ndarray, slope: float, length: int,
                             vertical: bool) -> jnp.ndarray:
    """_directional_open on uint32 bitplanes (min->AND, max->OR)."""
    def off(k: int):
        return ((int(round(k * slope)), k) if not vertical
                else (k, int(round(k * slope))))

    shifts = []
    covered = 1
    while covered < length:
        s = min(covered, length - covered)
        shifts.append(s)
        covered += s

    e = b
    for k in shifts:
        dy, dx = off(k)
        e = e & _translate_packed(e, -dy, -dx, _ONES32)
    d = e
    for k in shifts:
        dy, dx = off(k)
        d = d | _translate_packed(d, dy, dx, 0)
    return d


def _line_lattice_hv_packed(
    binary: jnp.ndarray,
    length: int,
    angles_deg: Sequence[int],
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched bank on bit-packed frames. binary: (N, H, W) uint8 mask."""
    n = binary.shape[0]
    packed = _pack_bits((binary > 0).astype(jnp.uint32))
    thick_h = _window_or_packed(packed, 3, 1)
    thick_v = _window_or_packed(packed, 3, 2)
    lat_h = jnp.zeros_like(packed)
    lat_v = jnp.zeros_like(packed)
    for a in angles_deg:
        s = math.tan(math.radians(a))
        lat_h = lat_h | _directional_open_packed(
            thick_h, s, length, vertical=False)
        lat_v = lat_v | _directional_open_packed(
            thick_v, s, length, vertical=True)
    return _unpack_bits(lat_h, n), _unpack_bits(lat_v, n)


def line_lattice_hv(
    binary: jnp.ndarray,
    length: int = 31,
    angles_deg: Sequence[int] = tuple(range(-45, 46, 5)),
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """line_lattice with the two orientation families kept separate:
    (horizontal-ish lines, vertical-ish lines). The sudoku grid is the
    only structure containing BOTH everywhere — page edges, book spines
    and text rules are single-family.

    Under vmap the bank switches to the bit-packed batched formulation
    (32 frames per uint32 word — see _line_lattice_hv_packed) with
    bit-identical results."""

    @jax.custom_batching.custom_vmap
    def _bank(b):
        return _line_lattice_hv_single(b, length, angles_deg)

    @_bank.def_vmap
    def _bank_vmap(axis_size, in_batched, b):  # noqa: ANN001
        del axis_size
        if not in_batched[0]:  # mapped over something else: no frame axis
            return _line_lattice_hv_single(b, length, angles_deg), \
                (False, False)
        return _line_lattice_hv_packed(b, length, angles_deg), (True, True)

    return _bank(binary)


def _extreme_corners(mask: jnp.ndarray) -> jnp.ndarray:
    """tl/tr/br/bl as argmax of (-x-y, x-y, x+y, -x+y) over mask pixels."""
    h, w = mask.shape
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(jnp.float32)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(jnp.float32)
    neg = jnp.float32(-1e9)

    def pick(score):
        s = jnp.where(mask, score, neg)
        idx = jnp.argmax(s)
        return jnp.stack([(idx % w).astype(jnp.float32),
                          (idx // w).astype(jnp.float32)])

    return jnp.stack([pick(-xs - ys), pick(xs - ys),
                      pick(xs + ys), pick(-xs + ys)])


def dilate_union(lat_h: jnp.ndarray, lat_v: jnp.ndarray,
                 k: int = 9) -> jnp.ndarray:
    """max(lat_h, lat_v) dilated by a k x k window (uint8 0/1).

    Tolerance map for edge_support: page curvature bows the grid's outer
    line a few px away from the straight corner-to-corner chord."""
    lat = jnp.maximum(lat_h, lat_v).astype(jnp.uint8)
    return _window1d(_window1d(lat, k, 0, "max"), k, 1, "max")


def edge_support(lat_dil: jnp.ndarray, corners: jnp.ndarray,
                 n_samples: int = 48,
                 span: tuple[float, float] = (0.12, 0.88)) -> jnp.ndarray:
    """Lattice coverage along each quad edge (tl-tr, tr-br, br-bl, bl-tl).

    corners: (4, 2) float (x, y) in lat_dil pixel coords (tl/tr/br/bl).
    Samples the middle `span` of each edge (ends excluded — even a decoy
    corner sits on its own crossing cluster) against the dilated union
    lattice (dilate_union). Returns (4,) float32 coverage in [0, 1].

    Structural fact this measures: a TRUE grid corner's two incident
    quad edges run along the grid's outer lines (coverage ~1); a stolen
    corner (a page-corner two-edge crossing cluster, clutter that passed
    every photometric gate) hangs in blank margin, so its incident
    chords cross un-latticed paper (coverage << 1). Unlike any local
    box-mass test, this cannot be fooled by how dense the decoy cluster
    itself is — it interrogates the PATH back to the grid.
    """
    h, w = lat_dil.shape
    t = jnp.linspace(span[0], span[1], n_samples, dtype=jnp.float32)[None, :]
    p0 = corners.astype(jnp.float32)
    p1 = jnp.roll(p0, -1, axis=0)
    xs = p0[:, 0:1] * (1.0 - t) + p1[:, 0:1] * t            # (4, S)
    ys = p0[:, 1:2] * (1.0 - t) + p1[:, 1:2] * t
    xi = jnp.clip(jnp.rint(xs).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.rint(ys).astype(jnp.int32), 0, h - 1)
    v = jnp.take(lat_dil.reshape(-1), (yi * w + xi).reshape(-1))
    return v.reshape(4, n_samples).astype(jnp.float32).mean(axis=1)


def peel_stolen_corners(comp: jnp.ndarray, lat_dil: jnp.ndarray,
                        rho: int, tau: float = 0.80,
                        margin: float = 0.15,
                        rounds: int = 1) -> jnp.ndarray:
    """Structural corner validation: erase decoy extreme-point clusters.

    The extreme-point pick (argmax +-x +-y) has no notion of whether a
    corner is CONNECTED to the grid, so a compact decoy crossing cluster
    that survives every photometric gate (the classic case: the PAGE
    corner in a skewed photo, where two page edges meet) can steal a
    corner and silently mis-warp the whole grid.

    Rule, per round: pick extremes; score each quad edge's lattice
    coverage (edge_support). An edge below `tau` is DEAD — a true quad
    edge rides the grid's outer line (coverage measured EXACTLY 1.000 on
    all 4 edges of all 52 e2e cases across 16 scene categories, incl.
    glare/shadow/motion-blur/far-away/handwritten), so a dead edge
    proves one of its two endpoints is stolen. A dead edge alone cannot
    say WHICH endpoint; flag the one whose OTHER incident edge is
    weaker. (The once-obvious "flag corners with BOTH edges dead" rule
    does not work: when the decoy sits near the true corner, one of its
    chords cuts through the latticed grid INTERIOR and scores high —
    measured on the s118 page-corner steal: the fully-outside chord
    0.52, the interior-crossing chord 0.96.)

    Guards, because erasing near a TRUE corner would shrink the quad:
    flagged corners get a disc of radius `rho` erased and the extremes
    re-picked, but the round is accepted only if the quad's WORST edge
    coverage improves by > `margin` (removing a real decoy jumps the
    dead edge from ~0.2 to ~0.9; inward shrinkage onto interior
    crossings yields marginal gains that don't clear the bar), and only
    when <= 2 edges are dead (3+ dead edges = systemic failure — moire,
    no grid — where peeling is noise). Statically unrolled fixed-shape
    graph (an on-device early-exit loop costs ms-level dispatch here).

    comp, lat_dil share one coordinate system. Returns (mask, corners,
    edge supports) — mask/corners unchanged when nothing qualifies; the
    carried corners/supports save detect_grid_full a redundant extreme
    pick + support pass per round.
    """
    h, w = comp.shape
    xs1 = jnp.arange(w, dtype=jnp.float32)
    ys1 = jnp.arange(h, dtype=jnp.float32)
    c = _extreme_corners(comp)
    sup = edge_support(lat_dil, c)
    for _ in range(rounds):
        dead = sup < tau
        bad = jnp.zeros((4,), bool)
        for i in range(4):                      # edge i: corner i -> i+1
            o_a = sup[(i - 1) % 4]              # endpoint i's other edge
            o_b = sup[(i + 1) % 4]              # endpoint i+1's other edge
            pick_a = o_a <= o_b
            bad = bad.at[i].set(bad[i] | (dead[i] & pick_a))
            j = (i + 1) % 4
            bad = bad.at[j].set(bad[j] | (dead[i] & ~pick_a))
        # Erase square (Chebyshev "disc" — covers the euclidean one) as
        # an outer product of 1-D interval masks: two (h,)+(w,) computes
        # + one broadcast AND per corner, instead of full-map distance
        # fields (~3x cheaper on the VPU; the peel rides the hot path).
        erase = jnp.zeros((h, w), bool)
        for i in range(4):
            inx = (jnp.abs(xs1 - c[i, 0]) < rho) & bad[i]
            iny = jnp.abs(ys1 - c[i, 1]) < rho
            erase = erase | (iny[:, None] & inx[None, :])
        peeled = jnp.logical_and(comp, ~erase)
        c_new = _extreme_corners(peeled)
        sup_new = edge_support(lat_dil, c_new)
        accept = ((jnp.sum(dead) <= 2) & jnp.any(bad) & jnp.any(peeled)
                  & (jnp.min(sup_new) > jnp.min(sup) + margin))
        comp = jnp.where(accept, peeled, comp)
        c = jnp.where(accept, c_new, c)
        sup = jnp.where(accept, sup_new, sup)
    return comp, c, sup


def order_corners(pts: jnp.ndarray) -> jnp.ndarray:
    """Order 4 arbitrary points tl,tr,br,bl by sum/diff (reference
    cv/grid.py:74 order_points semantics)."""
    s = pts[:, 0] + pts[:, 1]
    d = pts[:, 0] - pts[:, 1]
    return jnp.stack([
        pts[jnp.argmin(s)], pts[jnp.argmax(d)],
        pts[jnp.argmax(s)], pts[jnp.argmin(d)],
    ])


def _box_sum_u8(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Windowed count of a bool mask in uint8 (valid for k*k <= 255),
    zero padding. All call sites are detect-pyramid scale (<=1024), so
    this rides the MXU band engine (ops/bandconv.py) — counts of a 0/1
    mask are exact in f32 far beyond k=15."""
    assert k * k <= 255, k
    from sudoku_vision_tpu.ops.bandconv import band_filter_int

    if max(x.shape[-2], x.shape[-1]) <= 1024:
        return band_filter_int(x.astype(jnp.uint8), tuple([1] * k),
                               "constant", max_abs_in=1).astype(jnp.uint8)
    pads = (k // 2, k - 1 - k // 2)
    y = jax.lax.reduce_window(
        x.astype(jnp.uint8), jnp.uint8(0), jax.lax.add, (1, k), (1, 1),
        [(0, 0), pads])
    return jax.lax.reduce_window(
        y, jnp.uint8(0), jax.lax.add, (k, 1), (1, 1), [pads, (0, 0)])


def _box_sum(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Separable windowed sum (float32) of a 0/1 mask, zero padding.
    MXU band engine at detect-pyramid sizes (exact: k^2 < 2^24)."""
    from sudoku_vision_tpu.ops.bandconv import band_filter_int

    if max(x.shape[-2], x.shape[-1]) <= 1024:
        return band_filter_int(x.astype(jnp.uint8), tuple([1] * k),
                               "constant", max_abs_in=1
                               ).astype(jnp.float32)
    pads = (k // 2, k - 1 - k // 2)
    y = jax.lax.reduce_window(
        x.astype(jnp.float32), 0.0, jax.lax.add, (1, k), (1, 1),
        [(0, 0), pads])
    return jax.lax.reduce_window(
        y, 0.0, jax.lax.add, (k, 1), (1, 1), [pads, (0, 0)])


def grid_region_from_lattice(
    lat_h: jnp.ndarray, lat_v: jnp.ndarray,
    k: int = 61, rel_thresh: float = 0.35,
    dark: jnp.ndarray | None = None,
    scale: float = 1.0,
) -> jnp.ndarray:
    """Isolate the sudoku-grid region WITHOUT connected components.

    The grid is the only structure containing BOTH horizontal-family and
    vertical-family long lines everywhere, so min(density_h, density_v)
    over a box window is high exactly on the grid and ~zero on page
    edges, book spines, folds and text rules (all single-family).
    Threshold that joint density at rel_thresh * max, dilate back by the
    window radius (the density peak is inset from the grid border by
    ~k/2), and intersect with the full lattice. One shot, fully parallel
    — no sequential label propagation (each iteration of an on-device
    loop costs ~1.5 ms of dispatch on this runtime, so O(diameter) or
    even O(log d) CC dominated the frame budget).
    """
    h, w = lat_h.shape
    dens = jnp.minimum(_box_sum(lat_h > 0, k), _box_sum(lat_v > 0, k))
    dmask = dens > rel_thresh * jnp.max(dens)
    # Local both-family presence: true near line crossings. Used BELOW
    # (after the flood) to keep only true grid pixels — it must NOT gate
    # the flood's connectivity mask: between crossings it is false, so a
    # fine-gated coarse mask decomposes into isolated crossing islands
    # and the flood dies at the seed block.
    kf = max(5, round(11 * scale)) | 1
    fine = jnp.logical_and(_box_sum_u8(lat_h > 0, kf) > 0,
                           _box_sum_u8(lat_v > 0, kf) > 0)

    # The grid's blob contains the flood seed; flood-fill from it on a
    # coarsened mask (solid blob -> ~diameter/f unrolled dilations) to
    # drop detached above-threshold specks (e.g. a book spine crossing
    # a fold also has both line families locally). The coarse factor
    # follows `scale` so the flood's physical bridging reach (which
    # gaps between two adjacent grids it can jump) is
    # resolution-independent — calibrated f=16 at scale 1.
    #
    # Seed choice: NOT the raw density argmax — a facing page's decoy
    # grid clipped at the frame edge can hold the single densest pixel
    # while the fully-visible target grid has far more total density.
    # Seed at the maximum of the windowed density-mask MASS, with a
    # window the size of the frame's short side: any smaller window
    # saturates inside every blob wider than itself and the argmax
    # tie-breaks to the top-left pixel (which is exactly where the
    # decoy sits). At short-side size the score is each blob's area
    # under the window — the reference's "largest contour wins" prior
    # (reference cv/grid.py:37) as dense array math. Restricted to
    # dmask so the flood always starts on the blob.
    f = max(4, round(16 * scale))
    ch, cw = -(-h // f), -(-w // f)
    dpad = jnp.pad(dmask, ((0, ch * f - h), (0, cw * f - w)))
    cmask = jax.lax.reduce_window(
        dpad, False, jax.lax.bitwise_or, (f, f), (f, f), "VALID")
    kseed = max(k, min(h, w) - 1) | 1
    seed_score = jnp.where(dmask, _box_sum(dmask, kseed), -1.0)
    amax = jnp.argmax(seed_score)
    sy = (amax // w) // f
    sx = (amax % w) // f
    seed = jnp.zeros((ch, cw), bool).at[sy, sx].set(True)
    region = jnp.logical_and(seed, cmask)
    # One round = 3x3 OR-dilation (separable: vertical then horizontal
    # translate-ORs) gated by cmask. Formulated as static pad+slice
    # translates, NOT reduce_window: the 40 unrolled reduce_window
    # rounds were 80 unfusable kernel launches (~0.05 ms/frame of pure
    # dispatch on the coarse mask), while translate-OR chains are
    # elementwise ops XLA fuses across rounds. Bit-identical output.
    for _ in range(40):
        g = jnp.logical_or(region, jnp.logical_or(
            _translate2d(region, 1, 0, False),
            _translate2d(region, -1, 0, False)))
        g = jnp.logical_or(g, jnp.logical_or(
            _translate2d(g, 0, 1, False),
            _translate2d(g, 0, -1, False)))
        region = jnp.logical_and(g, cmask)
    region_full = jnp.repeat(jnp.repeat(region, f, axis=0), f, axis=1)
    region_full = jnp.logical_and(region_full[:h, :w], dmask)

    # Dilate back by the density window radius (the peak is inset from
    # the grid border by ~k/2) and keep only TRUE grid pixels: on a
    # lattice line AND within a few px of BOTH line families (grid
    # corners are exactly h-line/v-line meeting points; header text
    # rules and page edges near the grid are single-family and drop).
    # Separable 1-D or-dilations: a 2-D (kd, kd) reduce_window does
    # kd^2 ops/pixel (~1.2 G ops at kd=42); two 1-D passes do 2*kd.
    kd = k // 2 + max(6, round(12 * scale))
    region_full = _window1d(_window1d(
        region_full, kd, 0, "max"), kd, 1, "max")
    comp = jnp.logical_and(
        region_full,
        jnp.logical_and(fine, jnp.logical_or(lat_h > 0, lat_v > 0)))
    if dark is not None:
        # Require real ink: show-through ghosts of the overleaf page form
        # line crossings too, but only ~15 gray levels below paper; true
        # grid lines are far darker than their local surroundings.
        comp = jnp.logical_and(comp, dark)
    # Grid crossings come in a lattice — require neighborhood support so
    # an isolated stray crossing can't steal an extreme point (count
    # threshold scales with the window area, tuned at k=61).
    support = _box_sum(comp, k) > 60.0 * (k / 61.0) ** 2
    return jnp.logical_and(comp, support)


# ---------------------------------------------------------------------------
# Main entry
# ---------------------------------------------------------------------------

def detect_grid_full(
    gray: jnp.ndarray,
    detect_width: int = 950,
    min_area_frac: float = 0.06,
    line_length: int = 31,
    density_window: int = 61,
    calib_scale: float | None = None,
    debug_stash: dict | None = None,
    peel_rounds: int = 1,
    binary_mode: str = "adaptive",
    angle_step: int = 5,
):
    """detect_grid plus the intermediate line-family lattices and the
    detect-scale factor — the extraction stage refines cell boundaries
    against the lattices (page-curvature correction).

    ``binary_mode``/``angle_step``/``line_length`` parameterize the
    cascade strategies (cv/grid_v2.py): every strategy goes through THIS
    function, so the ink/interior-line gates, dark gate and
    peel_stolen_corners hardening apply uniformly — a fallback detector
    must never be easier to fool than the primary one.
      * binary_mode "adaptive": the standard blurred adaptive threshold;
        "multi": the illumination/shadow-robust multi-strategy binary
        (cv/preprocess_v2.py, reference preprocess_v2.py:247).
      * angle_step: bank density in degrees (3 recovers faint lines the
        5-degree bank misses at intermediate skews).

    All spatial constants (line length, density window, gate offsets,
    support counts) were calibrated on ~950-px detect images.
    ``calib_scale`` rescales them when the CALLER knows the working
    image is a pooled-down version of a calibration-scale frame (the
    perception graph pools 10-MP photos to 720 px — line thickness and
    grid pitch shrink by 720/950, so the constants must follow; see
    pipeline/graph.py::perceive). It is deliberately NOT inferred from
    the image size: a natively small image (e.g. a 360-px synthetic
    scene) has reference-scale line thickness and uses the calibrated
    constants as-is."""
    from sudoku_vision_tpu.ops.filters import gaussian_blur_u8
    from sudoku_vision_tpu.ops.threshold import adaptive_threshold

    gh, gw = gray.shape
    ds = max(1, round(max(gh, gw) / detect_width))
    small = jnp.clip(jnp.rint(_avg_pool(gray, ds)), 0, 255).astype(jnp.uint8)
    r = 1.0 if calib_scale is None else float(
        min(1.5, max(0.4, calib_scale)))
    if r > 0.9:  # near-reference scale: keep the calibrated constants
        r = 1.0
    if binary_mode == "multi":
        from sudoku_vision_tpu.cv.preprocess_v2 import \
            preprocess_multi_strategy

        binary = preprocess_multi_strategy(small).binary
    else:
        binary = adaptive_threshold(
            gaussian_blur_u8(small, 5), 11, 2, method="gaussian",
            invert=True)

    from sudoku_vision_tpu.ops.filters import box_mean_u8
    from sudoku_vision_tpu.ops.morphology import erode

    lat_h, lat_v = line_lattice_hv(
        binary, max(9, round(line_length * r)),
        tuple(range(-45, 46, angle_step)))
    # Ink gate on the LINE CORE: lattice pixels are thickened 3 px across
    # the line, so judge darkness by the windowed minimum (the stroke
    # core) vs the local mean. Real print cores run 50-150 below local
    # mean; show-through ghosts of the overleaf page only ~10-25.
    # Everything below runs in uint8: the gate maps are the costliest
    # part of detection and are pure elementwise compares — int32 would
    # move 4x the bytes through the VPU for identical booleans.
    #
    # The dark MAP is only consumed by region isolation, which runs on
    # 2x2-pooled masks — so it is built at half resolution (a full-res
    # box-mean pass costs ~0.3 ms/frame vs ~0.04 at half, batch-slope
    # timed). The stroke-core map is min-pooled (not averaged): the
    # darkest core pixel survives pooling exactly, so thin-line depth is
    # not diluted and the 30-level ink-vs-ghost gate is unchanged.
    core = erode(small, max(3, round(5 * r)) | 1)
    # Interior-line gate: a grid line is ink BETWEEN PAPER — both sides
    # perpendicular to the stroke are bright. A page/card/book edge is a
    # paper-to-background step (one side dark), yet it yields long lines
    # in both families and its corners form crossings that can steal the
    # extreme points when the page doesn't fill the frame. Scale-robust
    # (unlike any line-count window): judged a few px either side of the
    # stroke core, whatever the grid pitch.
    # ONE pad of the gray map; every directional offset below is a
    # static slice of it — XLA fuses the 12 shifted reads into a single
    # elementwise loop instead of 12 pad+slice materializations.
    o1 = max(2, round(3 * r))
    o2, o3 = 2 * o1, 3 * o1
    P = o3
    sh, sw = small.shape
    s8p = jnp.pad(small, P, constant_values=0)

    def _shifted(dy: int, dx: int) -> jnp.ndarray:
        return s8p[P - dy:P - dy + sh, P - dx:P - dx + sw]

    def _side_paper(dy: int, dx: int) -> jnp.ndarray:
        # Brightest of 3 perpendicular offsets: clears strokes <= ~7 px
        # thick (scaled) and tolerates a digit right next to the line.
        return jnp.maximum(
            jnp.maximum(_shifted(o1 * dy, o1 * dx),
                        _shifted(o2 * dy, o2 * dx)),
            _shifted(o3 * dy, o3 * dx))

    gate_margin = 20
    side_u, side_d = _side_paper(-1, 0), _side_paper(1, 0)
    side_l, side_r = _side_paper(0, -1), _side_paper(0, 1)
    # Symmetry: an ink stroke has PAPER on both sides (near-equal
    # brightness); a material edge (page-on-desk, page-on-clutter) has
    # two different surfaces. Asymmetric "lines" are edges, not strokes.
    # uint8 forms: |a-b| = max-min; core+margin saturates (a core bright
    # enough to saturate can never be out-shone by paper anyway).
    sym_ud = jnp.maximum(side_u, side_d) - jnp.minimum(side_u, side_d) \
        < jnp.uint8(45)
    sym_lr = jnp.maximum(side_l, side_r) - jnp.minimum(side_l, side_r) \
        < jnp.uint8(45)
    core_m = jnp.minimum(core, jnp.uint8(255 - gate_margin)) \
        + jnp.uint8(gate_margin)
    gate_h = jnp.logical_and(
        jnp.minimum(side_u, side_d) > core_m, sym_ud)
    gate_v = jnp.logical_and(
        jnp.minimum(side_l, side_r) > core_m, sym_lr)
    # At grid crossings BOTH gates fail locally (the perpendicular line is
    # ink, not paper); let passing pixels a few px along the stroke vouch
    # for the crossing — but require SEVERAL of them. A diagonal page
    # edge sheds isolated accidental passes (its band locally looks
    # paper-paper to a horizontal ray that exits the band), measured ~2
    # per 9x9 window vs >=39 at true grid corners across all scene
    # categories; >=6 separates them with wide margin on both sides.
    kg = max(5, round(9 * r)) | 1
    tg = jnp.uint8(math.ceil(6.0 * (kg / 9.0) ** 2 - 1e-6))
    gate_h = _box_sum_u8(gate_h, kg) >= tg
    gate_v = _box_sum_u8(gate_v, kg) >= tg
    lat_h = lat_h * gate_h.astype(lat_h.dtype)
    lat_v = lat_v * gate_v.astype(lat_v.dtype)
    # Region isolation runs on 2x2-pooled lattice masks: the density /
    # flood / support stages only need the lattice's coarse geometry,
    # and at half resolution they cost a quarter of the traffic. The
    # lattice itself STAYS at full detect scale (pooling gray before
    # the opening is what closes text glyph gaps and breaks detection —
    # pooling the binary lattice masks after the opening does not).
    # Corner quantization from the pooling is <=2 detect px, absorbed
    # by the boundary refinement stage.
    def _pool2_any(x):
        xh, xw = x.shape
        return jax.lax.reduce_window(
            x[:xh - (xh % 2), :xw - (xw % 2)], x.dtype.type(0),
            jax.lax.max, (2, 2), (2, 2), "VALID")

    def _pool2_min(x):
        xh, xw = x.shape
        return jax.lax.reduce_window(
            x[:xh - (xh % 2), :xw - (xw % 2)], jnp.uint8(255),
            jax.lax.min, (2, 2), (2, 2), "VALID")

    lat_h2 = _pool2_any(lat_h)
    lat_v2 = _pool2_any(lat_v)
    small2 = jnp.clip(jnp.rint(_avg_pool(small, 2)), 0, 255).astype(jnp.uint8)
    core2 = _pool2_min(core)
    mean2 = box_mean_u8(small2, max(9, round(31 * r / 2)) | 1)
    sh2 = min(core2.shape[0], mean2.shape[0])
    sw2 = min(core2.shape[1], mean2.shape[1])
    # core < mean - 30, saturating in uint8 (core > 225 can never pass).
    dark2 = (jnp.minimum(core2[:sh2, :sw2], jnp.uint8(225)) + jnp.uint8(30)
             < mean2[:sh2, :sw2])
    dark2 = dark2[:lat_h2.shape[0], :lat_h2.shape[1]]
    k2 = max(11, round(density_window * r / 2)) | 1
    comp = grid_region_from_lattice(lat_h2, lat_v2, k2, dark=dark2,
                                    scale=r / 2)
    if debug_stash is not None:  # eager-mode diagnostics only
        debug_stash.update(lat_h2=lat_h2, lat_v2=lat_v2, dark2=dark2,
                           comp_pre=comp, k2=k2, r=r)
    # Structural corner validation: a decoy crossing cluster (page
    # corner, clutter) that survives the photometric gates can still
    # steal an extreme point — peel it by quad-edge lattice coverage
    # (see peel_stolen_corners). rho = the density window: decoy
    # clusters are at most one support-window wide.
    if peel_rounds > 0:
        lat_dil2 = dilate_union(lat_h2, lat_v2)
        comp, corners_half, edge_sup = peel_stolen_corners(
            comp, lat_dil2, rho=k2, rounds=peel_rounds)
    else:  # ablation/debug path: raw extreme pick, no validation
        corners_half = _extreme_corners(comp)
        edge_sup = jnp.ones((4,), jnp.float32)
    if debug_stash is not None:
        debug_stash.update(comp_post=comp)
    found_any = jnp.any(comp)

    corners_small = corners_half * 2.0 + 0.5
    corners = corners_small * float(ds) + (ds - 1) / 2.0

    x = corners[:, 0]
    y = corners[:, 1]
    area2 = jnp.abs(
        (x[0] * y[1] - x[1] * y[0]) + (x[1] * y[2] - x[2] * y[1])
        + (x[2] * y[3] - x[3] * y[2]) + (x[3] * y[0] - x[0] * y[3]))
    quad_area = area2 / 2.0
    area_frac = quad_area / jnp.float32(gh * gw)
    comp_px = jnp.sum(comp).astype(jnp.float32) * float(4 * ds * ds)
    fill = jnp.where(quad_area > 0, comp_px / jnp.maximum(quad_area, 1.0), 0.0)
    found = jnp.logical_and(found_any, area_frac >= min_area_frac)
    det = GridDetection(corners=corners, found=found,
                        area_frac=area_frac, fill=fill, edge_sup=edge_sup)
    return det, lat_h, lat_v, ds, small


def detect_grid(
    gray: jnp.ndarray,
    detect_width: int = 950,
    min_area_frac: float = 0.06,
    line_length: int = 31,
    density_window: int = 61,
) -> GridDetection:
    """Find the sudoku grid quad in a grayscale (H, W) uint8 image.

    Returns fixed-shape GridDetection; `found` is False when the line
    lattice is empty or the quad covers < min_area_frac of the image
    (reference cv/grid.py:37 semantics).
    """
    det, _, _, _, _ = detect_grid_full(
        gray, detect_width, min_area_frac, line_length, density_window)
    return det
