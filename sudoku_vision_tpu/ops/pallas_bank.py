"""Pallas TPU kernel: the bit-packed directional line bank in VMEM.

The orientation bank (cv/grid.py::_line_lattice_hv_packed) is detection's
dominant elementwise stage: ~760 translate/AND/OR passes over the packed
(G, H, W) uint32 bitplane map (32 frames per word). XLA fuses chains of
them but still materializes most intermediate maps in HBM — measured
0.075 ms/frame at batch 32. This kernel keeps the ENTIRE bank resident
in VMEM: the packed map is read once, both family lattices are written
once, and the ~380 erode/dilate translations per family run as
pltpu.roll + static iota masks on-chip (the VERDICT-r2 "whole bank in
VMEM over the bit-packed batch" design).

Differences from the failed dense prototype (ops/pallas_lattice.py,
kept as the negative-result record):
  * operates on the PACKED uint32 bitplanes (32x less data — the dense
    kernel moved 10x more bytes than the production path it raced);
  * the angle loop is fully UNROLLED with static shift offsets (the
    dense kernel's on-core fori_loop serialized what XLA pipelines);
  * erosion/dilation are single AND/OR ops (bitwise on 32 frames at
    once), not min/max on int32.

Exactness: bit-identical to _line_lattice_hv_packed by construction —
the same van-Herk shift plan, the same (dy, dx) offsets, and the same
out-of-frame semantics: a shifted-in region reads the op identity
(all-ones for erosion, zeros for dilation). Lane padding to the 128
boundary is handled by masking against the TRUE width, so pad lanes
always carry the identity and never leak ink. Asserted equal on CPU
interpret in tests/test_pallas_bank.py.

STATUS (2026-08-20, supersedes 2026-08-19): the FULL-BANK kernel is
Mosaic-compile-pathological and is closed as a negative result. On a
session where fresh Mosaic compiles demonstrably work (the pool
kernel compiled fresh in minutes, an XLA build of this same bank
graph compiled in 2.6 s), compiling THIS kernel's ~760-op unrolled
body hung the remote compile service >30 min on two separate
attempts (and >40 min in the round-3 session) — compile time scales
superlinearly in body size somewhere past a few dozen vector ops.
Do not re-attempt the monolithic body.

What DOES work: the same VMEM-residency idea split per angle —
`line_bank_packed_pallas_split` below issues one pallas_call per
(angle) with the ~40-op single-angle body (measured compile: 148 s
first, ~12 s per subsequent kernel, all persistent-cached) and lets
XLA fuse the 19-way OR-combine. Parity and the TPU race live in
`race_main` (python -m sudoku_vision_tpu.ops.pallas_bank).

RACE RESULT (2026-08-21, real v5e, golden-frame packed binary
(1, 912, 684) = 32 frames, scalar-reduced fetch-timed, 3 windows):
XLA 0.146/0.101/0.108 ms/frame vs split-Pallas 0.215/0.106/0.105 —
a WASH within the tunnel's noise band. The round-2 hypothesis
("XLA materializes most intermediate maps in HBM") is refuted at
this size: the whole packed working set is ~2.5 MB, XLA's fusion
keeps the chain pipelined, and the split kernel's 19 HBM
read/write round-trips cost exactly what XLA's materializations
do. The bank stays on the XLA formulation (zero Mosaic compile
risk); this module is kept as the executed negative-result record
and stays strictly OPT-IN (SV_PALLAS_BANK=1, unwired). Verdict for
future sessions: detection fusion has no Pallas win left at this
working-set size — only a whole-pipeline (thresh->pack->bank->
gates->region) megakernel could change the traffic equation, and
that body size is exactly what the Mosaic service cannot compile.

Mosaic v5e notes (inherited from the round-2 kernels): rolls are the
supported lane/sublane rotate and are 32-bit only (uint32 is native
here); shapes padded to (8k, 128k); no strided slices, so the crop back
to true width happens outside the kernel.
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ONES = 0xFFFFFFFF


def _shift_plan(length: int) -> list[int]:
    """Doubling shifts covering [0, length) (van Herk; must match
    cv/grid.py::_directional_open_packed exactly)."""
    shifts = []
    covered = 1
    while covered < length:
        s = min(covered, length - covered)
        shifts.append(s)
        covered += s
    return shifts


def _offsets(angles_deg: Sequence[int], length: int, vertical: bool):
    """Static (dy, dx) per (angle, shift step) — cv/grid.py's `off`."""
    plan = _shift_plan(length)
    out = []
    for a in angles_deg:
        s = math.tan(math.radians(a))
        out.append([
            ((k, int(round(k * s))) if vertical
             else (int(round(k * s)), k))
            for k in plan])
    return out


def _translate(x, dy: int, dx: int, fill: int, true_w: int,
               rows, cols):
    """out[r, c] = x[r - dy, c - dx], out-of-frame (incl. the lane pad
    beyond true_w) reads `fill`. Static shifts -> static masks."""
    h, wp = x.shape
    out = x
    if dy:
        out = pltpu.roll(out, dy % h, axis=0)
    # Rows whose source r - dy falls outside [0, h).
    if dy > 0:
        out = jnp.where(rows < dy, jnp.uint32(fill), out)
    elif dy < 0:
        out = jnp.where(rows >= h + dy, jnp.uint32(fill), out)
    if dx:
        out = pltpu.roll(out, dx % wp, axis=1)
    # Columns whose source c - dx falls outside [0, true_w) — using the
    # TRUE width keeps the [true_w, wp) pad at the op identity always
    # (applied even for dx = 0).
    out = jnp.where((cols < max(dx, 0)) | (cols >= true_w + dx),
                    jnp.uint32(fill), out)
    return out


def _bank_kernel(packed_ref, lath_ref, latv_ref, *, offs_h, offs_v,
                 true_w: int):
    b = packed_ref[0]  # (H, Wp) uint32
    h, wp = b.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, wp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, wp), 1)
    tr = partial(_translate, true_w=true_w, rows=rows, cols=cols)
    # Zero the lane pad once; every subsequent op re-masks it.
    b = jnp.where(cols >= true_w, jnp.uint32(0), b)

    def family(thick, offs):
        lat = jnp.zeros_like(thick)
        for angle_offs in offs:
            e = thick
            for dy, dx in angle_offs:
                e = e & tr(e, -dy, -dx, _ONES)
            d = e
            for dy, dx in angle_offs:
                d = d | tr(d, dy, dx, 0)
            lat = lat | d
        return lat

    # 3-wide thicken ACROSS the line direction (cv/grid.py: horizontal
    # lines thicken over rows, vertical over lanes), fill 0.
    thick_h = b | tr(b, 1, 0, 0) | tr(b, -1, 0, 0)
    thick_v = b | tr(b, 0, 1, 0) | tr(b, 0, -1, 0)
    lath_ref[0] = family(thick_h, offs_h)
    latv_ref[0] = family(thick_v, offs_v)


def line_bank_packed_pallas(
    packed: jnp.ndarray,
    length: int,
    angles_deg: Sequence[int],
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(G, H, W) uint32 bitplanes -> (lat_h, lat_v) same shape.

    Includes the 3-wide thicken (the XLA path applies it before the
    bank); input must be the raw packed binary.
    """
    g, h, w = packed.shape
    hp = -(-h // 8) * 8
    wp = -(-w // 128) * 128
    if (hp, wp) != (h, w):
        packed = jnp.pad(packed, ((0, 0), (0, hp - h), (0, wp - w)))
    kernel = partial(
        _bank_kernel,
        offs_h=_offsets(angles_deg, length, vertical=False),
        offs_v=_offsets(angles_deg, length, vertical=True),
        true_w=w)
    lat_h, lat_v = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((g, hp, wp), jnp.uint32),
                   jax.ShapeDtypeStruct((g, hp, wp), jnp.uint32)),
        grid=(g,),
        in_specs=[pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, hp, wp), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(packed)
    return lat_h[:, :h, :w], lat_v[:, :h, :w]


def line_bank_packed_pallas_split(
    packed: jnp.ndarray,
    length: int,
    angles_deg: Sequence[int],
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-angle pallas_calls, OR-combined in XLA.

    Same math as line_bank_packed_pallas (thicken + van-Herk open per
    angle, both families), but each angle gets its OWN ~20-op kernel
    body: the monolithic 760-op body never returns from the Mosaic
    compile service (see STATUS), while single-angle bodies compile in
    seconds and cache. The angle union is a pure OR, so splitting is
    exact by construction; XLA fuses the 19-input OR chains into one
    elementwise pass per family. The 3-wide thicken is recomputed
    inside every kernel — 4 extra VMEM ops per angle, free next to a
    second HBM pass to stage a thickened copy.
    """
    acc_h = acc_v = None
    for a in angles_deg:
        lh, lv = line_bank_packed_pallas(
            packed, length, (a,), interpret=interpret)
        acc_h = lh if acc_h is None else acc_h | lh
        acc_v = lv if acc_v is None else acc_v | lv
    return acc_h, acc_v


def bank_enabled() -> bool:
    """Strictly opt-in (SV_PALLAS_BANK=1) until raced on real TPU —
    see STATUS in the module docstring."""
    from sudoku_vision_tpu.ops.pallas_lattice import on_tpu

    return os.environ.get("SV_PALLAS_BANK") == "1" and on_tpu()


def race_main(batch: int = 32, n: int = 30) -> None:
    """Race XLA vs Pallas bank on the golden frames' detect-scale packed
    binary (bit-parity asserted first). Run when fresh Mosaic compiles
    work again: `python -m sudoku_vision_tpu.ops.pallas_bank`."""
    import glob
    import time

    import numpy as np

    from sudoku_vision_tpu.utils import jax_cache

    jax_cache.enable()

    from sudoku_vision_tpu.cv import grid as G
    from sudoku_vision_tpu.ops.filters import gaussian_blur_u8
    from sudoku_vision_tpu.ops.pallas_pool import pooled_gray_packed
    from sudoku_vision_tpu.ops.threshold import adaptive_threshold
    from sudoku_vision_tpu.utils.imageio import load_bgr

    angles = tuple(range(-45, 46, 5))
    paths = sorted(glob.glob("/root/repo/data/golden/sample_*.jpg"))
    frames = [load_bgr(p) for p in paths]
    frames = [f for f in frames if f.shape == frames[0].shape]
    reps = -(-batch // len(frames))
    stack = np.stack((frames * reps)[:batch])
    b, gh, gw, _ = stack.shape
    x2 = jax.device_put(jnp.asarray(stack.reshape(b, gh, gw * 3)))

    @jax.jit
    def packed_binary(x2):
        def one(img2):
            ds = max(1, round(max(gh, gw) / 950.0))
            small = pooled_gray_packed(img2, ds)
            return adaptive_threshold(gaussian_blur_u8(small, 5), 11, 2,
                                      method="gaussian", invert=True)
        return G._pack_bits((jax.vmap(one)(x2) > 0).astype(jnp.uint32))

    packed = jax.device_put(np.asarray(packed_binary(x2)))
    print("packed", packed.shape, flush=True)

    @jax.jit
    def xla_bank(p):
        th = G._window_or_packed(p, 3, 1)
        tv = G._window_or_packed(p, 3, 2)
        lh = jnp.zeros_like(p)
        lv = jnp.zeros_like(p)
        for a in angles:
            s = math.tan(math.radians(a))
            lh = lh | G._directional_open_packed(th, s, 31, vertical=False)
            lv = lv | G._directional_open_packed(tv, s, 31, vertical=True)
        return lh, lv

    if os.environ.get("SV_RACE_FULL") == "1":
        # The monolithic body hangs the Mosaic compile service (see
        # STATUS) — only attempt it on explicit request.
        pallas_bank_fn = lambda p: line_bank_packed_pallas(p, 31, angles)
    else:
        pallas_bank_fn = lambda p: line_bank_packed_pallas_split(
            p, 31, angles)
    pallas_fn = jax.jit(pallas_bank_fn)
    want = tuple(np.asarray(r) for r in xla_bank(packed))
    t0 = time.perf_counter()
    got = tuple(np.asarray(r) for r in pallas_fn(packed))
    print(f"pallas bank compiled+ran in {time.perf_counter()-t0:.1f}s",
          flush=True)
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])
    print("BIT-IDENTICAL on this backend", flush=True)

    # Timing: reduce to ONE scalar on device — fetching the 2x2.5 MB
    # lattices through the axon tunnel costs ~80 ms/iter and buries any
    # compute difference (first version of this harness did exactly
    # that).
    @jax.jit
    def xla_sum(p):
        lh, lv = xla_bank(p)  # nested jit inlines
        return jnp.sum(lh ^ lv)

    @jax.jit
    def pallas_sum(p):
        lh, lv = pallas_bank_fn(p)
        return jnp.sum(lh ^ lv)

    def race(fn, label):
        # copy_to_host_async on EVERY result: a bare np.asarray issues a
        # synchronous fetch RPC (~25 ms tunnel round trip per iteration,
        # which swamps the ~2.4 ms compute).
        inflight = []
        for _ in range(8):
            r = fn(packed)
            r.copy_to_host_async()
            inflight.append(r)
        total = n
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn(packed)
            r.copy_to_host_async()
            inflight.append(r)
            np.asarray(inflight.pop(0))
        for r in inflight:
            np.asarray(r)
            total += 1
        dt = (time.perf_counter() - t0) / total
        print(f"{label:8s} {dt*1e3:7.3f} ms/batch "
              f"{dt/batch*1e3:7.4f} ms/frame", flush=True)

    for _ in range(3):
        race(xla_sum, "xla")
        race(pallas_sum, "pallas")


if __name__ == "__main__":
    race_main()
