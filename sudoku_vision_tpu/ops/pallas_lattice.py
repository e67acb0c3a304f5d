"""Pallas TPU kernel: the directional line bank in one fused kernel.

The line lattice (cv/grid.py::line_lattice_hv) is the hottest CV stage:
~400 translate/min/max ops over the detect-scale binary. The XLA version
round-trips every intermediate through HBM; this kernel keeps the whole
image (detect scale ~912x684 int8 = 0.6 MB) resident in VMEM and runs
the entire orientation bank on-chip — one HBM read, two HBM writes.

Static translations are expressed as pltpu.roll + an iota mask that
re-fills the wrapped region with the morphological identity (1 for
erosion, 0 for dilation), so the kernel contains no gathers and no
data-dependent control flow.

Falls back transparently to the XLA implementation off-TPU (tests run on
CPU) via line_lattice_hv_auto.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_plan(length: int) -> list[int]:
    """Doubling shifts covering [0, length) (van Herk decomposition)."""
    shifts = []
    covered = 1
    while covered < length:
        s = min(covered, length - covered)
        shifts.append(s)
        covered += s
    return shifts


def _translate_fill(x, dy: int, dx: int, fill: int):
    """Shift by a static (dy, dx), filling vacated pixels — roll + mask.

    int32 operands (Mosaic's rotate supports 32-bit lanes only)."""
    h, w = x.shape
    out = x
    if dy:
        out = pltpu.roll(out, dy % h, axis=0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        bad = rows < dy if dy > 0 else rows >= h + dy
        out = jnp.where(bad, jnp.int32(fill), out)
    if dx:
        out = pltpu.roll(out, dx % w, axis=1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        bad = cols < dx if dx > 0 else cols >= w + dx
        out = jnp.where(bad, jnp.int32(fill), out)
    return out


def _family_kernel(binary_ref, lat_ref, *, length: int,
                   angles_deg: Sequence[int], vertical: bool):
    b = binary_ref[:]  # already int32 0/1 (u8 compares unsupported in VPU)
    # Perpendicular thickening (3-tap max across the line direction).
    if vertical:
        thick = jnp.maximum(b, jnp.maximum(
            _translate_fill(b, 0, 1, 0), _translate_fill(b, 0, -1, 0)))
    else:
        thick = jnp.maximum(b, jnp.maximum(
            _translate_fill(b, 1, 0, 0), _translate_fill(b, -1, 0, 0)))

    shifts = _shift_plan(length)
    lat = jnp.zeros_like(b)
    for a in angles_deg:
        s = math.tan(math.radians(a))

        def off(k):
            return (k, int(round(k * s))) if vertical \
                else (int(round(k * s)), k)

        e = thick
        for k in shifts:
            dy, dx = off(k)
            e = jnp.minimum(e, _translate_fill(e, -dy, -dx, 1))
        d = e
        for k in shifts:
            dy, dx = off(k)
            d = jnp.maximum(d, _translate_fill(d, dy, dx, 0))
        lat = jnp.maximum(lat, d)
    lat_ref[:] = lat


def line_lattice_hv_pallas(
    binary: jnp.ndarray,
    length: int = 31,
    angles_deg: Sequence[int] = tuple(range(-45, 46, 5)),
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pallas line bank; binary uint8 (H, W) -> (lat_h, lat_v) int32 0/1.

    One kernel per orientation family (keeps live VMEM under budget:
    the image is int32 in-kernel because Mosaic's lane rotate is
    32-bit-only)."""
    h, w = binary.shape

    b01 = (binary > 0).astype(jnp.int32)

    def run(vertical: bool):
        kernel = partial(_family_kernel, length=length,
                         angles_deg=tuple(angles_deg), vertical=vertical)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(b01)

    return run(False), run(True)


def on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def line_lattice_hv_auto(binary, length: int = 31,
                         angles_deg=tuple(range(-45, 46, 5))):
    """Pallas on TPU, XLA fallback elsewhere (identical semantics)."""
    from sudoku_vision_tpu.cv.grid import line_lattice_hv

    if on_tpu():
        try:
            return line_lattice_hv_pallas(binary, length, angles_deg)
        except Exception:
            pass
    return line_lattice_hv(binary, length, angles_deg)
