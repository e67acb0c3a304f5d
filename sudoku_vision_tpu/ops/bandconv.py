"""Separable windowed filters as MXU band matmuls — exact, at full speed.

The ops/filters.py slice-MAC chains are exact but VPU/HBM-bound: every
tap is an elementwise pass over the full map. A separable correlation is
also a pair of banded matrix products

    out = B_h^T @ x @ B_w,   B[src, dst] = sum of taps t with
                             fold(dst + t - pad) == src

which the MXU executes orders of magnitude faster for detect-pyramid
shapes — the band matrices (built once per (n, taps, border) and cached)
fold the boundary rule into the matrix, so there is no pad pass at all.

Exactness on the FAST MXU path: the v5e MXU multiplies bf16 operands
into a float32 accumulator. bf16 represents integers up to 256 exactly
and the multiplier array computes each product exactly, so a matmul of
integer operands <= 256 with f32 accumulation below 2^24 is lossless at
DEFAULT precision (no bf16x3 slowdown). Operands are kept in that domain
by base-256 digit splitting: uint8 inputs are one digit; the row-pass
accumulator (<= 255 * sum(taps) <= 65280) splits into two digits for the
column pass, out = 256 * (B_h^T @ hi) + B_h^T @ lo. Verified
bit-identical to filters.sep_filter_int on CPU and real TPU
(tests/test_ops_parity.py; taps must be non-negative ints, which every
pipeline kernel satisfies).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

_EXACT_F32 = 1 << 24
_DIGIT = 256  # bf16 represents integers <= 256 exactly


def _fold(idx: int, n: int, border: str) -> int | None:
    """Map an out-of-range index to a source index per the border rule.
    None = the tap contributes nothing (constant-0 border)."""
    while idx < 0 or idx >= n:
        if border == "constant":
            return None
        if border == "replicate":
            return min(max(idx, 0), n - 1)
        # reflect101: ...2 1 | 0 1 2 ... n-1 | n-2 n-3...
        if idx < 0:
            idx = -idx
        else:
            idx = 2 * n - 2 - idx
    return idx


@lru_cache(maxsize=None)
def _band_matrix(n: int, taps: tuple[int, ...], border: str) -> np.ndarray:
    """(n, n) float32 B with out[dst] = sum_src B[src, dst] * x[src]."""
    pad = len(taps) // 2
    b = np.zeros((n, n), np.float32)
    for dst in range(n):
        for i, t in enumerate(taps):
            src = _fold(dst + i - pad, n, border)
            if src is not None:
                b[src, dst] += t
    return b


def _digits(a: jnp.ndarray, vmax: int):
    """Split exact-integer f32 values in [0, vmax] into base-256 digits
    (each digit <= 255 -> bf16-exact), least significant first."""
    out = []
    scale = 1
    while True:
        if vmax < _DIGIT:
            out.append((a, scale))
            return out
        hi = jnp.floor(a / _DIGIT)
        out.append((a - hi * _DIGIT, scale))
        a = hi
        vmax //= _DIGIT
        scale *= _DIGIT


def band_filter_int(
    x: jnp.ndarray, taps: tuple[int, ...], border: str = "reflect101",
    max_abs_in: int = 255,
) -> jnp.ndarray:
    """sep_filter_int semantics (correlate last two axes, raw integer
    accumulator out) on the fast MXU path. Returns int32, bit-identical
    to filters.sep_filter_int for 0 <= x <= max_abs_in and non-negative
    integer taps."""
    s = sum(taps)
    assert all(t >= 0 for t in taps), taps  # digit split needs sign-free
    assert max_abs_in * s * s < _EXACT_F32, (
        f"f32 accumulation not exact: {max_abs_in} * {s}^2 >= 2^24")
    h, w = x.shape[-2], x.shape[-1]
    bw = _band_matrix(w, taps, border)
    bh = _band_matrix(h, taps, border)
    assert max(bw.max(), bh.max()) <= _DIGIT, "border folds exceed bf16 ints"
    bw = jnp.asarray(bw, jnp.bfloat16)
    bh = jnp.asarray(bh, jnp.bfloat16)

    def mm(a, b):  # exact: bf16 integer operands, f32 accumulator
        return jnp.matmul(a.astype(jnp.bfloat16), b,
                          preferred_element_type=jnp.float32)

    def mm_t(b, a):
        return jnp.einsum("su,...sw->...uw", b, a.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    rows = sum(sc * mm(d, bw)
               for d, sc in _digits(x.astype(jnp.float32), max_abs_in))
    out = sum(sc * mm_t(bh, d) for d, sc in _digits(rows, max_abs_in * s))
    return out.astype(jnp.int32)


def band_filter_f32(
    x: jnp.ndarray, taps: tuple[float, ...], border: str = "reflect101",
) -> jnp.ndarray:
    """Float separable correlation on the MXU (no exactness claim)."""
    import jax

    h, w = x.shape[-2], x.shape[-1]
    bw = jnp.asarray(_band_matrix(w, tuple(taps), border))
    bh = jnp.asarray(_band_matrix(h, tuple(taps), border))
    rows = jnp.matmul(x.astype(jnp.float32), bw,
                      precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("su,...sw->...uw", bh, rows,
                      precision=jax.lax.Precision.HIGHEST)
