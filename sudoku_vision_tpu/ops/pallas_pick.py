"""Pallas TPU kernel: batched in-row x-pick for the scanline extractor.

The scanline cell sampler (ops/warp.py::scanline_sample_cells_u8) ends
with "pick column xi[r, j] from row r" for 2268 rows x 28 picks. The
XLA formulation is two factored one-hot einsums; exact and MXU-friendly,
but the one-hot tensors and the intermediate are materialized in HBM:
wlo (81,28,28,128) bf16 + t1 (81,28,28,128) bf16 = ~65 MB of traffic
per frame — the dominant cost of the 0.15 ms/frame extract stage.

This kernel performs the same factored pick with the one-hots built and
consumed entirely in VMEM: per block of R rows it reads rows3
(R, rhi, rlo) uint8 and xi (R, co) int32, builds whi/wlo by iota
compare, contracts t1 = whi x rows3 on the MXU (batched (co, rhi) x
(rhi, rlo)), and lane-reduces t1 * wlo. HBM traffic drops to the
operands themselves (~2.5 MB/frame). Bit-exact vs the XLA path: row
values <= 255 are exact in bf16 (8 mantissa bits) and every sum has
exactly one nonzero term.

MEASURED NEGATIVE RESULT (2026-08-18, batch-32 production bench):
1386 fps with this kernel vs 1447 fps on the XLA einsum path (block
rows 128 vs 568 within noise of each other). The traffic theory was
wrong — XLA fuses the one-hot construction into the contractions well
enough that the stage was never HBM-bound, and the kernel pays VPU
iota-compare one-hot construction per block plus K=8 matmuls that
under-fill the MXU. Opt-in via SV_PALLAS_PICK=1 (ops/warp.py); kept
as a working template for in-VMEM gather-style work and as Mosaic
lowering coverage (uint8 loads, >=2D iota, batched dot_general).

Mosaic v5e notes: iota must be >= 2D (broadcasted_iota); rows arrive
pre-reshaped to (N, rhi, rlo) so the kernel never splits a lane dim;
co=28 sublane-pads transparently.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_ROWS = 568


def _kernel(rows_ref, xi_ref, out_ref, *, rhi: int, rlo: int, co: int):
    # Mosaic has no direct uint8->bf16 cast; chain through int32/f32.
    rows3 = (rows_ref[:].astype(jnp.int32).astype(jnp.float32)
             .astype(jnp.bfloat16))                   # (R, rhi, rlo)
    xi = xi_ref[:, :co]                               # (R, co) int32
    r = xi.shape[0]
    ih = jax.lax.broadcasted_iota(jnp.int32, (r, co, rhi), 2)
    il = jax.lax.broadcasted_iota(jnp.int32, (r, co, rlo), 2)
    whi = (ih == (xi // rlo)[:, :, None]).astype(jnp.bfloat16)
    wlo = (il == (xi % rlo)[:, :, None]).astype(jnp.bfloat16)
    t1 = jax.lax.dot_general(                          # (R, co, rlo)
        whi, rows3,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    picked = jnp.sum(t1 * wlo.astype(jnp.float32), axis=2)   # (R, co)
    out_ref[:, :co] = picked  # pad lanes never read back (sliced off)


def pick_columns_u8(rows: jnp.ndarray, xi: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """rows (N, W) uint8, xi (N, co) int32 in [0, W) -> (N, co) float32
    with out[r, j] = rows[r, xi[r, j]].

    W is padded to a multiple of 128 internally; callers must clip xi to
    [0, W). co <= 128 (the production shape is co = 28).
    """
    n, w = rows.shape
    co = xi.shape[1]
    assert co <= 128, co
    rlo = 128
    rhi = -(-w // rlo)
    br = _BLOCK_ROWS
    n_pad = -(-n // br) * br
    rows = jnp.pad(rows, ((0, n_pad - n), (0, rhi * rlo - w)))
    rows3 = rows.reshape(n_pad, rhi, rlo)
    co_pad = 128
    xi = jnp.pad(xi, ((0, n_pad - n), (0, co_pad - co)))
    out = pl.pallas_call(
        partial(_kernel, rhi=rhi, rlo=rlo, co=co),
        out_shape=jax.ShapeDtypeStruct((n_pad, co_pad), jnp.float32),
        grid=(n_pad // br,),
        in_specs=[
            pl.BlockSpec((br, rhi, rlo), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((br, co_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, co_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(rows3, xi)
    return out[:n, :co]
