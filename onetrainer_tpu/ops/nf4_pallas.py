"""Gather-free NF4 dequantization as a Pallas TPU kernel (VERDICT r2 #8).

The jnp dequant path (`code[idx]` per element) lowers to per-weight
gathers; inside remat at SDXL scale XLA chews >30 min of compile on
them. This kernel removes the gather entirely: the 16-entry codebook
lookup becomes a sum of 16 vectorized selects (VPU-friendly, no dynamic
addressing), and nibble unpack is two shifts.

Packed layout (half-split): byte j holds element j in the HIGH nibble
and element j + n/2 in the LOW nibble, so decoding writes two contiguous
halves — no interleave relayout on the 8x128 tiles. `quantize_nf4`
produces this layout (ops/quant.py); the jnp fallback decodes it too.

Grid: rows of 128 packed bytes, `_BLOCK_ROWS` rows per program. Each
program decodes [R, 128] bytes into hi/lo planes [R, 128] and scales
them with the per-64-element absmax (two scale lanes per row, selected
with a lane iota — NF4 block 64 is preserved exactly).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from onetrainer_tpu.ops.quant import NF4_CODE

_BLOCK_ROWS = 256          # 256 rows x 128 lanes = 32k bytes/program
_LANES = 128


def _decode_plane(idx, code_f32):
    """idx [R, 128] int32 in 0..15 -> codebook values, gather-free."""
    out = jnp.zeros(idx.shape, jnp.float32)
    for i, c in enumerate(code_f32):
        out = out + jnp.where(idx == i, jnp.float32(c), 0.0)
    return out


def _nf4_kernel(q_ref, shi_ref, slo_ref, hi_ref, lo_ref):
    q = q_ref[...].astype(jnp.int32)           # [R, 128] packed bytes
    hi_idx = (q >> 4) & 0xF
    lo_idx = q & 0xF
    code = tuple(float(c) for c in NF4_CODE)
    hi = _decode_plane(hi_idx, code)
    lo = _decode_plane(lo_idx, code)
    # per-64 absmax: lanes 0..63 use scale column 0, lanes 64..127 column 1
    lane = jax.lax.broadcasted_iota(jnp.int32, hi.shape, 1)
    shi = jnp.where(lane < 64, shi_ref[:, 0:1], shi_ref[:, 1:2])
    slo = jnp.where(lane < 64, slo_ref[:, 0:1], slo_ref[:, 1:2])
    hi_ref[...] = (hi * shi).astype(hi_ref.dtype)
    lo_ref[...] = (lo * slo).astype(lo_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def nf4_dequant_flat(packed: jnp.ndarray, scales: jnp.ndarray,
                     out_dtype=jnp.bfloat16, interpret: bool = False):
    """packed [n_half] uint8 (half-split layout), scales [n_half // 32]
    f32 (block-64 absmax over the ORIGINAL element order) ->
    [2 * n_half] values. n_half must be a multiple of 128 * _BLOCK_ROWS /
    ... — callers pad via nf4_pad_len.
    """
    from jax.experimental import pallas as pl

    n_half = packed.shape[0]
    rows = n_half // _LANES
    assert rows % 8 == 0, rows
    q2d = packed.reshape(rows, _LANES)
    # scales: [nb] where block b covers elements [64b, 64b+64).
    # hi plane row r covers elements [128r, 128r+128)         -> scales[2r:2r+2]
    # lo plane row r covers elements n_half + [128r, 128r+128) -> offset rows
    s2d = scales.reshape(-1, 2)                # [rows_total, 2]
    shi = s2d[:rows]
    slo = s2d[rows:]

    block_rows = min(_BLOCK_ROWS, rows)
    while rows % block_rows:
        block_rows //= 2
    grid = (rows // block_rows,)
    hi, lo = pl.pallas_call(
        _nf4_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, _LANES), lambda r: (r, 0)),
            pl.BlockSpec((block_rows, 2), lambda r: (r, 0)),
            pl.BlockSpec((block_rows, 2), lambda r: (r, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_rows, _LANES), lambda r: (r, 0)),
            pl.BlockSpec((block_rows, _LANES), lambda r: (r, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, _LANES), out_dtype),
            jax.ShapeDtypeStruct((rows, _LANES), out_dtype),
        ],
        interpret=interpret,
    )(q2d, shi, slo)
    # [2, n_half] -> [n] is a layout no-op (row-major concat of halves)
    return jnp.stack([hi.reshape(-1), lo.reshape(-1)]).reshape(-1)


def nf4_pad_len(n: int) -> int:
    """Total element count after padding so the kernel tiles cleanly:
    half length must be a multiple of 8 rows x 128 lanes."""
    half = (n + 1) // 2
    unit = 8 * _LANES
    half_padded = ((half + unit - 1) // unit) * unit
    return 2 * half_padded
