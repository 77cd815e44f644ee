"""Pallas TPU kernel: fused stochastic-rounding parameter update.

out_bf16 = stochastic_round(p_bf16.astype(f32) + update_f32)

The jnp fallback in ops/stochastic.py works everywhere; this kernel uses
the TPU's hardware PRNG (pltpu.prng_random_bits) and native
pltpu.stochastic_round so the whole update is one VMEM-resident pass per
tile — no extra random-bits tensor materialized in HBM. On CPU the kernel
runs in interpreter mode (tests); dispatch picks it automatically for
large bf16 leaves on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_TILE_ROWS = 256  # (256, 128) f32 tile = 128KB in VMEM


def _sr_update_kernel(seed_ref, p_ref, u_ref, out_ref):
    # distinct stream per grid tile
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    summed = p_ref[:].astype(jnp.float32) + u_ref[:].astype(jnp.float32)
    rand = pltpu.bitcast(pltpu.prng_random_bits(summed.shape), jnp.uint32)
    # add random low-16 bits to the mantissa, truncate to bf16: unbiased
    # (explicit bit ops rather than pltpu.stochastic_round so the kernel
    # also runs under the CPU interpreter for tests)
    bits = pltpu.bitcast(summed, jnp.uint32)
    rounded = (bits + (rand & jnp.uint32(0xFFFF))) & jnp.uint32(0xFFFF0000)
    out_ref[:] = pltpu.bitcast(rounded, jnp.float32).astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("interpret",))
def sr_update_pallas(params: jnp.ndarray, updates: jnp.ndarray,
                     seed: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """params bf16 [..], updates f32 [..] -> bf16, stochastically rounded."""
    orig_shape = params.shape
    flat_p = params.reshape(-1)
    flat_u = updates.reshape(-1)
    n = flat_p.shape[0]

    tile = _TILE_ROWS * _LANE
    padded = ((n + tile - 1) // tile) * tile
    if padded != n:
        flat_p = jnp.pad(flat_p, (0, padded - n))
        flat_u = jnp.pad(flat_u, (0, padded - n))
    rows = padded // _LANE
    p2 = flat_p.reshape(rows, _LANE)
    u2 = flat_u.reshape(rows, _LANE)

    grid = rows // _TILE_ROWS
    out = pl.pallas_call(
        _sr_update_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_TILE_ROWS, _LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_ROWS, _LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE_ROWS, _LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, _LANE), jnp.bfloat16),
        interpret=interpret,
    )(seed.reshape(1).astype(jnp.int32), p2, u2)

    return out.reshape(-1)[:n].reshape(orig_shape)


def can_use_pallas_sr(leaf: jnp.ndarray) -> bool:
    return (jax.default_backend() == "tpu"
            and leaf.dtype == jnp.bfloat16
            and leaf.size >= _TILE_ROWS * _LANE)
