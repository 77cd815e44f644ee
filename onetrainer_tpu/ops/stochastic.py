"""bf16 stochastic rounding (reference:
modules/util/bf16_stochastic_rounding.py:5-31).

fp32 -> bf16 truncation biases low-magnitude updates to zero; adding
random bits to the dropped mantissa before truncation makes the rounding
unbiased, which is what lets bf16 weights train without fp32 masters.
Used at the parameter update (`apply_updates_stochastic`). jnp bit-twiddle
implementation (XLA fuses it into the update); a Pallas kernel using
pltpu.stochastic_round is the drop-in upgrade path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def stochastic_round_to_bf16(x: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
    """Round fp32 to bf16, stochastically on the dropped 16 mantissa bits."""
    x = x.astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    rand = jax.random.bits(rng, x.shape, dtype=jnp.uint32) & jnp.uint32(0xFFFF)
    rounded = bits + rand
    truncated = rounded & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(truncated, jnp.float32).astype(jnp.bfloat16)


def apply_updates_stochastic(params, updates, rng: jax.Array):
    """optax.apply_updates with stochastic rounding for bf16 leaves.

    fp32 leaves update exactly; bf16 leaves compute p+u in fp32 and round
    stochastically back to bf16."""
    leaves, treedef = jax.tree.flatten(params)
    rngs = jax.random.split(rng, len(leaves))
    rng_tree = treedef.unflatten(list(rngs))

    def apply_one(p, u, r):
        if u is None:
            return p
        if p.dtype == jnp.bfloat16:
            from onetrainer_tpu.ops.pallas_sr import can_use_pallas_sr, sr_update_pallas
            if can_use_pallas_sr(p):
                seed = jax.random.bits(r, (), dtype=jnp.uint32).astype(jnp.int32)
                return sr_update_pallas(p, u.astype(jnp.float32), seed)
            return stochastic_round_to_bf16(
                p.astype(jnp.float32) + u.astype(jnp.float32), r)
        return (p + u.astype(p.dtype)).astype(p.dtype)

    return jax.tree.map(apply_one, params, updates, rng_tree)
