"""Ring attention over the "sp" mesh axis (context parallelism).

Complements Ulysses SP (parallel/sp.py): Ulysses reshards to
head-parallel so it needs num_heads % sp == 0 and replicates the full
K/V per device inside attention. Ring attention keeps Q, K, V
sequence-sharded the whole time — each device computes online-softmax
partial attention of its local Q block against one K/V block at a time
while the K/V blocks rotate around the ring (`lax.ppermute` over ICI),
overlapping compute with neighbor transfers. The forward pass holds
O(S/p) activations and never materializes the S x S score matrix; the
backward pass re-derives each block's scores (jax.checkpoint on the
ring step) but `lax.scan` still records every step's carry — including
the rotating K/V blocks — as residuals, so training memory is
O(S) per device (~5 sequence-sized tensors), a p-fold win over
score-matrix attention but NOT O(S/p). A custom VJP that re-runs the
ring in reverse would get true O(S/p); not implemented.
(ring attention: arXiv:2310.01889; blockwise online softmax:
arXiv:2205.14135).

The reference has no sequence scaling of any kind (SURVEY.md §2.17).

Implementation notes (TPU-first):
- online softmax in fp32 accumulators (numerator, denominator, running
  max) — bf16 inputs, fp32 math on the MXU contraction outputs;
- `lax.scan` over ring steps (reverse-differentiable, so the backward
  pass is the ring run in reverse — no custom VJP needed);
- expressed with `shard_map` so the per-device block shapes are static
  and XLA schedules ppermute/compute overlap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from onetrainer_tpu.parallel.mesh import SEQ_AXIS

NEG_INF = -1e30


def _ring_attention_local(q, k, v, kv_mask, axis_name: str, axis_size: int):
    """Per-device body under shard_map.

    q:        [B, Sq_local, H, D]
    k, v:     [B, Skv_local, H, D]  (this device's block; rotates)
    kv_mask:  [B, Skv_local] bool or None (rotates with k/v)
    """
    scale = q.shape[-1] ** -0.5
    qf = q.astype(jnp.float32) * scale

    b, sq, h, d = q.shape
    num = jnp.zeros((b, sq, h, d), jnp.float32)     # weighted-value numerator
    den = jnp.zeros((b, sq, h), jnp.float32)        # softmax denominator
    mx = jnp.full((b, sq, h), NEG_INF, jnp.float32)  # running max

    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]

    def step(carry, _):
        # masked path carries (and rotates) the mask block; the common
        # unmasked video path skips that ICI traffic entirely
        if kv_mask is not None:
            num, den, mx, k_blk, v_blk, m_blk = carry
        else:
            num, den, mx, k_blk, v_blk = carry
            m_blk = None
        # scores for the current K/V block: [B, Sq, H, Skv]
        s = jnp.einsum("bqhd,bkhd->bqhk", qf, k_blk.astype(jnp.float32))
        if m_blk is not None:
            s = jnp.where(m_blk[:, None, None, :], s, NEG_INF)
        blk_max = s.max(axis=-1)                          # [B, Sq, H]
        new_mx = jnp.maximum(mx, blk_max)
        correction = jnp.exp(mx - new_mx)
        p = jnp.exp(s - new_mx[..., None])                # [B, Sq, H, Skv]
        num = num * correction[..., None] + jnp.einsum(
            "bqhk,bkhd->bqhd", p, v_blk.astype(jnp.float32))
        den = den * correction + p.sum(axis=-1)
        # rotate K/V (+mask) one step around the ring
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        if m_blk is not None:
            m_blk = jax.lax.ppermute(m_blk, axis_name, perm)
            return (num, den, new_mx, k_blk, v_blk, m_blk), None
        return (num, den, new_mx, k_blk, v_blk), None

    init = (num, den, mx, k, v) if kv_mask is None \
        else (num, den, mx, k, v, kv_mask)
    # checkpoint the step: the backward pass recomputes each block's
    # score matrix instead of saving axis_size of them (no O(S^2/p)
    # residuals; the scan carries — K/V blocks etc. — still accumulate
    # to O(S) per device, see module docstring)
    out_carry, _ = jax.lax.scan(
        jax.checkpoint(step), init, None, length=axis_size)
    num, den, mx = out_carry[0], out_carry[1], out_carry[2]
    out = num / jnp.maximum(den, 1e-30)[..., None]
    return out.astype(q.dtype)


def ring_attention(q, k, v, mesh: Mesh, kv_mask=None,
                   axis_name: str = SEQ_AXIS):
    """Global-view ring attention: q/k/v [B, S, H, D] (any sharding; the
    shard_map in_specs reshard to sequence-parallel), optional kv_mask
    [B, S] marking valid key/value positions. Returns [B, S, H, D]
    sharded on S over `axis_name`."""
    axis_size = mesh.shape[axis_name]
    qkv_spec = P(None, axis_name, None, None)
    mask_spec = P(None, axis_name)

    if kv_mask is None:
        fn = jax.shard_map(
            functools.partial(_ring_attention_local, kv_mask=None,
                              axis_name=axis_name, axis_size=axis_size),
            mesh=mesh,
            in_specs=(qkv_spec, qkv_spec, qkv_spec),
            out_specs=qkv_spec,
            check_vma=False)
        return fn(q, k, v)

    def local(q, k, v, m):
        return _ring_attention_local(q, k, v, m, axis_name=axis_name,
                                     axis_size=axis_size)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec, mask_spec),
        out_specs=qkv_spec,
        check_vma=False)
    return fn(q, k, v, kv_mask)
