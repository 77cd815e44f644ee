"""Ring attention over the "sp" mesh axis (context parallelism).

Complements Ulysses SP (parallel/sp.py): Ulysses reshards to
head-parallel so it needs num_heads % sp == 0 and replicates the full
K/V per device inside attention. Ring attention keeps Q, K, V
sequence-sharded the whole time — each device computes online-softmax
partial attention of its local Q block against one K/V block at a time
while the K/V blocks rotate around the ring (`lax.ppermute` over ICI),
overlapping compute with neighbor transfers.
(ring attention: arXiv:2310.01889; blockwise online softmax:
arXiv:2205.14135).

Memory is O(S/p) per device in BOTH passes (r3): a custom VJP re-runs
the ring in the backward — dK/dV travel around the ring with their K/V
blocks and arrive home after p steps, dQ accumulates locally — so the
only residuals are the layer's own inputs plus the output and the
logsumexp row stats. (The r2 version relied on `lax.scan` AD, whose
per-step carry residuals made training memory O(S).)

The reference has no sequence scaling of any kind (SURVEY.md §2.17).

Implementation notes (TPU-first):
- online softmax in fp32 accumulators (numerator, denominator, running
  max) — bf16 inputs, fp32 math on the MXU contraction outputs;
- the kv mask travels as an ADDITIVE float bias (0 / -inf) so the
  custom-VJP cotangent for it is a plain zero array;
- expressed with `shard_map` so the per-device block shapes are static
  and XLA schedules ppermute/compute overlap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from onetrainer_tpu.parallel.mesh import SEQ_AXIS

NEG_INF = -1e30


def _ring_perm(axis_size: int):
    return [(i, (i + 1) % axis_size) for i in range(axis_size)]


def _fwd_scan(qf, k, v, bias, axis_name: str, axis_size: int):
    """-> (out fp32 [B,Sq,H,D], lse [B,Sq,H]). bias: [B,Skv] fp32 or None."""
    b, sq, h, d = qf.shape
    num = jnp.zeros((b, sq, h, d), jnp.float32)
    den = jnp.zeros((b, sq, h), jnp.float32)
    mx = jnp.full((b, sq, h), NEG_INF, jnp.float32)
    perm = _ring_perm(axis_size)

    def step(carry, _):
        if bias is not None:
            num, den, mx, k_blk, v_blk, b_blk = carry
        else:
            num, den, mx, k_blk, v_blk = carry
            b_blk = None
        s = jnp.einsum("bqhd,bkhd->bqhk", qf, k_blk.astype(jnp.float32))
        if b_blk is not None:
            s = s + b_blk[:, None, None, :]
        blk_max = jnp.maximum(s.max(axis=-1), NEG_INF)
        new_mx = jnp.maximum(mx, blk_max)
        correction = jnp.exp(mx - new_mx)
        p = jnp.exp(s - new_mx[..., None])
        num = num * correction[..., None] + jnp.einsum(
            "bqhk,bkhd->bqhd", p, v_blk.astype(jnp.float32))
        den = den * correction + p.sum(axis=-1)
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        if b_blk is not None:
            b_blk = jax.lax.ppermute(b_blk, axis_name, perm)
            return (num, den, new_mx, k_blk, v_blk, b_blk), None
        return (num, den, new_mx, k_blk, v_blk), None

    init = (num, den, mx, k, v) if bias is None else (num, den, mx, k, v, bias)
    out_carry, _ = jax.lax.scan(step, init, None, length=axis_size)
    num, den, mx = out_carry[0], out_carry[1], out_carry[2]
    # fully-masked rows: every key carries the additive -1e30 bias, so
    # s rounds to NEG_INF exactly, p = exp(0) = 1 per entry and den
    # accumulates Skv (NOT 0) — detect them by the row max never rising
    # above the mask floor, and force out = 0 / lse = +inf so the
    # backward's exp(s - lse) is exactly 0
    masked_row = mx <= NEG_INF * 0.5
    out = jnp.where(masked_row[..., None], 0.0,
                    num / jnp.maximum(den, 1e-30)[..., None])
    lse = jnp.where(masked_row, jnp.inf,
                    mx + jnp.log(jnp.maximum(den, 1e-30)))
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _ring_core(q, k, v, bias, axis_name: str, axis_size: int):
    scale = q.shape[-1] ** -0.5
    out, _ = _fwd_scan(q.astype(jnp.float32) * scale, k, v, bias,
                       axis_name, axis_size)
    return out.astype(q.dtype)


def _ring_core_fwd(q, k, v, bias, axis_name: str, axis_size: int):
    scale = q.shape[-1] ** -0.5
    out32, lse = _fwd_scan(q.astype(jnp.float32) * scale, k, v, bias,
                           axis_name, axis_size)
    # O(S/p) residuals: the layer inputs + output + row stats only
    return out32.astype(q.dtype), (q, k, v, bias, out32, lse)


def _ring_core_bwd(axis_name: str, axis_size: int, res, g):
    q, k, v, bias, out32, lse = res
    scale = q.shape[-1] ** -0.5
    qf = q.astype(jnp.float32) * scale
    g32 = g.astype(jnp.float32)
    delta = (g32 * out32).sum(axis=-1)                 # [B,Sq,H]
    perm = _ring_perm(axis_size)

    dq0 = jnp.zeros_like(qf)
    dk0 = jnp.zeros(k.shape, jnp.float32)
    dv0 = jnp.zeros(v.shape, jnp.float32)

    def step(carry, _):
        if bias is not None:
            k_blk, v_blk, b_blk, dk_blk, dv_blk, dq = carry
        else:
            k_blk, v_blk, dk_blk, dv_blk, dq = carry
            b_blk = None
        kf = k_blk.astype(jnp.float32)
        s = jnp.einsum("bqhd,bkhd->bqhk", qf, kf)
        if b_blk is not None:
            s = s + b_blk[:, None, None, :]
        p = jnp.exp(s - lse[..., None])                # [B,Sq,H,K]
        dv_blk = dv_blk + jnp.einsum("bqhk,bqhd->bkhd", p, g32)
        dp = jnp.einsum("bqhd,bkhd->bqhk", g32, v_blk.astype(jnp.float32))
        ds = p * (dp - delta[..., None])
        dq = dq + jnp.einsum("bqhk,bkhd->bqhd", ds, kf)
        dk_blk = dk_blk + jnp.einsum("bqhk,bqhd->bkhd", ds, qf)
        # dK/dV rotate WITH their K/V block: after axis_size steps each
        # gradient block is back on the device that owns that K/V shard
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        dk_blk = jax.lax.ppermute(dk_blk, axis_name, perm)
        dv_blk = jax.lax.ppermute(dv_blk, axis_name, perm)
        if b_blk is not None:
            b_blk = jax.lax.ppermute(b_blk, axis_name, perm)
            return (k_blk, v_blk, b_blk, dk_blk, dv_blk, dq), None
        return (k_blk, v_blk, dk_blk, dv_blk, dq), None

    init = (k, v, dk0, dv0, dq0) if bias is None \
        else (k, v, bias, dk0, dv0, dq0)
    out_carry, _ = jax.lax.scan(step, init, None, length=axis_size)
    if bias is not None:
        _, _, _, dk, dv, dq = out_carry
        dbias = jnp.zeros_like(bias)
    else:
        _, _, dk, dv, dq = out_carry
        dbias = None
    return (dq.astype(q.dtype) * scale, dk.astype(k.dtype),
            dv.astype(v.dtype), dbias)


_ring_core.defvjp(_ring_core_fwd, _ring_core_bwd)


def _ring_attention_local(q, k, v, kv_mask, axis_name: str, axis_size: int):
    """Per-device body under shard_map.

    q:        [B, Sq_local, H, D]
    k, v:     [B, Skv_local, H, D]  (this device's block; rotates)
    kv_mask:  [B, Skv_local] bool or None (becomes an additive bias)
    """
    bias = None
    if kv_mask is not None:
        bias = jnp.where(kv_mask.astype(bool), 0.0, NEG_INF).astype(
            jnp.float32)
    return _ring_core(q, k, v, bias, axis_name, axis_size)


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
