"""Ulysses-style sequence parallelism for video DiTs.

The reference has no sequence/context scaling at all (SURVEY.md §2.17:
max sequence = text tokens + image tokens on one GPU). HunyuanVideo
token counts explode with frames (a 129-frame 720p clip is >100k
tokens), so the TPU build shards the token sequence across a mesh axis:

- between blocks the token stream [B, S, D] is sharded on S over "sp"
  (norms, MLPs, modulation are token-local → zero communication);
- inside attention q/k/v [B, S, H, Dh] are resharded to head-parallel
  (H over "sp", S gathered) — every head still sees the full sequence,
  XLA lowers the reshard to all-to-alls over ICI (the Ulysses pattern,
  DeepSpeed-Ulysses arXiv:2309.14509);
- attention output reshards back to sequence-parallel.

All communication is expressed with `with_sharding_constraint`: model
code stays pure, XLA chooses the collectives. Enabled by the trainer
when the mesh has an "sp" axis > 1 (OT_MESH_SP env var); model code
calls `shard_seq`/`shard_heads` which are no-ops otherwise.
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from onetrainer_tpu.parallel.mesh import DATA_AXIS, FSDP_AXIS, SEQ_AXIS

_MESH = None


def enable_sp(mesh) -> None:
    """Activate sequence-parallel constraints for subsequent traces.
    Call before the train step is first traced (like the circular-padding
    switch, this is read at trace time)."""
    global _MESH
    _MESH = mesh


def disable_sp() -> None:
    global _MESH
    _MESH = None


def sp_enabled() -> bool:
    return _MESH is not None and _MESH.shape.get(SEQ_AXIS, 1) > 1


def _constraint(x, *axes):
    # batch dim stays UNCONSTRAINED: the train step shards it over
    # (data, fsdp), but init/sampling traces run with batch 1 — forcing
    # the batch sharding here would make those traces fail divisibility
    spec = P(P.UNCONSTRAINED, *axes)
    return jax.lax.with_sharding_constraint(x, NamedSharding(_MESH, spec))


def shard_seq(x):
    """Token stream [B, S, D]: shard S over "sp".

    Shapes are static under jit, so divisibility is checked at trace
    time: an indivisible S (e.g. img+txt concat with an odd text length)
    is left to XLA's sharding propagation instead of constrained."""
    if not sp_enabled() or x.shape[1] % _MESH.shape[SEQ_AXIS] != 0:
        return x
    return _constraint(x, SEQ_AXIS, None)


def shard_heads(x):
    """Attention heads [B, S, H, Dh]: gather S, shard H over "sp"
    (the all-to-all boundary of Ulysses). Requires H divisible by the
    sp size; smaller head counts skip the constraint at trace time."""
    if not sp_enabled() or x.shape[2] % _MESH.shape[SEQ_AXIS] != 0:
        return x
    return _constraint(x, None, SEQ_AXIS, None)


def maybe_ring_attention(q, k, v, kv_mask=None):
    """Ring attention (parallel/ring.py) when it is the better SP
    strategy for these shapes; None when the caller should take the
    Ulysses / plain path.

    Chosen when SP is on and either OT_RING_ATTENTION=1 forces it or
    the head count cannot split over "sp" (Ulysses' bound). Requires S
    divisible by the ring size (shard_map even-division rule)."""
    if not sp_enabled():
        return None
    import os
    sp = _MESH.shape[SEQ_AXIS]
    if q.shape[1] % sp != 0:
        return None
    forced = os.environ.get("OT_RING_ATTENTION") == "1"
    if not forced and q.shape[2] % sp == 0:
        return None
    from onetrainer_tpu.parallel.ring import ring_attention
    return ring_attention(q, k, v, _MESH, kv_mask=kv_mask)
