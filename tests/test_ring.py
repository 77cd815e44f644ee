"""Ring attention (context parallelism) parity: the ppermute ring with
online softmax must match plain full attention exactly — forward and
gradients — on the 8-device CPU farm."""

import jax
import jax.numpy as jnp
import numpy as np

from onetrainer_tpu.parallel.mesh import create_mesh
from onetrainer_tpu.parallel.ring import ring_attention


def _full_attention(q, k, v, kv_mask=None):
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bqhd,bkhd->bqhk", q.astype(jnp.float32) * scale,
                   k.astype(jnp.float32))
    if kv_mask is not None:
        s = jnp.where(kv_mask[:, None, None, :], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqhk,bkhd->bqhd", p,
                      v.astype(jnp.float32)).astype(q.dtype)


def _inputs(b=2, s=16, h=3, d=8, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, s, h, d), dtype)
    k = jax.random.normal(ks[1], (b, s, h, d), dtype)
    v = jax.random.normal(ks[2], (b, s, h, d), dtype)
    return q, k, v


def test_ring_attention_matches_full():
    mesh = create_mesh(dp=1, fsdp=1, sp=8)
    q, k, v = _inputs()
    ref = _full_attention(q, k, v)
    out = jax.jit(lambda q, k, v: ring_attention(q, k, v, mesh))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_ring_attention_with_mask():
    mesh = create_mesh(dp=1, fsdp=1, sp=8)
    q, k, v = _inputs()
    mask = jnp.arange(16)[None, :] < jnp.asarray([[11], [16]])
    ref = _full_attention(q, k, v, mask)
    out = jax.jit(
        lambda q, k, v, m: ring_attention(q, k, v, mesh, kv_mask=m))(
        q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_ring_attention_fully_masked_row_is_zero():
    """A batch element whose kv are ALL masked must return exactly 0
    (and a +inf lse internally so the backward contributes nothing) —
    the additive -1e30 bias makes every p = exp(0) = 1, so den > 0 and a
    naive den>0 guard silently returns mean(v) instead."""
    mesh = create_mesh(dp=1, fsdp=1, sp=8)
    q, k, v = _inputs()
    mask = jnp.arange(16)[None, :] < jnp.asarray([[0], [16]])  # row 0: none
    out = jax.jit(
        lambda q, k, v, m: ring_attention(q, k, v, mesh, kv_mask=m))(
        q, k, v, mask)
    np.testing.assert_array_equal(np.asarray(out[0]), 0.0)
    # unmasked batch element still matches full attention
    ref = _full_attention(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref[1]),
                               rtol=1e-5, atol=1e-5)
    # gradients through the masked row are finite (no NaN from 0/0)
    def loss(q):
        o = ring_attention(q, k, v, mesh, kv_mask=mask)
        return (o.astype(jnp.float32) ** 2).sum()
    g = jax.jit(jax.grad(loss))(q)
    assert np.isfinite(np.asarray(g)).all()


def test_ring_attention_gradients():
    """Reverse-mode through the scan+ppermute ring equals full-attention
    gradients (training usability, not just inference)."""
    mesh = create_mesh(jax.devices()[:4], dp=1, fsdp=1, sp=4)
    q, k, v = _inputs(s=8)

    def loss_ring(q, k, v):
        return (ring_attention(q, k, v, mesh) ** 2).sum()

    def loss_full(q, k, v):
        return (_full_attention(q, k, v) ** 2).sum()

    g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    g_full = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ring, g_full):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_ring_attention_odd_heads():
    """Head counts NOT divisible by the ring size work (the case Ulysses
    SP cannot shard — ring attention removes the head-count bound)."""
    mesh = create_mesh(dp=1, fsdp=1, sp=8)
    q, k, v = _inputs(h=3)
    ref = _full_attention(q, k, v)
    out = jax.jit(lambda q, k, v: ring_attention(q, k, v, mesh))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
