"""Parity tests for the folded-layout flash attention kernel
(ops/flash_folded.py) against a plain fp32 softmax-attention reference,
forward and backward, with and without kv-drop masking.

Runs in Pallas interpret mode on the CPU farm; the same code path
compiles via Mosaic on TPU (measured in experiments/exp_flash_folded.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onetrainer_tpu.ops.flash_folded import flash_attention_folded


def _ref_attention(q, k, v, num_heads, sm_scale, kv_keep=None):
    """fp32 reference over folded [B, S, H*dp] tensors."""
    b, sq, inner = q.shape
    skv = k.shape[1]
    dp = inner // num_heads
    qf = q.astype(jnp.float32).reshape(b, sq, num_heads, dp)
    kf = k.astype(jnp.float32).reshape(b, skv, num_heads, dp)
    vf = v.astype(jnp.float32).reshape(b, skv, num_heads, dp)
    s = jnp.einsum("bqhd,bkhd->bhqk", qf, kf) * sm_scale
    if kv_keep is not None:
        s = jnp.where(kv_keep[:, None, None, :], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, vf)
    return o.reshape(b, sq, inner).astype(q.dtype)


def _rand(key, shape):
    return jax.random.normal(key, shape, jnp.float32).astype(jnp.bfloat16)


@pytest.mark.parametrize("dp,num_heads", [(64, 4), (128, 2)])
def test_forward_matches_reference(dp, num_heads):
    b, sq, skv = 2, 256, 384
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = _rand(ks[0], (b, sq, num_heads * dp))
    k = _rand(ks[1], (b, skv, num_heads * dp))
    v = _rand(ks[2], (b, skv, num_heads * dp))
    sm = 1.0 / np.sqrt(dp)
    out = flash_attention_folded(q, k, v, num_heads, sm_scale=sm,
                                 block_q=128, block_k=128)
    ref = _ref_attention(q, k, v, num_heads, sm)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_forward_with_kv_keep():
    b, sq, skv, nh, dp = 2, 128, 256, 4, 64
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = _rand(ks[0], (b, sq, nh * dp))
    k = _rand(ks[1], (b, skv, nh * dp))
    v = _rand(ks[2], (b, skv, nh * dp))
    # drop a text-padding style tail + a hole in the middle
    keep = jnp.ones((b, skv), bool)
    keep = keep.at[:, 200:].set(False).at[0, 64:80].set(False)
    sm = 1.0 / np.sqrt(dp)
    out = flash_attention_folded(q, k, v, nh, sm_scale=sm, kv_keep=keep,
                                 block_q=128, block_k=128)
    ref = _ref_attention(q, k, v, nh, sm, kv_keep=keep)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_fully_masked_chunk_then_real_kv():
    """A whole leading block_k chunk masked: fp32-absorption transient
    must be wiped once real kv arrives (see module docstring)."""
    b, sq, skv, nh, dp = 1, 128, 384, 2, 64
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    q = _rand(ks[0], (b, sq, nh * dp))
    k = _rand(ks[1], (b, skv, nh * dp))
    v = _rand(ks[2], (b, skv, nh * dp))
    keep = jnp.ones((b, skv), bool).at[:, :128].set(False)
    sm = 1.0 / np.sqrt(dp)
    out = flash_attention_folded(q, k, v, nh, sm_scale=sm, kv_keep=keep,
                                 block_q=128, block_k=128)
    ref = _ref_attention(q, k, v, nh, sm, kv_keep=keep)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("use_keep", [False, True])
def test_grads_match_reference(use_keep):
    b, sq, skv, nh, dp = 2, 128, 256, 4, 64
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q = _rand(ks[0], (b, sq, nh * dp))
    k = _rand(ks[1], (b, skv, nh * dp))
    v = _rand(ks[2], (b, skv, nh * dp))
    keep = None
    if use_keep:
        keep = jnp.ones((b, skv), bool).at[:, 230:].set(False)
    sm = 1.0 / np.sqrt(dp)
    w = jax.random.normal(jax.random.PRNGKey(3), (b, sq, nh * dp),
                          jnp.float32)

    def loss_flash(q, k, v):
        o = flash_attention_folded(q, k, v, nh, sm_scale=sm, kv_keep=keep,
                                   block_q=128, block_k=128)
        return jnp.sum(o.astype(jnp.float32) * w)

    def loss_ref(q, k, v):
        o = _ref_attention(q, k, v, nh, sm, kv_keep=keep)
        return jnp.sum(o.astype(jnp.float32) * w)

    g = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b_, np.float32),
                                   atol=6e-2, rtol=6e-2)


@pytest.mark.parametrize("dp,num_heads,use_keep",
                         [(64, 4, False), (64, 4, True), (128, 2, False)])
def test_streaming_dkv_grads_match_reference(monkeypatch, dp, num_heads,
                                             use_keep):
    """Long sequences route dk/dv through the q-streaming 4-D-grid kernel
    (`_dkv_stream_kernel`, fp32 accumulation across output revisits).
    Force it by shrinking the residency threshold and check grads against
    the fp32 reference AND against the resident kernel's grads."""
    from onetrainer_tpu.ops import flash_folded as ff

    b, sq, skv, nh = 2, 384, 256, num_heads
    ks = jax.random.split(jax.random.PRNGKey(9), 3)
    q = _rand(ks[0], (b, sq, nh * dp))
    k = _rand(ks[1], (b, skv, nh * dp))
    v = _rand(ks[2], (b, skv, nh * dp))
    keep = None
    if use_keep:
        keep = jnp.ones((b, skv), bool).at[:, 230:].set(False)
    sm = 1.0 / np.sqrt(dp)
    w = jax.random.normal(jax.random.PRNGKey(3), (b, sq, nh * dp),
                          jnp.float32)

    def loss_flash(q, k, v):
        o = flash_attention_folded(q, k, v, nh, sm_scale=sm, kv_keep=keep,
                                   block_q=128, block_k=128)
        return jnp.sum(o.astype(jnp.float32) * w)

    def loss_ref(q, k, v):
        o = _ref_attention(q, k, v, nh, sm, kv_keep=keep)
        return jnp.sum(o.astype(jnp.float32) * w)

    g_res = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    monkeypatch.setattr(ff, "_DKV_RESIDENT_MAX_SEQ", 128)
    g = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b_, np.float32),
                                   atol=6e-2, rtol=6e-2)
    # dk/dv from the two kernels agree tightly (same math, fp32 accum)
    for a, b_ in zip(g[1:], g_res[1:]):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b_, np.float32),
                                   atol=1e-2, rtol=1e-2)


@pytest.mark.parametrize("with_mask", [False, True])
def test_dispatcher_folded_path_matches_fallback(monkeypatch, with_mask):
    """attention() with OT_FLASH_FOLDED=1 (+FORCE on CPU) must route to
    the folded kernel — including ragged S needing pad + kv-keep — and
    agree with the XLA fallback."""
    from onetrainer_tpu.ops import attention as attn_mod

    b, sq, nh, dp = 2, 300, 4, 64     # ragged: pads to 384
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    q = _rand(ks[0], (b, sq, nh * dp))
    k = _rand(ks[1], (b, sq, nh * dp))
    v = _rand(ks[2], (b, sq, nh * dp))
    mask = None
    if with_mask:
        keep = jnp.ones((b, sq), bool).at[:, 280:].set(False)
        mask = keep[:, None, None, :]

    # d=64 routes folded BY DEFAULT (OT_FORCE_FLASH only lifts the
    # TPU-backend gate for the CPU farm)
    monkeypatch.setenv("OT_FORCE_FLASH", "1")
    before = attn_mod.STATS["folded"]
    out = attn_mod.attention(q, k, v, nh, mask=mask)
    assert attn_mod.STATS["folded"] == before + 1

    monkeypatch.setenv("OT_NO_FLASH_FOLDED", "1")
    monkeypatch.delenv("OT_FORCE_FLASH")
    ref = attn_mod.attention(q, k, v, nh, mask=mask)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=3e-2, rtol=3e-2)


def test_zero_padded_q_rows_grads_vanish():
    """Padded q rows (zeros, unmasked) must contribute nothing to dk/dv
    when their upstream gradient rows are zero — the dispatcher relies
    on this instead of masking q rows."""
    b, sq_real, sq, skv, nh, dp = 1, 96, 128, 128, 2, 64
    ks = jax.random.split(jax.random.PRNGKey(4), 3)
    q = _rand(ks[0], (b, sq_real, nh * dp))
    qp = jnp.pad(q, ((0, 0), (0, sq - sq_real), (0, 0)))
    k = _rand(ks[1], (b, skv, nh * dp))
    v = _rand(ks[2], (b, skv, nh * dp))
    sm = 1.0 / np.sqrt(dp)
    w = jax.random.normal(jax.random.PRNGKey(3), (b, sq_real, nh * dp),
                          jnp.float32)

    def loss_pad(k, v):
        o = flash_attention_folded(qp, k, v, nh, sm_scale=sm,
                                   block_q=128, block_k=128)
        return jnp.sum(o[:, :sq_real].astype(jnp.float32) * w)

    def loss_ref(k, v):
        o = _ref_attention(q, k, v, nh, sm)
        return jnp.sum(o.astype(jnp.float32) * w)

    g = jax.grad(loss_pad, argnums=(0, 1))(k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1))(k, v)
    for a, b_ in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b_, np.float32),
                                   atol=6e-2, rtol=6e-2)


@pytest.mark.parametrize("d,nh,with_mask", [
    (40, 8, False),   # SD1.5 64x64 level: pads to the 64-lane slot
    (40, 8, True),
    (80, 8, False),   # SD1.5 32x32 level: pads to the 128-lane slot
])
def test_dispatcher_padded_head_dims_match_fallback(monkeypatch, d, nh,
                                                    with_mask):
    """Off-slot head dims (SD1.5's 40/80) fold via zero-padding to their
    64/128 slot by default (device A/B: +7.2% on the SD1.5 LoRA stage;
    OT_NO_FLASH_FOLDED_PAD=1 opts out) and agree with the XLA fallback —
    forward and input grads."""
    from onetrainer_tpu.ops import attention as attn_mod

    b, sq = 2, 300                    # ragged: pads to 384
    ks = jax.random.split(jax.random.PRNGKey(11), 3)
    q = _rand(ks[0], (b, sq, nh * d))
    k = _rand(ks[1], (b, sq, nh * d))
    v = _rand(ks[2], (b, sq, nh * d))
    mask = None
    if with_mask:
        keep = jnp.ones((b, sq), bool).at[:, 280:].set(False)
        mask = keep[:, None, None, :]
    w = jax.random.normal(jax.random.PRNGKey(5), (b, sq, nh * d),
                          jnp.float32)

    def fwd_and_grads(q, k, v):
        out = attn_mod.attention(q, k, v, nh, mask=mask)
        grads = jax.grad(
            lambda *a: jnp.sum(
                attn_mod.attention(*a, nh, mask=mask).astype(jnp.float32)
                * w),
            argnums=(0, 1, 2))(q, k, v)
        return out, grads

    monkeypatch.setenv("OT_FORCE_FLASH", "1")
    if d > 64:
        monkeypatch.setenv("OT_FLASH_FOLDED", "1")   # 128-lane slot
    before = attn_mod.STATS["folded"]
    out, grads = fwd_and_grads(q, k, v)
    assert attn_mod.STATS["folded"] > before

    monkeypatch.setenv("OT_NO_FLASH_FOLDED", "1")
    monkeypatch.delenv("OT_FORCE_FLASH")
    ref, ref_grads = fwd_and_grads(q, k, v)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=3e-2, rtol=3e-2)
    for a, b_ in zip(grads, ref_grads):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b_, np.float32),
                                   atol=6e-2, rtol=6e-2)


def test_padded_fold_opt_out(monkeypatch):
    """OT_NO_FLASH_FOLDED_PAD=1 disables padded (off-slot) folding while
    exact-slot dims keep folding."""
    from onetrainer_tpu.ops.attention import _folded_pad_dim, _use_folded

    monkeypatch.setenv("OT_FORCE_FLASH", "1")
    assert _use_folded(512, 512, 40, 8, _folded_pad_dim(40))
    monkeypatch.setenv("OT_NO_FLASH_FOLDED_PAD", "1")
    assert not _use_folded(512, 512, 40, 8, _folded_pad_dim(40))
    assert _use_folded(512, 512, 64, 8, _folded_pad_dim(64))


def test_d128_default_and_long_seq_dispatch(monkeypatch):
    """r5 defaults: exact d=128 folds by default (late-r4 device A/B:
    Hunyuan s9728 grad 37.6 vs 41.8 ms, FLUX s4608 10.8 vs 12.2);
    sequences past the old 6144 resident-dkv cap dispatch folded (the
    q-streaming dkv kernel handles them) up to the fwd-kernel's
    resident-kv VMEM cap; padded-to-128 (d=80) stays opt-in."""
    from onetrainer_tpu.ops.attention import (
        _FOLDED_MAX_SEQ, _folded_pad_dim, _use_folded,
    )

    monkeypatch.setenv("OT_FORCE_FLASH", "1")
    monkeypatch.delenv("OT_FLASH_FOLDED", raising=False)
    assert _use_folded(512, 512, 128, 2, _folded_pad_dim(128))
    # HunyuanVideo bench shape: s=9728 d=128 — the raise that wires the
    # streaming dkv into production
    assert _use_folded(9728, 9728, 128, 24, _folded_pad_dim(128))
    assert _use_folded(9728, 9728, 64, 8, _folded_pad_dim(64))
    # beyond the fwd kernel's resident-kv VMEM budget: no fold
    assert not _use_folded(_FOLDED_MAX_SEQ + 512, _FOLDED_MAX_SEQ + 512,
                           128, 24, _folded_pad_dim(128))
    # padded-to-128 still opt-in
    assert not _use_folded(512, 512, 80, 8, _folded_pad_dim(80))
    monkeypatch.setenv("OT_FLASH_FOLDED", "1")
    assert _use_folded(512, 512, 80, 8, _folded_pad_dim(80))
