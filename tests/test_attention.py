"""Attention dispatch: fallback correctness on CPU, flash-vs-XLA numerics
on TPU (VERDICT r1 #3: the SD head dims 40/80/160 must take the Pallas
flash path via head-dim padding)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onetrainer_tpu.ops import attention as attn_mod


def _reference_attention(q, k, v):
    # [B, S, H, D] manual softmax attention in fp32
    d = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) / (d ** 0.5)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(jnp.float32))


def test_attention_matches_reference_cpu():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((2, 64, 4, 40)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 64, 4, 40)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 64, 4, 40)), jnp.float32)
    out = attn_mod.dot_product_attention(q, k, v)
    ref = _reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_flash_eligibility_covers_sd_head_dims():
    # SD1.5/2.x/SDXL self-attention head dims must be flash-eligible
    import os
    for d in (40, 64, 80, 128, 160):
        assert attn_mod._round_up(d, 64) in (64, 128, 192, 256)
    # flash is default-ON on TPU (r3: tuned blocks + minimal padding beat
    # XLA 2-4x); on the CPU test backend it needs OT_FORCE_FLASH
    if jax.default_backend() != "tpu":
        assert not attn_mod._can_use_flash(4096, 4096, 64)
    os.environ["OT_FORCE_FLASH"] = "1"
    try:
        for d in (40, 64, 80, 128, 160):
            assert attn_mod._can_use_flash(4096, 4096, d)
        # ragged DiT joint sequences (img+text) are eligible via padding
        assert attn_mod._can_use_flash(4096 + 333, 4096 + 333, 64)
        # tiny text sequences stay on the XLA path regardless
        assert not attn_mod._can_use_flash(77, 77, 64)
    finally:
        del os.environ["OT_FORCE_FLASH"]
    if jax.default_backend() == "tpu":
        assert attn_mod._can_use_flash(4096, 4096, 64)
        assert os.environ.get("OT_NO_FLASH") != "1"


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="flash kernel needs a TPU")
def test_flash_ragged_seq_matches_reference():
    """DiT joint sequences (image+text, not a multiple of 128) take the
    flash path via pad + segment-id masking and stay exact."""
    rng = np.random.default_rng(2)
    s = 256 + 77   # ragged
    q = jnp.asarray(rng.standard_normal((2, s, 2, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((2, s, 2, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((2, s, 2, 64)), jnp.bfloat16)
    before = attn_mod.STATS["flash"]
    out = attn_mod.dot_product_attention(q, k, v)
    assert attn_mod.STATS["flash"] == before + 1
    ref = _reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="flash kernel needs a TPU")
def test_flash_matches_xla_on_sd_head_dims():
    import os
    os.environ["OT_FORCE_FLASH"] = "1"
    rng = np.random.default_rng(0)
    for d in (40, 80, 160):
        q = jnp.asarray(rng.standard_normal((1, 256, 2, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((1, 256, 2, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((1, 256, 2, d)), jnp.bfloat16)
        before = attn_mod.STATS["flash"]
        out = attn_mod.dot_product_attention(q, k, v)
        assert attn_mod.STATS["flash"] == before + 1, f"flash not taken d={d}"
        ref = _reference_attention(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref),
            rtol=2e-2, atol=2e-2)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="flash kernel needs a TPU")
def test_flash_gradients_match_xla():
    import os
    os.environ["OT_FORCE_FLASH"] = "1"
    rng = np.random.default_rng(1)
    d = 40
    q = jnp.asarray(rng.standard_normal((1, 256, 2, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 256, 2, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 256, 2, d)), jnp.float32)

    def loss_flash(q, k, v):
        return attn_mod.dot_product_attention(q, k, v).sum()

    def loss_ref(q, k, v):
        return _reference_attention(q, k, v).sum()

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=2e-2)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="flash kernel needs a TPU")
def test_flash_kv_mask_matches_reference():
    """kv-only keep masks ([B,1,1,Skv] — HunyuanVideo/Sana text padding)
    ride the flash path as segment ids and stay exact."""
    rng = np.random.default_rng(3)
    s = 256 + 77
    q = jnp.asarray(rng.standard_normal((2, s, 2, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((2, s, 2, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((2, s, 2, 64)), jnp.bfloat16)
    keep = jnp.asarray(rng.random((2, s)) > 0.2)          # drop ~20% of kv
    keep = keep.at[:, :256].set(True)                     # image prefix kept
    mask = keep[:, None, None, :]

    before = attn_mod.STATS["flash"]
    out = attn_mod.dot_product_attention(q, k, v, mask=mask)
    assert attn_mod.STATS["flash"] == before + 1

    d = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) / (d ** 0.5)
    logits = jnp.where(mask.transpose(0, 1, 2, 3), logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    ref = jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
