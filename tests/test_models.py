import jax
import jax.numpy as jnp
import numpy as np

from onetrainer_tpu.models.clip import CLIPTextConfig, CLIPTextModel, encode_clip_text
from onetrainer_tpu.models.unet import UNetConfig, UNet2DCondition
from onetrainer_tpu.models.vae import AutoencoderKL, VAEConfig


def tiny_unet_config(**kw):
    base = dict(
        block_out_channels=(32, 64),
        cross_attn_blocks=(True, False),
        layers_per_block=1,
        transformer_layers_per_block=(1, 1),
        num_heads=(4, 4),
        cross_attention_dim=32,
        dtype=jnp.float32,
    )
    base.update(kw)
    return UNetConfig(**base)


def test_unet_forward_shape():
    cfg = tiny_unet_config()
    model = UNet2DCondition(cfg)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((2, 16, 16, 4))
    t = jnp.asarray([10, 500])
    ctx = jnp.zeros((2, 8, 32))
    params = model.init(rng, sample, t, ctx)
    out = model.apply(params, sample, t, ctx)
    assert out.shape == (2, 16, 16, 4)
    assert out.dtype == jnp.float32


def test_unet_param_tree_names():
    cfg = tiny_unet_config()
    model = UNet2DCondition(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 4)),
                        jnp.asarray([1]), jnp.zeros((1, 8, 32)))['params']
    assert 'conv_in' in params
    assert 'down_blocks_0' in params
    assert 'attentions_0' in params['down_blocks_0']
    assert 'transformer_blocks_0' in params['down_blocks_0']['attentions_0']
    assert 'to_q' in params['down_blocks_0']['attentions_0']['transformer_blocks_0']['attn1']
    assert 'mid_block' in params and 'up_blocks_1' in params
    assert 'time_embedding' in params


def test_unet_sdxl_style_additions():
    cfg = tiny_unet_config(addition_embed_dim=8, addition_pooled_dim=16)
    model = UNet2DCondition(cfg)
    sample = jnp.zeros((1, 16, 16, 4))
    t = jnp.asarray([1])
    ctx = jnp.zeros((1, 8, 32))
    text_embeds = jnp.zeros((1, 16))
    time_ids = jnp.zeros((1, 6))
    params = model.init(jax.random.PRNGKey(0), sample, t, ctx, text_embeds, time_ids)
    out = model.apply(params, sample, t, ctx, text_embeds, time_ids)
    assert out.shape == (1, 16, 16, 4)
    assert 'add_embedding' in params['params']


def test_unet_remat_matches():
    cfg = tiny_unet_config()
    cfg_remat = tiny_unet_config(gradient_checkpointing=True)
    sample = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4))
    t = jnp.asarray([100])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 32))
    params = UNet2DCondition(cfg).init(jax.random.PRNGKey(0), sample, t, ctx)
    out_a = UNet2DCondition(cfg).apply(params, sample, t, ctx)
    out_b = UNet2DCondition(cfg_remat).apply(params, sample, t, ctx)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-5)


def tiny_vae_config():
    return VAEConfig(block_out_channels=(32, 64), layers_per_block=1,
                     latent_channels=4, dtype=jnp.float32)


def test_vae_roundtrip_shapes():
    cfg = tiny_vae_config()
    model = AutoencoderKL(cfg)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 32, 32, 3))
    params = model.init(rng, x, rng)
    mean, logvar = model.apply(params, x, method=model.encode)
    assert mean.shape == (1, 16, 16, 4)  # one downsample (2 blocks)
    recon = model.apply(params, mean, method=model.decode)
    assert recon.shape == (1, 32, 32, 3)
    assert 'encoder' in params['params'] and 'quant_conv' in params['params']


def tiny_clip_config(**kw):
    base = dict(vocab_size=100, hidden_size=32, intermediate_size=64,
                num_layers=2, num_heads=4, max_position_embeddings=16,
                eos_token_id=99, dtype=jnp.float32)
    base.update(kw)
    return CLIPTextConfig(**base)


def test_clip_forward_and_layer_skip():
    cfg = tiny_clip_config()
    model = CLIPTextModel(cfg)
    ids = jnp.asarray([[1, 5, 7, 99, 0, 0, 0, 0]])
    params = model.init(jax.random.PRNGKey(0), ids)
    out = model.apply(params, ids)
    assert out['last_hidden_state'].shape == (1, 8, 32)
    assert len(out['hidden_states']) == 3  # embeddings + 2 layers
    assert out['pooled_output'].shape == (1, 32)
    skipped = encode_clip_text(out, layer_skip=1)
    np.testing.assert_allclose(np.asarray(skipped), np.asarray(out['hidden_states'][1]))


def test_clip_projection_and_extra_embeddings():
    cfg = tiny_clip_config(projection_dim=24)
    model = CLIPTextModel(cfg)
    # token 100+ indexes the extra (trained) embedding table
    ids = jnp.asarray([[1, 100, 101, 99]])
    extra = jnp.ones((2, 32))
    params = model.init(jax.random.PRNGKey(0), ids, None, extra)
    out = model.apply(params, ids, None, extra)
    assert out['pooled_output'].shape == (1, 24)
