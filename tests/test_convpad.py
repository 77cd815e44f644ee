"""force_circular_padding: convs become wrap-around so outputs are
shift-equivariant (tileable textures).

Reference behavior: modules/util/conv_util.py:6-9 sets
padding_mode="circular" on every spatially padded Conv2d when
config.force_circular_padding is set (wired per family, e.g.
modules/modelSetup/BaseStableDiffusionSetup.py:51-55).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onetrainer_tpu.models.convpad import (
    circular_padding_enabled, set_circular_padding,
)


@pytest.fixture(autouse=True)
def _reset_convpad():
    yield
    set_circular_padding(False)


def _resnet_block_out(circular: bool, x, temb):
    from onetrainer_tpu.models.unet import ResnetBlock
    set_circular_padding(circular)
    block = ResnetBlock(out_channels=32, dtype=jnp.float32)
    params = block.init(jax.random.PRNGKey(0), x, temb)
    return block.apply(params, x, temb)


def test_circular_padding_makes_resnet_shift_equivariant():
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 32), jnp.float32)
    temb = jax.random.normal(jax.random.PRNGKey(2), (1, 32), jnp.float32)

    out = _resnet_block_out(True, x, temb)
    out_rolled = _resnet_block_out(
        True, jnp.roll(x, (5, 3), axis=(1, 2)), temb)
    np.testing.assert_allclose(
        np.asarray(jnp.roll(out, (5, 3), axis=(1, 2))),
        np.asarray(out_rolled), rtol=1e-5, atol=1e-5)

    # zero padding is NOT shift-equivariant — guards that the flag is off
    # by default and actually changes lowering when on
    out0 = _resnet_block_out(False, x, temb)
    out0_rolled = _resnet_block_out(
        False, jnp.roll(x, (5, 3), axis=(1, 2)), temb)
    assert not np.allclose(
        np.asarray(jnp.roll(out0, (5, 3), axis=(1, 2))),
        np.asarray(out0_rolled), rtol=1e-5, atol=1e-5)
    assert not circular_padding_enabled()


def test_circular_padding_full_unet_roll_parity():
    """Whole tiny UNet: rolling the input by the total stride rolls the
    output identically (attention is permutation-equivariant, so the
    only shift-breaking ops are the zero-padded convs)."""
    from onetrainer_tpu.models.unet import UNet2DCondition, UNetConfig

    cfg = UNetConfig(
        block_out_channels=(32, 32), cross_attn_blocks=(False, True),
        transformer_layers_per_block=(1, 1), num_heads=(2, 2),
        layers_per_block=1, cross_attention_dim=16, dtype=jnp.float32)
    set_circular_padding(True)
    unet = UNet2DCondition(cfg)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 16, 4), jnp.float32)
    t = jnp.asarray([7])
    ctx = jax.random.normal(jax.random.PRNGKey(4), (1, 5, 16), jnp.float32)
    params = unet.init(jax.random.PRNGKey(0), x, t, ctx)
    out = unet.apply(params, x, t, ctx)
    # roll by the downsample stride (2 for a 2-level UNet)
    rolled = unet.apply(params, jnp.roll(x, (2, 2), axis=(1, 2)), t, ctx)
    np.testing.assert_allclose(
        np.asarray(jnp.roll(out, (2, 2), axis=(1, 2))),
        np.asarray(rolled), rtol=2e-4, atol=2e-4)
