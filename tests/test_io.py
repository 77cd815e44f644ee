import os
import tempfile

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np
import pytest

from onetrainer_tpu.io.safetensors_io import (
    SafetensorsFile, load_metadata, load_safetensors, save_safetensors,
)
from onetrainer_tpu.io.torch_flax import (
    clip_flax_to_state_dict, clip_state_dict_to_flax, merge_int_tokens,
    split_int_tokens, unet_flax_to_state_dict, unet_state_dict_to_flax,
)


def test_safetensors_roundtrip():
    tensors = {
        "a.weight": np.random.default_rng(0).normal(size=(4, 8)).astype(np.float32),
        "b.bias": np.arange(16, dtype=np.float16),
        "c": np.ones((2, 3), dtype=ml_dtypes.bfloat16),
    }
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "test.safetensors")
        save_safetensors(path, tensors, metadata={"format": "pt", "x": "1"})
        loaded = load_safetensors(path)
        for k in tensors:
            assert loaded[k].dtype == tensors[k].dtype
            np.testing.assert_array_equal(
                loaded[k].astype(np.float32), tensors[k].astype(np.float32))
        assert load_metadata(path) == {"format": "pt", "x": "1"}
        with SafetensorsFile(path) as f:
            assert set(f.keys()) == set(tensors)
            assert f.shape("a.weight") == (4, 8)


def test_key_token_mapping():
    assert merge_int_tokens("down_blocks.0.resnets.1.conv1.weight") == (
        "down_blocks_0", "resnets_1", "conv1", "weight")
    assert split_int_tokens(("down_blocks_0", "resnets_1", "conv1")) == \
        "down_blocks.0.resnets.1.conv1"
    assert merge_int_tokens("mid_block.attentions.0.to_out.0.weight") == (
        "mid_block", "attentions_0", "to_out_0", "weight")
    assert split_int_tokens(("mid_block", "attentions_0", "to_out_0")) == \
        "mid_block.attentions.0.to_out.0"
    # literal underscore-digit attrs survive
    assert split_int_tokens(("time_embedding", "linear_1")) == "time_embedding.linear_1"
    assert split_int_tokens(("ff", "net_0", "proj")) == "ff.net.0.proj"


def test_unet_params_roundtrip():
    from tests.test_models import tiny_unet_config
    from onetrainer_tpu.models.unet import UNet2DCondition
    cfg = tiny_unet_config()
    model = UNet2DCondition(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 4)),
                        jnp.asarray([1]), jnp.zeros((1, 8, 32)))['params']
    sd = unet_flax_to_state_dict(params)
    # keys look like diffusers keys
    assert any(k.startswith("down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q")
               for k in sd)
    assert "time_embedding.linear_1.weight" in sd
    back = unet_state_dict_to_flax(sd)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = jax.tree_util.tree_leaves_with_path(back)
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(sorted(flat_a, key=lambda x: str(x[0])),
                                  sorted(flat_b, key=lambda x: str(x[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


@pytest.mark.parametrize("with_projection", [False, True])
def test_clip_parity_with_transformers(with_projection):
    """Golden parity: identical tiny config, torch CLIP vs our flax CLIP."""
    torch = pytest.importorskip("torch")
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel as HFModel
    from transformers import CLIPTextModelWithProjection as HFProjModel

    from onetrainer_tpu.models.clip import CLIPTextConfig, CLIPTextModel

    hf_cfg = HFConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=16, hidden_act="quick_gelu",
        projection_dim=24, eos_token_id=99, bos_token_id=98,
        attention_dropout=0.0,
    )
    torch.manual_seed(0)
    hf_model = (HFProjModel if with_projection else HFModel)(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}

    cfg = CLIPTextConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=4, max_position_embeddings=16,
        hidden_act="quick_gelu", eos_token_id=99,
        projection_dim=24 if with_projection else None,
        dtype=jnp.float32,
    )
    params = clip_state_dict_to_flax(sd)

    ids = np.array([[98, 5, 7, 12, 99, 0, 0, 0], [98, 3, 99, 0, 0, 0, 0, 0]], dtype=np.int64)
    with torch.no_grad():
        hf_out = hf_model(torch.from_numpy(ids), output_hidden_states=True)

    model = CLIPTextModel(cfg)
    out = model.apply({'params': params}, jnp.asarray(ids, dtype=jnp.int32))

    np.testing.assert_allclose(
        np.asarray(out['last_hidden_state']),
        hf_out.last_hidden_state.numpy(), atol=2e-5)
    pooled_name = 'text_embeds' if with_projection else 'pooler_output'
    np.testing.assert_allclose(
        np.asarray(out['pooled_output']),
        getattr(hf_out, pooled_name).numpy(), atol=2e-5)
    # hidden-state stack matches too (layer-skip contract)
    for i, hs in enumerate(hf_out.hidden_states):
        np.testing.assert_allclose(
            np.asarray(out['hidden_states'][i]), hs.numpy(), atol=2e-5,
            err_msg=f"hidden state {i}")

    # flax -> torch state dict round trip
    back = clip_flax_to_state_dict(params)
    for k, v in sd.items():
        if k == 'text_model.embeddings.position_ids':
            continue
        np.testing.assert_array_equal(back[k], v, err_msg=k)
