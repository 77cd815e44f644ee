"""Numerical parity against transformers (torch CPU): tiny random-config
models built in torch, weights exported through our key maps into the flax
implementations, outputs compared. This validates the architecture math
(rope, norms, softcapping, GQA, masking) against the exact implementations
the reference uses (reference: modules/model/util/{clip,t5,gemma,llama}_
util.py all call transformers models)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp


def _to_numpy_sd(torch_model):
    return {k: v.detach().cpu().numpy() for k, v in
            torch_model.state_dict().items()}


def test_clip_text_parity():
    from transformers import CLIPTextConfig as HFCLIPConfig, CLIPTextModel

    from onetrainer_tpu.io.torch_flax import clip_state_dict_to_flax
    from onetrainer_tpu.models.clip import CLIPTextConfig, CLIPTextModel as FlaxCLIP

    hf_cfg = HFCLIPConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=16, eos_token_id=99, bos_token_id=98,
        pad_token_id=0, hidden_act="quick_gelu")
    torch.manual_seed(0)
    torch_model = CLIPTextModel(hf_cfg).eval()

    flax_model = FlaxCLIP(CLIPTextConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, max_position_embeddings=16, eos_token_id=99,
        hidden_act="quick_gelu", dtype=jnp.float32))
    params = clip_state_dict_to_flax(_to_numpy_sd(torch_model))

    ids = np.array([[98, 5, 7, 12, 99, 0, 0, 0]], np.int32)
    with torch.no_grad():
        want = torch_model(torch.tensor(ids.astype(np.int64)),
                           output_hidden_states=True)
    got = flax_model.apply({"params": params}, jnp.asarray(ids))

    np.testing.assert_allclose(
        np.asarray(got["last_hidden_state"]),
        want.last_hidden_state.numpy(), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(got["pooled_output"]),
        want.pooler_output.numpy(), rtol=2e-4, atol=2e-4)
    # penultimate hidden state (SD2 layer skip path)
    np.testing.assert_allclose(
        np.asarray(got["hidden_states"][-2]),
        want.hidden_states[-2].numpy(), rtol=2e-4, atol=2e-4)


def test_t5_parity():
    from transformers import T5Config as HFT5Config, T5EncoderModel

    from onetrainer_tpu.io.torch_flax import t5_state_dict_to_flax
    from onetrainer_tpu.models.t5 import T5Config, T5Encoder

    hf_cfg = HFT5Config(
        vocab_size=110, d_model=24, d_kv=6, d_ff=48, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=20, feed_forward_proj="gated-gelu",
        tie_word_embeddings=False)
    torch.manual_seed(0)
    torch_model = T5EncoderModel(hf_cfg).eval()

    flax_model = T5Encoder(T5Config(
        vocab_size=110, d_model=24, d_kv=6, d_ff=48, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=20, dtype=jnp.float32))
    params = t5_state_dict_to_flax(_to_numpy_sd(torch_model))

    ids = np.array([[3, 5, 7, 12, 1, 0]], np.int32)
    with torch.no_grad():
        want = torch_model(torch.tensor(ids.astype(np.int64)))
    got = flax_model.apply({"params": params}, jnp.asarray(ids))
    got_states = got["last_hidden_state"] if isinstance(got, dict) else got
    np.testing.assert_allclose(
        np.asarray(got_states), want.last_hidden_state.numpy(),
        rtol=3e-4, atol=3e-4)

    # layer_skip parity (reference encode_t5, t5_util.py:6-29):
    # hidden_states[-1-skip] with the final layer norm re-applied
    with torch.no_grad():
        want_h = torch_model(torch.tensor(ids.astype(np.int64)),
                             output_hidden_states=True)
        want_skip = torch_model.encoder.final_layer_norm(
            want_h.hidden_states[-2])
    got_skip = flax_model.apply({"params": params}, jnp.asarray(ids),
                                layer_skip=1)
    np.testing.assert_allclose(
        np.asarray(got_skip), want_skip.numpy(), rtol=3e-4, atol=3e-4)


def test_gemma2_parity():
    from transformers import Gemma2Config as HFGemmaConfig, Gemma2Model

    from onetrainer_tpu.io.sana_checkpoints import gemma_state_dict_to_flax
    from onetrainer_tpu.models.gemma import Gemma2Config, Gemma2Encoder

    hf_cfg = HFGemmaConfig(
        vocab_size=120, hidden_size=24, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        head_dim=12, rope_theta=10000.0, attn_logit_softcapping=50.0,
        query_pre_attn_scalar=12, sliding_window=512,
        final_logit_softcapping=None, attn_implementation="eager")
    torch.manual_seed(0)
    torch_model = Gemma2Model(hf_cfg).eval()

    flax_model = Gemma2Encoder(Gemma2Config(
        vocab_size=120, hidden_size=24, intermediate_size=48, num_layers=2,
        num_heads=2, num_kv_heads=1, head_dim=12, rope_theta=10000.0,
        attn_logit_softcapping=50.0, query_pre_attn_scalar=12.0,
        dtype=jnp.float32))
    params = gemma_state_dict_to_flax(_to_numpy_sd(torch_model))

    ids = np.array([[2, 5, 7, 12, 1]], np.int32)
    mask = np.ones_like(ids)
    with torch.no_grad():
        want = torch_model(torch.tensor(ids.astype(np.int64)),
                           attention_mask=torch.tensor(mask.astype(np.int64)),
                           output_hidden_states=True)
    got = flax_model.apply({"params": params}, jnp.asarray(ids),
                           jnp.asarray(mask))
    np.testing.assert_allclose(
        np.asarray(got["last_hidden_state"]),
        want.last_hidden_state.numpy(), rtol=3e-4, atol=3e-4)


def test_llama_parity():
    from transformers import LlamaConfig as HFLlamaConfig, LlamaModel

    from onetrainer_tpu.io.hunyuan_checkpoints import llama_state_dict_to_flax
    from onetrainer_tpu.models.llama import LlamaConfig, LlamaEncoder

    hf_cfg = HFLlamaConfig(
        vocab_size=130, hidden_size=24, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        rope_theta=10000.0, rms_norm_eps=1e-5,  # Llama-3 value; HF default 1e-6
        attn_implementation="eager")
    torch.manual_seed(0)
    torch_model = LlamaModel(hf_cfg).eval()

    flax_model = LlamaEncoder(LlamaConfig(
        vocab_size=130, hidden_size=24, intermediate_size=48, num_layers=2,
        num_heads=2, num_kv_heads=1, head_dim=12, rope_theta=10000.0,
        dtype=jnp.float32))
    params = llama_state_dict_to_flax(_to_numpy_sd(torch_model))

    ids = np.array([[1, 5, 7, 12, 2]], np.int32)
    mask = np.ones_like(ids)
    with torch.no_grad():
        want = torch_model(torch.tensor(ids.astype(np.int64)),
                           attention_mask=torch.tensor(mask.astype(np.int64)),
                           output_hidden_states=True)
    got = flax_model.apply({"params": params}, jnp.asarray(ids),
                           jnp.asarray(mask))
    np.testing.assert_allclose(
        np.asarray(got["last_hidden_state"]),
        want.last_hidden_state.numpy(), rtol=3e-4, atol=3e-4)
    # the -3 layer pick HunyuanVideo uses
    np.testing.assert_allclose(
        np.asarray(got["hidden_states"][-3]),
        want.hidden_states[-3].numpy(), rtol=3e-4, atol=3e-4)


def test_convtranspose_matches_torch():
    """flax ConvTranspose(transpose_kernel=True, SAME) + kernel permuted
    (2,3,1,0) reproduces torch ConvTranspose2d for the two shapes the
    Würstchen decoder stack uses (k=2,s=2 DiffNeXt; k=4,s=2,p=1 Paella)."""
    import flax.linen as nn

    for (k, s, p) in [(2, 2, 0), (4, 2, 1)]:
        torch.manual_seed(k)
        tconv = torch.nn.ConvTranspose2d(6, 3, k, stride=s, padding=p)
        x = torch.randn(1, 6, 5, 5)
        with torch.no_grad():
            want = tconv(x).numpy()
        m = nn.ConvTranspose(3, (k, k), strides=(s, s), padding="SAME",
                             transpose_kernel=True)
        params = {
            "kernel": jnp.asarray(
                tconv.weight.detach().numpy().transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(tconv.bias.detach().numpy()),
        }
        got = np.asarray(m.apply(
            {"params": params},
            jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
        np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                                   rtol=1e-5, atol=1e-5)


def test_pixel_shuffle_matches_torch():
    from onetrainer_tpu.models.diffnext import pixel_shuffle, pixel_unshuffle

    x = torch.randn(2, 12, 6, 6)
    want = torch.nn.functional.pixel_shuffle(x, 2).numpy()
    got = np.asarray(pixel_shuffle(
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), 2))
    np.testing.assert_array_equal(got.transpose(0, 3, 1, 2), want)

    y = torch.randn(2, 3, 8, 8)
    want = torch.nn.functional.pixel_unshuffle(y, 2).numpy()
    got = np.asarray(pixel_unshuffle(
        jnp.asarray(y.numpy().transpose(0, 2, 3, 1)), 2))
    np.testing.assert_array_equal(got.transpose(0, 3, 1, 2), want)
