import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onetrainer_tpu.io.torch_flax import t5_flax_to_state_dict, t5_state_dict_to_flax
from onetrainer_tpu.models.t5 import T5Config, T5Encoder


def tiny_t5_config():
    return T5Config(vocab_size=120, d_model=32, d_kv=8, d_ff=64, num_layers=2,
                    num_heads=4, dtype=jnp.float32)


def test_t5_forward_shape():
    cfg = tiny_t5_config()
    model = T5Encoder(cfg)
    ids = jnp.asarray([[3, 5, 9, 1, 0, 0]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    out = model.apply(params, ids)
    assert out.shape == (1, 6, 32)


def test_t5_parity_with_transformers():
    torch = pytest.importorskip("torch")
    from transformers import T5Config as HFT5Config, T5EncoderModel

    hf_cfg = HFT5Config(
        vocab_size=120, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_heads=4, relative_attention_num_buckets=32,
        relative_attention_max_distance=128, feed_forward_proj="gated-gelu",
        is_encoder_decoder=False, use_cache=False, tie_word_embeddings=False,
        dropout_rate=0.0)
    torch.manual_seed(0)
    hf = T5EncoderModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    params = t5_state_dict_to_flax(sd)
    cfg = tiny_t5_config()
    model = T5Encoder(cfg)
    ids = np.array([[3, 17, 42, 99, 1, 0, 0, 0]], dtype=np.int64)
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).last_hidden_state.numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(ids, jnp.int32)))
    np.testing.assert_allclose(got, want, atol=3e-5)

    # round trip back to torch keys
    back = t5_flax_to_state_dict(params)
    for k, v in sd.items():
        if k.startswith("encoder.embed_tokens"):
            continue
        np.testing.assert_array_equal(back[k], v, err_msg=k)
