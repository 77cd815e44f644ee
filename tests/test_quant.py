import jax
import jax.numpy as jnp
import numpy as np

from onetrainer_tpu.ops.quant import (
    QuantizedArray, dequantize_array, dequantize_tree, is_quantized,
    quantize_array, quantize_tree,
)
from onetrainer_tpu.peft.lora import PeftConfig, apply_peft, init_peft_params


def test_fp8_roundtrip_error():
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 64)) * 0.05
    q = quantize_array(x)
    back = dequantize_array(q, jnp.float32)
    rel = float(jnp.abs(back - x).max() / jnp.abs(x).max())
    assert rel < 0.07  # e4m3 has ~2 mantissa bits at scale


def test_int8_roundtrip_error():
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 64))
    q = quantize_array(x, jnp.int8)
    back = dequantize_array(q, jnp.float32)
    rel = float(jnp.abs(back - x).max() / jnp.abs(x).max())
    assert rel < 0.02


def test_quantize_tree_selective():
    tree = {
        "big": {"kernel": jnp.ones((128, 128))},
        "small": {"scale": jnp.ones((8,))},
    }
    qtree = quantize_tree(tree, min_size=1024)
    assert is_quantized(qtree["big"]["kernel"])
    assert not is_quantized(qtree["small"]["scale"])
    assert qtree["small"]["scale"].dtype == jnp.bfloat16
    back = dequantize_tree(qtree, jnp.float32)
    np.testing.assert_allclose(np.asarray(back["big"]["kernel"]), 1.0, rtol=0.05)


def test_apply_peft_on_quantized_base():
    base = {
        "attn": {"to_q": {"kernel": jax.random.normal(jax.random.PRNGKey(0), (64, 64)),
                          "bias": jnp.zeros((64,))}},
    }
    cfg = PeftConfig(rank=4, alpha=4.0)
    adapters = init_peft_params(jax.random.PRNGKey(1), base, cfg)
    adapters["attn/to_q"]["lora_up"] = jax.random.normal(jax.random.PRNGKey(2), (64, 4))

    merged_fp32 = apply_peft(base, adapters, cfg)
    qbase = quantize_tree(base, min_size=1024)
    merged_q = apply_peft(qbase, adapters, cfg)

    a = np.asarray(merged_fp32["attn"]["to_q"]["kernel"], np.float32)
    b = np.asarray(merged_q["attn"]["to_q"]["kernel"], np.float32)
    # fp8 base error bounded; adapters exact
    assert np.abs(a - b).max() / np.abs(a).max() < 0.1
    # gradient still flows through the adapter on a quantized base
    def loss(adapters):
        merged = apply_peft(qbase, adapters, cfg)
        return jnp.sum(merged["attn"]["to_q"]["kernel"].astype(jnp.float32) ** 2)
    grads = jax.grad(loss)(adapters)
    assert float(jnp.abs(grads["attn/to_q"]["lora_down"]).max()) > 0
