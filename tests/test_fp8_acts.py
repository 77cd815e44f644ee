"""fp8 activations (OT_FP8_ACTS, ops/fp8_acts.py): the frozen fp8 base
dots take their activation operand in e4m3. Numerics + dispatch + the
custom-VJP gradient contract (dx stays full precision — without the
custom VJP, JAX would type the cotangent float8_e4m3fn)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from onetrainer_tpu.ops import fp8_acts
from onetrainer_tpu.ops.fp8_acts import fp8_dot
from onetrainer_tpu.ops.quant import (
    dequantize_array, quantize_array, quantize_tree,
)
from onetrainer_tpu.peft.layers import LoraDense


def _rand(key, shape, scale=1.0):
    return jax.random.normal(jax.random.PRNGKey(key), shape) * scale


@pytest.mark.parametrize("dynamic", [True, False])
def test_fp8_dot_forward_close_to_dequant_matmul(dynamic):
    x = _rand(0, (4, 96), 0.3).astype(jnp.bfloat16)
    w = _rand(1, (96, 64), 0.05)
    qw = quantize_array(w)
    ref = x.astype(jnp.float32) @ np.asarray(
        dequantize_array(qw, jnp.float32))   # fp8 weights, exact acts
    y = fp8_dot(x, qw.q, qw.scale, dynamic)
    assert y.dtype == x.dtype
    err = np.abs(np.asarray(y, np.float32) - np.asarray(ref))
    # the only extra error is activation e4m3 rounding (~2 mantissa bits)
    assert err.max() < 0.08 * np.abs(ref).max()


def test_fp8_dot_static_saturates():
    """Static mode clips to the e4m3 max instead of overflowing to NaN."""
    x = jnp.array([[600.0, -600.0, 1.0, 0.0]], jnp.float32)
    w = jnp.eye(4, dtype=jnp.float32)
    qw = quantize_array(w)
    y = np.asarray(fp8_dot(x, qw.q, qw.scale, False), np.float32)
    assert np.isfinite(y).all()
    assert abs(y[0, 0]) <= 448.0 * float(qw.scale) * 448.0


def test_fp8_dot_grad_is_full_precision_straight_through():
    """dx = (g * s_w) @ W_qᵀ exactly — the straight-through derivative,
    computed in f32. Also: cotangents never round to fp8."""
    x = _rand(2, (8, 32), 0.2)
    w = _rand(3, (32, 16), 0.1)
    qw = quantize_array(w)
    g = _rand(4, (8, 16))

    dx = jax.vjp(lambda x_: fp8_dot(x_, qw.q, qw.scale, True), x)[1](g)[0]
    wdq = np.asarray(dequantize_array(qw, jnp.float32))
    expect = np.asarray(g, np.float32) @ wdq.T
    np.testing.assert_allclose(np.asarray(dx), expect, rtol=1e-5, atol=1e-5)
    assert dx.dtype == x.dtype


def _dense_with_quant_base(key=0, din=64, dout=48):
    d = LoraDense(dout, dtype=jnp.float32)
    x = _rand(key + 1, (2, din), 0.3)
    params = d.init(jax.random.PRNGKey(key), x)["params"]
    qparams = {"kernel": quantize_array(params["kernel"]),
               "bias": params["bias"]}
    return d, x, params, qparams


def test_lora_dense_fp8_acts_dispatch_and_numerics(monkeypatch):
    d, x, params, qparams = _dense_with_quant_base()
    ref = d.apply({"params": qparams}, x)          # fp8 weights, bf16 acts
    ref_plain = d.apply({"params": params}, x)     # unquantized, flag off

    monkeypatch.setenv("OT_FP8_ACTS", "1")
    before = fp8_acts.STATS["fp8_dot"]
    y = d.apply({"params": qparams}, x)
    assert fp8_acts.STATS["fp8_dot"] == before + 1
    err = np.abs(np.asarray(y) - np.asarray(ref))
    assert err.max() < 0.08 * np.abs(np.asarray(ref)).max()

    # unquantized kernels never take the path (full fine-tune untouched)
    before = fp8_acts.STATS["fp8_dot"]
    y_plain = d.apply({"params": params}, x)
    assert fp8_acts.STATS["fp8_dot"] == before
    # flag-on output of the unquantized path == flag-off reference
    np.testing.assert_allclose(np.asarray(y_plain), np.asarray(ref_plain))

    # int8 bases never take the path either
    qi8 = {"kernel": quantize_array(params["kernel"], jnp.int8),
           "bias": params["bias"]}
    before = fp8_acts.STATS["fp8_dot"]
    d.apply({"params": qi8}, x)
    assert fp8_acts.STATS["fp8_dot"] == before


def test_lora_dense_fp8_acts_adapter_grads(monkeypatch):
    """LoRA gradients flow through the fp8 base dot and match the
    bf16-base-path gradients closely (the adapter term itself is
    identical; only the dx contribution through the base differs by
    activation rounding — and dx through the base is exact under the
    straight-through VJP)."""
    from onetrainer_tpu.peft.lora import adapters_to_lora_collection

    d, x, params, qparams = _dense_with_quant_base()
    rank, din, dout = 4, x.shape[-1], qparams["bias"].shape[0]
    adapters = {
        "lora_down": _rand(7, (rank, din), 0.1),
        "lora_up": _rand(8, (dout, rank), 0.1),
    }

    def loss(ad, env_on):
        col = {"lora_down": ad["lora_down"], "lora_up": ad["lora_up"]}
        y = d.apply({"params": qparams, "lora": col}, x)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    g_off = jax.grad(loss)(adapters, False)
    monkeypatch.setenv("OT_FP8_ACTS", "1")
    g_on = jax.grad(loss)(adapters, True)
    for k in adapters:
        a, b = np.asarray(g_off[k]), np.asarray(g_on[k])
        assert np.isfinite(b).all()
        assert np.abs(a - b).max() < 0.15 * np.abs(a).max() + 1e-6, k


def test_fp8_acts_train_step(monkeypatch):
    """One SD train step with OT_FP8_ACTS=1 on an actually-quantized fp8
    base: finite loss/grads and the fp8 dot path actually taken."""
    import optax

    from onetrainer_tpu.math.losses import LossConfig
    from onetrainer_tpu.math.timesteps import TimestepConfig
    from onetrainer_tpu.peft.lora import PeftConfig, init_peft_params
    from onetrainer_tpu.train.sd_train_step import (
        SDStepConfig, make_sd_train_step,
    )
    from onetrainer_tpu.train.train_state import create_train_state
    from onetrainer_tpu.util.enums import TrainingMethod
    from tests.test_train_step import (
        init_model_params, make_batch, tiny_sd_model,
    )

    monkeypatch.setenv("OT_FP8_ACTS", "1")
    model = tiny_sd_model()
    unet_params, te_params = init_model_params(model, jax.random.PRNGKey(0))
    peft_cfg = PeftConfig(rank=4, alpha=8.0)
    cfg = SDStepConfig(
        training_method=TrainingMethod.LORA, timestep=TimestepConfig(),
        loss=LossConfig(vb_loss_strength=0.0), stochastic_rounding=False)
    tx = optax.adamw(1e-3)
    adapters = init_peft_params(jax.random.PRNGKey(1), unet_params, peft_cfg)
    frozen = {"unet": quantize_tree(unet_params, jnp.float8_e4m3fn,
                                    min_size=16),
              "text_encoder": te_params}
    state = create_train_state({"unet_lora": adapters}, tx)
    step = make_sd_train_step(model, cfg, tx, peft_cfg)
    before = fp8_acts.STATS["fp8_dot"]
    state, metrics = step(state, frozen, make_batch(0), jax.random.PRNGKey(2))
    assert fp8_acts.STATS["fp8_dot"] > before
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))


def test_mode_env_parsing(monkeypatch):
    """Common falsy strings disable the path (r3 review: 'off'/'false'
    used to silently enable dynamic mode, poisoning bf16 A/B controls);
    unknown values fail loudly instead of guessing."""
    import pytest

    for v in ("", "0", "off", "OFF", "false", "no", "none", " 0 "):
        monkeypatch.setenv("OT_FP8_ACTS", v)
        assert fp8_acts.mode() == "", v
    for v in ("1", "on", "true", "yes", "dynamic", "DYNAMIC"):
        monkeypatch.setenv("OT_FP8_ACTS", v)
        assert fp8_acts.mode() == "dynamic", v
    monkeypatch.setenv("OT_FP8_ACTS", "static")
    assert fp8_acts.mode() == "static"
    monkeypatch.setenv("OT_FP8_ACTS", "e5m2")
    with pytest.raises(ValueError):
        fp8_acts.mode()
