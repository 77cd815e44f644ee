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


def test_nf4_roundtrip_and_tree():
    """Real NF4 (QLoRA 4-bit NormalFloat, block-64 absmax — the
    reference's bitsandbytes NF4 base): packs two codes per byte and
    round-trips within the codebook's quantization error."""
    import jax
    import numpy as np

    from onetrainer_tpu.ops.quant import (
        NF4Array, dequantize_nf4, dequantize_tree, quantize_nf4,
        quantize_tree,
    )

    x = jax.random.normal(jax.random.PRNGKey(0), (128, 64), jnp.float32) * 0.05
    q = quantize_nf4(x)
    assert isinstance(q, NF4Array)
    assert q.q.dtype == jnp.uint8
    assert q.q.size == x.size // 2          # 4 bits per element
    back = dequantize_nf4(q, jnp.float32)
    assert back.shape == x.shape
    # block-64 absmax NF4: worst-case error bounded by the coarsest
    # codebook gap times the block absmax
    err = np.abs(np.asarray(back) - np.asarray(x))
    scales = np.abs(np.asarray(x)).reshape(-1, 64).max(axis=1)
    assert (err.reshape(-1, 64) <= scales[:, None] * 0.17 + 1e-6).all()

    # only `kernel` leaves quantize (bitsandbytes replace-linears
    # semantics; raw-consumed tables like pos embeddings must stay float)
    tree = {"lin": {"kernel": x, "bias": jnp.zeros((8,))},
            "pos_embed": jnp.ones((64, 64))}
    qt = quantize_tree(tree, "nf4", min_size=1024)
    assert isinstance(qt["lin"]["kernel"], NF4Array)
    assert not isinstance(qt["lin"]["bias"], NF4Array)
    assert not isinstance(qt["pos_embed"], NF4Array)
    dt = dequantize_tree(qt, jnp.float32)
    np.testing.assert_allclose(np.asarray(dt["lin"]["kernel"]),
                               np.asarray(back), atol=1e-6)


def test_nf4_in_layer_lora():
    """LoraDense/LoraConv consume NF4 kernels directly (dequantized
    transiently inside the layer) — the in-layer quantized-base path
    that tiny e2e models skipped via min_size."""
    import jax
    import numpy as np

    from onetrainer_tpu.ops.quant import quantize_array, quantize_nf4
    from onetrainer_tpu.peft.layers import LoraConv, LoraDense

    d = LoraDense(64, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64))
    params = d.init(jax.random.PRNGKey(0), x)["params"]
    ref = d.apply({"params": params}, x)
    for q in (quantize_array(params["kernel"], jnp.int8),
              quantize_nf4(params["kernel"])):
        y = d.apply({"params": {"kernel": q, "bias": params["bias"]}}, x)
        assert float(jnp.abs(y - ref).max()) < 0.5
        assert np.isfinite(np.asarray(y)).all()

    c = LoraConv(8, (3, 3), dtype=jnp.float32)
    xc = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 8))
    pc = c.init(jax.random.PRNGKey(0), xc)["params"]
    refc = c.apply({"params": pc}, xc)
    yc = c.apply({"params": {"kernel": quantize_nf4(pc["kernel"]),
                             "bias": pc["bias"]}}, xc)
    assert float(jnp.abs(yc - refc).max()) < 0.6


def test_quantized_base_in_layer_train_step():
    """One SD train step with the frozen base actually quantized
    (min_size forced low — the default 4096 exempts tiny test models,
    which previously hid an in-layer crash at real scale). Covers fp8,
    int8, and NF4 end to end through loss + gradients."""
    import jax
    import numpy as np
    import optax

    from onetrainer_tpu.math.losses import LossConfig
    from onetrainer_tpu.math.timesteps import TimestepConfig
    from onetrainer_tpu.ops.quant import quantize_tree
    from onetrainer_tpu.peft.lora import PeftConfig, init_peft_params
    from onetrainer_tpu.train.sd_train_step import (
        SDStepConfig, make_sd_train_step,
    )
    from onetrainer_tpu.train.train_state import create_train_state
    from onetrainer_tpu.util.enums import TrainingMethod
    from tests.test_train_step import (
        init_model_params, make_batch, tiny_sd_model,
    )

    model = tiny_sd_model()
    unet_params, te_params = init_model_params(model, jax.random.PRNGKey(0))
    peft_cfg = PeftConfig(rank=4, alpha=8.0)
    cfg = SDStepConfig(
        training_method=TrainingMethod.LORA, timestep=TimestepConfig(),
        loss=LossConfig(vb_loss_strength=0.0), stochastic_rounding=False)
    tx = optax.adamw(1e-3)
    batch = make_batch(0)

    for qdtype in (jnp.float8_e4m3fn, jnp.int8, "nf4"):
        adapters = init_peft_params(jax.random.PRNGKey(1), unet_params,
                                    peft_cfg)
        frozen = {"unet": quantize_tree(unet_params, qdtype, min_size=16),
                  "text_encoder": te_params}
        state = create_train_state({"unet_lora": adapters}, tx)
        step = make_sd_train_step(model, cfg, tx, peft_cfg)
        state, metrics = step(state, frozen, batch, jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["loss"])), qdtype
        assert np.isfinite(float(metrics["grad_norm"])), qdtype


def test_quantize_tree_scan_stacked():
    """Scan-stacked subtrees ({prefix: {"block": ...}}) quantize PER LAYER
    along axis 0 (ADVICE r2: scalar per-tensor scales broke
    nn.scan(variable_axes={'params': 0}) slicing)."""
    from onetrainer_tpu.ops.quant import NF4Array, quantize_tree

    L = 3
    kernel = jax.random.normal(jax.random.PRNGKey(0), (L, 64, 32))
    bias = jnp.ones((L, 32))
    tree = {"blocks": {"block": {"dense": {"kernel": kernel, "bias": bias}}},
            "out": {"kernel": jnp.ones((64, 32))}}

    qt = quantize_tree(tree, jnp.int8, min_size=1024)
    qk = qt["blocks"]["block"]["dense"]["kernel"]
    assert is_quantized(qk)
    assert qk.q.shape == (L, 64, 32)
    assert qk.scale.shape == (L,)          # one absmax per layer
    # stacked bias [L, 32] is NOT a weight matrix — stays bf16
    assert qt["blocks"]["block"]["dense"]["bias"].dtype == jnp.bfloat16
    # full-tree dequant matches per-layer dequant
    back = dequantize_tree(qt, jnp.float32)
    for i in range(L):
        sliced = QuantizedArray(q=qk.q[i], scale=qk.scale[i])
        np.testing.assert_allclose(
            np.asarray(dequantize_array(sliced, jnp.float32)),
            np.asarray(back["blocks"]["block"]["dense"]["kernel"][i]))

    # NF4: packed codes and scales stacked per layer, aux shape per layer
    qt4 = quantize_tree(tree, "nf4", min_size=1024)
    qk4 = qt4["blocks"]["block"]["dense"]["kernel"]
    assert isinstance(qk4, NF4Array)
    assert qk4.q.shape[0] == L and qk4.scales.shape[0] == L
    assert qk4.shape == (64, 32)           # per-layer logical shape
    back4 = dequantize_tree(qt4, jnp.float32)
    assert back4["blocks"]["block"]["dense"]["kernel"].shape == (L, 64, 32)
    err = np.abs(np.asarray(back4["blocks"]["block"]["dense"]["kernel"])
                 - np.asarray(kernel))
    assert err.max() < np.abs(np.asarray(kernel)).max() * 0.2


def test_scan_layers_with_quantized_base():
    """nn.scan over a quantized stacked params tree — the exact ADVICE r2
    crash: variable_axes={'params': 0} must be able to slice quantized
    leaves per layer. Output must match the unquantized loop within
    quantization error."""
    import flax.linen as nn

    from onetrainer_tpu.ops.quant import quantize_tree
    from onetrainer_tpu.peft.layers import LoraDense

    L, D = 4, 64

    class Block(nn.Module):
        @nn.compact
        def __call__(self, x, _):
            return x + LoraDense(D, dtype=jnp.float32, name="dense")(x), None

    class Scanned(nn.Module):
        @nn.compact
        def __call__(self, x):
            scan = nn.scan(
                Block, variable_axes={"params": 0, "lora": 0},
                split_rngs={"params": True}, length=L)
            x, _ = scan(name="blocks")(x, None)
            return x

    x = jax.random.normal(jax.random.PRNGKey(1), (2, D))
    m = Scanned()
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    # init gives {"blocks": {"dense": {...}}} with leading L axis; rewrap
    # into the stack_scanned_blocks layout quantize_tree keys on
    tree = {"blocks": {"block": params["blocks"]}}
    ref = m.apply({"params": {"blocks": tree["blocks"]["block"]}}, x)

    for qdtype in (jnp.int8, jnp.float8_e4m3fn, "nf4"):
        qt = quantize_tree(tree, qdtype, min_size=16)
        y = m.apply({"params": {"blocks": qt["blocks"]["block"]}}, x)
        assert np.isfinite(np.asarray(y)).all(), qdtype
        # slicing correctness: in-scan dequant must equal dequantizing the
        # full stacked tree outside the scan (same math, no slicing bugs)
        dq = dequantize_tree(qt, jnp.float32)
        y_dq = m.apply({"params": {"blocks": dq["blocks"]["block"]}}, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_dq),
                                   rtol=1e-4, atol=1e-4, err_msg=str(qdtype))
        # and stays in the neighborhood of the unquantized reference
        err = float(jnp.abs(y - ref).max())
        assert err < 2.5, (qdtype, err)


def test_nf4_pallas_kernel_interpret_matches_jnp():
    """The gather-free Pallas NF4 dequant (ops/nf4_pallas.py) decodes the
    half-split packed layout exactly like the jnp fallback (interpret
    mode — the compiled kernel is exercised on the TPU)."""
    from onetrainer_tpu.ops.nf4_pallas import nf4_dequant_flat
    from onetrainer_tpu.ops.quant import dequantize_nf4, quantize_nf4

    x = jax.random.normal(jax.random.PRNGKey(3), (16, 256), jnp.float32)
    q = quantize_nf4(x)
    ref = dequantize_nf4(q, jnp.float32)          # jnp fallback on CPU
    n = x.size
    vals = nf4_dequant_flat(q.q, q.scales, out_dtype=jnp.float32,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(vals[:n].reshape(x.shape)),
                               np.asarray(ref), rtol=1e-6, atol=1e-6)


def test_quantize_frozen_parts_and_load_dtype():
    """setup/quantize.py: frozen parts quantize by their configured part
    dtype; trainable (absent) and non-quantized parts are untouched.
    DataType.to_load_dtype keeps quantized types at bf16 for the load
    cast — raw-casting a checkpoint to the storage dtype corrupts it
    (the r3 loader regression behind test_lora_fp8_base_e2e)."""
    import jax.numpy as jnp

    from onetrainer_tpu.ops.quant import NF4Array, QuantizedArray
    from onetrainer_tpu.setup.quantize import quantize_frozen_parts
    from onetrainer_tpu.util.enums import DataType
    from onetrainer_tpu.util.model_names import ModelWeightDtypes

    def wd(unet=DataType.NONE, te=DataType.NONE):
        return ModelWeightDtypes(
            DataType.BFLOAT_16, DataType.BFLOAT_16, unet, DataType.NONE,
            te, *([DataType.NONE] * 10))

    def tree():
        return {"layer": {"kernel": jnp.ones((64, 128), jnp.bfloat16),
                          "bias": jnp.ones((128,), jnp.bfloat16)}}

    for dt, cls in ((DataType.FLOAT_8, QuantizedArray),
                    (DataType.INT_8, QuantizedArray),
                    (DataType.NFLOAT_4, NF4Array)):
        frozen = {"unet": tree(), "text_encoder": tree()}
        quantize_frozen_parts(frozen, wd(unet=dt),
                              {"unet": "unet", "text_encoder": "text_encoder"})
        assert isinstance(frozen["unet"]["layer"]["kernel"], cls), dt
        # bias never quantizes; the non-quantized TE part is untouched
        assert frozen["unet"]["layer"]["bias"].dtype == jnp.bfloat16
        assert isinstance(frozen["text_encoder"]["layer"]["kernel"],
                          jnp.ndarray)
        # quantized types load at bf16; float types load at themselves
        assert dt.to_load_dtype() == jnp.bfloat16
    assert DataType.FLOAT_32.to_load_dtype() == jnp.float32
    # trainable part absent from frozen -> skipped, no KeyError
    quantize_frozen_parts({}, wd(unet=DataType.FLOAT_8), {"unet": "unet"})


def test_quantize_frozen_parts_drops_model_reference():
    """With model= given, any model attribute holding the identical tree
    is re-pointed at the quantized tree — otherwise the unquantized copy
    stays device-resident for the whole run (5.2 GB for an SDXL fp8
    base; OOMed the first e2e scripts/train.py run on a 16 GB v5e)."""
    import jax.numpy as jnp

    from onetrainer_tpu.ops.quant import QuantizedArray
    from onetrainer_tpu.setup.quantize import quantize_frozen_parts
    from onetrainer_tpu.util.enums import DataType
    from onetrainer_tpu.util.model_names import ModelWeightDtypes

    wd = ModelWeightDtypes(
        DataType.BFLOAT_16, DataType.BFLOAT_16, DataType.FLOAT_8,
        DataType.NONE, *([DataType.NONE] * 11))
    unet_tree = {"layer": {"kernel": jnp.ones((64, 128), jnp.bfloat16)}}
    te_tree = {"layer": {"kernel": jnp.ones((8, 8), jnp.bfloat16)}}

    class _Model:
        pass

    model = _Model()
    model.unet_params = unet_tree
    model.te_params = te_tree
    frozen = {"unet": unet_tree, "text_encoder": te_tree}
    quantize_frozen_parts(frozen, wd,
                          {"unet": "unet", "text_encoder": "text_encoder"},
                          model=model)
    # quantized part: the model attr now aliases the quantized tree
    assert model.unet_params is frozen["unet"]
    assert isinstance(model.unet_params["layer"]["kernel"], QuantizedArray)
    # non-quantized part: untouched
    assert model.te_params is te_tree
