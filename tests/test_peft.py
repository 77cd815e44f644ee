import jax
import jax.numpy as jnp
import numpy as np

from onetrainer_tpu.peft.lora import (
    PeftConfig, apply_peft, init_peft_params, kohya_state_dict_to_peft,
    peft_module_keys, peft_to_kohya_state_dict,
)
from onetrainer_tpu.util.enums import PeftType


def _base_params():
    rng = np.random.default_rng(0)
    return {
        "block": {
            "attn": {"to_q": {"kernel": jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32)),
                              "bias": jnp.zeros((16,))}},
            "conv1": {"kernel": jnp.asarray(rng.normal(size=(3, 3, 4, 8)).astype(np.float32)),
                      "bias": jnp.zeros((8,))},
            "norm": {"scale": jnp.ones((8,)), "bias": jnp.zeros((8,))},
        }
    }


def test_init_targets_kernels_only():
    cfg = PeftConfig(rank=4)
    adapters = init_peft_params(jax.random.PRNGKey(0), _base_params(), cfg)
    assert set(adapters) == {"block/attn/to_q", "block/conv1"}
    assert adapters["block/attn/to_q"]["lora_down"].shape == (4, 8)
    assert adapters["block/attn/to_q"]["lora_up"].shape == (16, 4)
    assert adapters["block/conv1"]["lora_down"].shape == (4, 4, 3, 3)
    assert adapters["block/conv1"]["lora_up"].shape == (8, 4)


def test_layer_filter():
    cfg = PeftConfig(rank=4, layer_filter=("attn",))
    adapters = init_peft_params(jax.random.PRNGKey(0), _base_params(), cfg)
    assert set(adapters) == {"block/attn/to_q"}


def test_zero_up_is_identity():
    base = _base_params()
    cfg = PeftConfig(rank=4)
    adapters = init_peft_params(jax.random.PRNGKey(0), base, cfg)
    merged = apply_peft(base, adapters, cfg)
    np.testing.assert_allclose(
        np.asarray(merged["block"]["attn"]["to_q"]["kernel"]),
        np.asarray(base["block"]["attn"]["to_q"]["kernel"]), atol=1e-7)


def test_lora_linear_matches_activation_form():
    """Weight-space merge == activation-space LoRA: x@(W + a/r * (up@down).T)"""
    base = _base_params()
    cfg = PeftConfig(rank=4, alpha=2.0)
    adapters = init_peft_params(jax.random.PRNGKey(0), base, cfg)
    adapters["block/attn/to_q"]["lora_up"] = jax.random.normal(
        jax.random.PRNGKey(1), (16, 4))
    merged = apply_peft(base, adapters, cfg)
    x = jax.random.normal(jax.random.PRNGKey(2), (3, 8))
    got = x @ merged["block"]["attn"]["to_q"]["kernel"]
    down = np.asarray(adapters["block/attn/to_q"]["lora_down"])  # [r, in]
    up = np.asarray(adapters["block/attn/to_q"]["lora_up"])      # [out, r]
    want = np.asarray(x) @ np.asarray(base["block"]["attn"]["to_q"]["kernel"]) \
        + (np.asarray(x) @ down.T) @ up.T * (2.0 / 4.0)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_lora_conv_matches_explicit_composition():
    """Conv delta == composing down-conv (3x3) then up-conv (1x1)."""
    base = _base_params()
    cfg = PeftConfig(rank=4, alpha=4.0)
    adapters = init_peft_params(jax.random.PRNGKey(0), base, cfg)
    adapters["block/conv1"]["lora_up"] = jax.random.normal(jax.random.PRNGKey(1), (8, 4))
    merged = apply_peft(base, adapters, cfg)

    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 4))
    dn = lambda k, inp: jax.lax.conv_general_dilated(
        inp, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = dn(merged["block"]["conv1"]["kernel"], x)

    down_t = np.asarray(adapters["block/conv1"]["lora_down"])  # [r, in, kh, kw]
    down_flax = jnp.asarray(down_t.transpose(2, 3, 1, 0))      # HWIR
    up_flax = jnp.asarray(np.asarray(adapters["block/conv1"]["lora_up"]).T)[None, None]  # 11RO
    want = dn(base["block"]["conv1"]["kernel"], x) + dn(up_flax, dn(down_flax, x)) * (4.0 / 4.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_dora_norm_semantics():
    base = _base_params()
    cfg = PeftConfig(rank=4, alpha=1.0, decompose=True)
    adapters = init_peft_params(jax.random.PRNGKey(0), base, cfg)
    assert adapters["block/attn/to_q"]["dora_scale"].shape == (1, 8)
    # with up=0, WP == W and dora_scale == per-input-column norms, so
    # merged == W exactly
    merged = apply_peft(base, adapters, cfg)
    np.testing.assert_allclose(
        np.asarray(merged["block"]["attn"]["to_q"]["kernel"]),
        np.asarray(base["block"]["attn"]["to_q"]["kernel"]), atol=1e-5)


def test_dora_output_axis_shape():
    cfg = PeftConfig(rank=4, decompose=True, decompose_output_axis=True)
    adapters = init_peft_params(jax.random.PRNGKey(0), _base_params(), cfg)
    assert adapters["block/attn/to_q"]["dora_scale"].shape == (16, 1)


def test_loha_init_and_identity():
    base = _base_params()
    cfg = PeftConfig(rank=4, peft_type=PeftType.LOHA)
    adapters = init_peft_params(jax.random.PRNGKey(0), base, cfg)
    e = adapters["block/attn/to_q"]
    assert e["hada_w1_a"].shape == (16, 4) and e["hada_w1_b"].shape == (4, 8)
    # w2_a is zero-init -> W2 = 0 -> delta = 0
    merged = apply_peft(base, adapters, cfg)
    np.testing.assert_allclose(
        np.asarray(merged["block"]["attn"]["to_q"]["kernel"]),
        np.asarray(base["block"]["attn"]["to_q"]["kernel"]), atol=1e-6)


def test_kohya_roundtrip():
    base = _base_params()
    cfg = PeftConfig(rank=4, alpha=2.0)
    adapters = init_peft_params(jax.random.PRNGKey(0), base, cfg)
    sd = peft_to_kohya_state_dict(adapters, cfg, "lora_unet")
    assert "lora_unet_block_attn_to_q.lora_down.weight" in sd
    assert sd["lora_unet_block_conv1.lora_up.weight"].shape == (8, 4, 1, 1)
    assert float(sd["lora_unet_block_attn_to_q.alpha"]) == 2.0
    keys = peft_module_keys(base, cfg)
    back, alpha = kohya_state_dict_to_peft(sd, "lora_unet", keys)
    assert alpha == 2.0
    assert set(back) == set(adapters)
    for mk in adapters:
        for leaf in ("lora_down", "lora_up"):
            np.testing.assert_array_equal(
                np.asarray(back[mk][leaf]), np.asarray(adapters[mk][leaf]))


def test_gradients_flow_to_adapters_only():
    base = _base_params()
    cfg = PeftConfig(rank=4)
    adapters = init_peft_params(jax.random.PRNGKey(0), base, cfg)

    def loss_fn(adapters):
        merged = apply_peft(base, adapters, cfg)
        x = jnp.ones((2, 8))
        return jnp.sum(x @ merged["block"]["attn"]["to_q"]["kernel"]) ** 2

    grads = jax.grad(loss_fn)(adapters)
    # up receives gradient even though it's zero-init (down != 0)
    assert float(jnp.abs(grads["block/attn/to_q"]["lora_up"]).max()) > 0


# -- functional (in-layer) application vs weight-space merge ------------------------

def _tiny_net():
    import flax.linen as nn
    from onetrainer_tpu.peft.layers import LoraConv, LoraDense

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = LoraConv(8, (3, 3), padding=1, dtype=jnp.float32, name="conv1")(x)
            h = h.reshape(h.shape[0], h.shape[1] * h.shape[2], 8)
            h = LoraDense(16, dtype=jnp.float32, name="to_q")(h)
            return LoraDense(4, use_bias=False, dtype=jnp.float32, name="to_out")(h)

    return Net()


def _functional_equivalence(cfg):
    from onetrainer_tpu.peft.lora import lora_variables

    net = _tiny_net()
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 4))
    params = net.init(rng, x)["params"]
    adapters = init_peft_params(jax.random.PRNGKey(2), params, cfg)
    # make adapters non-trivial (up is zero-init)
    for entry in adapters.values():
        for name, value in entry.items():
            if name in ("lora_up", "hada_w2_a"):
                entry[name] = jax.random.normal(
                    jax.random.PRNGKey(3), value.shape) * 0.3

    merged = apply_peft(params, adapters, cfg)
    want = net.apply({"params": merged}, x)
    got = net.apply(lora_variables(params, adapters, cfg), x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    # gradients w.r.t. adapters agree between the two formulations
    def loss_functional(a):
        return net.apply(lora_variables(params, a, cfg), x).sum()

    def loss_merged(a):
        return net.apply({"params": apply_peft(params, a, cfg)}, x).sum()

    g1 = jax.grad(loss_functional)(adapters)
    g2 = jax.grad(loss_merged)(adapters)
    for key in adapters:
        for name in g1[key]:
            np.testing.assert_allclose(
                np.asarray(g1[key][name]), np.asarray(g2[key][name]),
                rtol=2e-3, atol=2e-3, err_msg=f"{key}.{name}")


def test_functional_lora_matches_merged():
    _functional_equivalence(PeftConfig(rank=4, alpha=2.0))


def test_functional_dora_matches_merged():
    _functional_equivalence(PeftConfig(rank=4, alpha=2.0, decompose=True))


def test_functional_dora_output_axis_matches_merged():
    _functional_equivalence(PeftConfig(rank=4, alpha=2.0, decompose=True,
                                       decompose_output_axis=True))


def test_functional_loha_matches_merged():
    _functional_equivalence(PeftConfig(rank=4, alpha=2.0,
                                       peft_type=PeftType.LOHA))


def test_lora_layers_identical_without_collection():
    """LoraDense/LoraConv == nn.Dense/nn.Conv when no adapters are given."""
    import flax.linen as nn
    net = _tiny_net()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 4))
    params = net.init(jax.random.PRNGKey(0), x)["params"]

    class Ref(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.Conv(8, (3, 3), padding=1, dtype=jnp.float32, name="conv1")(x)
            h = h.reshape(h.shape[0], h.shape[1] * h.shape[2], 8)
            h = nn.Dense(16, dtype=jnp.float32, name="to_q")(h)
            return nn.Dense(4, use_bias=False, dtype=jnp.float32, name="to_out")(h)

    want = Ref().apply({"params": params}, x)
    got = net.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_init_on_quantized_base_matches_unquantized():
    """QLoRA: adapter init over a quantized frozen base must select the
    SAME modules with the SAME shapes as over the bf16 base. Regression:
    the trainer's second create_setup pass hands back the tree that
    quantize_frozen_parts re-pointed (setup/quantize.py model aliasing);
    quantized leaves have no `.ndim`, were silently skipped, and the
    resulting empty adapter tree turned the train step forward-only
    (XLA pruned the whole backward — caught on-device, BASELINE r5)."""
    from onetrainer_tpu.ops.quant import quantize_tree

    cfg = PeftConfig(rank=4)
    base = _base_params()
    want = init_peft_params(jax.random.PRNGKey(0), base, cfg)
    for qdtype in (jnp.float8_e4m3fn, jnp.int8, "nf4"):
        qtree = quantize_tree(base, qdtype, min_size=1)
        got = init_peft_params(jax.random.PRNGKey(0), qtree, cfg)
        assert set(got) == set(want), qdtype
        for mod in want:
            for name in want[mod]:
                assert got[mod][name].shape == want[mod][name].shape, \
                    (qdtype, mod, name)


def test_init_on_quantized_scan_stacked_base():
    """Stacked ([L, in, out]) quantized kernels keep the leading layer
    axis in the adapter tensors (nf4 packs codes flat, so the logical
    shape must be reconstructed from the aux data)."""
    from onetrainer_tpu.ops.quant import quantize_tree

    rng = np.random.default_rng(1)
    base = {"blocks": {"block": {
        "lin": {"kernel": jnp.asarray(
            rng.normal(size=(3, 8, 16)).astype(np.float32))}}}}
    cfg = PeftConfig(rank=2)
    want = init_peft_params(jax.random.PRNGKey(0), base, cfg)
    for qdtype in (jnp.float8_e4m3fn, "nf4"):
        qtree = quantize_tree(base, qdtype, min_size=1)
        got = init_peft_params(jax.random.PRNGKey(0), qtree, cfg)
        assert set(got) == set(want)
        assert got["blocks/block/lin"]["lora_down"].shape == (3, 2, 8)
        assert got["blocks/block/lin"]["lora_up"].shape == (3, 16, 2)


def test_init_dora_on_quantized_base_dequantizes_norms():
    """DoRA needs the actual weight norms; over an int8 base the scale
    column must come from the dequantized kernel (≈ the bf16 norms)."""
    from onetrainer_tpu.ops.quant import quantize_tree

    cfg = PeftConfig(rank=4, decompose=True)
    base = _base_params()
    want = init_peft_params(jax.random.PRNGKey(0), base, cfg)
    qtree = quantize_tree(base, jnp.int8, min_size=1)
    got = init_peft_params(jax.random.PRNGKey(0), qtree, cfg)
    np.testing.assert_allclose(
        np.asarray(got["block/attn/to_q"]["dora_scale"], np.float32),
        np.asarray(want["block/attn/to_q"]["dora_scale"], np.float32),
        rtol=0.05)
