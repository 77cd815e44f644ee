"""Per-HLO byte attribution for the SDXL headline step (VERDICT r2 #1).

Builds the same fp8-base + tx_only-remat bs2 @1024 LoRA step as bench.py,
compiles it, and attributes the step's HBM bytes per fused kernel using
experiments/hlo_bytes.py. Prints a JSON summary (bucket totals + top
kernels) and writes the raw optimized HLO to /tmp/sdxl_step_hlo.txt.

Usage: python experiments/exp_byte_attr.py [policy] [bs] [fp8|int8|none]
"""
from __future__ import annotations

import json
import os
import sys


def build_step(policy: str, bs: int, base_quant: str | None):
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax

    from onetrainer_tpu.math.losses import LossConfig
    from onetrainer_tpu.math.timesteps import TimestepConfig
    from onetrainer_tpu.models.sdxl import create_sdxl_model
    from onetrainer_tpu.peft.lora import PeftConfig, init_peft_params
    from onetrainer_tpu.train.sd_train_step import SDStepConfig
    from onetrainer_tpu.train.sdxl_train_step import make_sdxl_train_step
    from onetrainer_tpu.train.train_state import create_train_state
    from onetrainer_tpu.util.enums import ModelType, TrainingMethod

    res = 1024
    lat = res // 8
    model = create_sdxl_model(
        ModelType.STABLE_DIFFUSION_XL_10_BASE, dtype=jnp.bfloat16,
        gradient_checkpointing=policy != "none",
        remat_policy=policy if policy != "none" else "full")
    rng = jax.random.PRNGKey(0)
    unet_params = jax.jit(lambda r: model.unet.init(
        r, jnp.zeros((1, lat, lat, 4), jnp.bfloat16), jnp.asarray([1]),
        jnp.zeros((1, 77, 2048), jnp.bfloat16),
        jnp.zeros((1, 1280), jnp.bfloat16),
        jnp.zeros((1, 6), jnp.bfloat16)))(rng)["params"]
    peft_cfg = PeftConfig(rank=16, alpha=16.0)
    adapters = init_peft_params(jax.random.PRNGKey(1), unet_params, peft_cfg)
    cfg = SDStepConfig(
        training_method=TrainingMethod.LORA, timestep=TimestepConfig(),
        loss=LossConfig(vb_loss_strength=0.0, batch_size=bs))
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-4))
    state = create_train_state({"unet_lora": adapters}, tx)
    step = make_sdxl_train_step(model, cfg, tx, peft_cfg)
    if base_quant:
        from onetrainer_tpu.ops.quant import quantize_tree
        qdtype = {"fp8": jnp.float8_e4m3fn, "int8": jnp.int8,
                  "nf4": "nf4"}[base_quant]
        unet_params = quantize_tree(unet_params, qdtype)
    frozen = {"unet": unet_params}
    batch = {
        "latent_image": jax.random.normal(
            jax.random.PRNGKey(2), (bs, lat, lat, 4), jnp.bfloat16),
        "loss_weight": jnp.ones((bs,)),
        "text_encoder_hidden_state": jax.random.normal(
            jax.random.PRNGKey(3), (bs, 77, 768), jnp.bfloat16),
        "text_encoder_2_hidden_state": jax.random.normal(
            jax.random.PRNGKey(4), (bs, 77, 1280), jnp.bfloat16),
        "text_encoder_2_pooled_state": jax.random.normal(
            jax.random.PRNGKey(5), (bs, 1280), jnp.bfloat16),
        "original_resolution": jnp.full((bs, 2), res, jnp.int32),
        "crop_offset": jnp.zeros((bs, 2), jnp.int32),
        "crop_resolution": jnp.full((bs, 2), res, jnp.int32),
    }
    return step, state, frozen, batch, jax.random.PRNGKey(6)


def main():
    policy = sys.argv[1] if len(sys.argv) > 1 else "tx_only"
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    quant = sys.argv[3] if len(sys.argv) > 3 else "fp8"
    base_quant = None if quant == "none" else quant

    step, state, frozen, batch, rng = build_step(policy, bs, base_quant)
    lowered = step.lower(state, frozen, batch, rng)
    compiled = lowered.compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    hlo = compiled.as_text()
    with open("/tmp/sdxl_step_hlo.txt", "w") as f:
        f.write(hlo)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from hlo_bytes import parse_entry_instructions, summarize
    instrs = parse_entry_instructions(hlo)
    summary = summarize(instrs, top_n=40)
    summary["policy"] = policy
    summary["bs"] = bs
    summary["quant"] = quant
    summary["xla_cost_bytes_gb"] = round(
        float(analysis.get("bytes accessed", 0.0)) / 1e9, 2)
    summary["xla_cost_tflops"] = round(float(analysis.get("flops", 0)) / 1e12,
                                       2)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
