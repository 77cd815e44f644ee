"""SD1.5 LoRA @512 batch-size sweep on one chip (no remat)."""

from __future__ import annotations

import json
import sys
import time


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    quant = sys.argv[2] if len(sys.argv) > 2 else None

    import os
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax

    from onetrainer_tpu.math.losses import LossConfig
    from onetrainer_tpu.math.timesteps import TimestepConfig
    from onetrainer_tpu.models.sd import create_sd_model
    from onetrainer_tpu.peft.lora import PeftConfig, init_peft_params
    from onetrainer_tpu.train.sd_train_step import SDStepConfig, make_sd_train_step
    from onetrainer_tpu.train.train_state import create_train_state
    from onetrainer_tpu.util.enums import ModelType, TrainingMethod

    res = 512
    lat = res // 8
    model = create_sd_model(ModelType.STABLE_DIFFUSION_15,
                            dtype=jnp.bfloat16, gradient_checkpointing=False)
    rng = jax.random.PRNGKey(0)
    unet_params = jax.jit(lambda r: model.unet.init(
        r, jnp.zeros((1, lat, lat, 4), jnp.bfloat16),
        jnp.asarray([1]), jnp.zeros((1, 77, 768), jnp.bfloat16)))(rng)["params"]
    peft_cfg = PeftConfig(rank=16, alpha=16.0)
    adapters = init_peft_params(jax.random.PRNGKey(1), unet_params, peft_cfg)
    cfg = SDStepConfig(
        training_method=TrainingMethod.LORA, timestep=TimestepConfig(),
        loss=LossConfig(vb_loss_strength=0.0, batch_size=bs),
        stochastic_rounding=False)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-4))
    state = create_train_state({"unet_lora": adapters}, tx)
    step = make_sd_train_step(model, cfg, tx, peft_cfg)
    if quant:
        from onetrainer_tpu.ops.quant import quantize_tree
        unet_params = quantize_tree(
            unet_params, {"fp8": jnp.float8_e4m3fn, "int8": jnp.int8}[quant])
    frozen = {"unet": unet_params, "text_encoder": None}
    batch = {
        "latent_image": jax.random.normal(
            jax.random.PRNGKey(2), (bs, lat, lat, 4), jnp.bfloat16),
        "loss_weight": jnp.ones((bs,)),
        "text_encoder_hidden_state": jax.random.normal(
            jax.random.PRNGKey(3), (bs, 77, 768), jnp.bfloat16),
    }
    flops = None
    try:
        analysis = step.lower(state, frozen, batch,
                              jax.random.PRNGKey(4)).compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        flops = float(analysis["flops"])
    except Exception:
        pass
    state, metrics = step(state, frozen, batch, jax.random.PRNGKey(4))
    float(metrics["loss"])
    n = 20
    start = time.perf_counter()
    for _ in range(n):
        state, metrics = step(state, frozen, batch, jax.random.PRNGKey(4))
    float(metrics["loss"])
    elapsed = time.perf_counter() - start
    ips = bs * n / elapsed
    out = {"workload": f"sd15_lora_512_bs{bs}_{quant or 'bf16'}", "imgs_per_sec": round(ips, 3)}
    if flops:
        out["hw_util_v5e"] = round(ips * flops / bs / 197e12, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
