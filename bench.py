"""Round benchmark: SD1.5 LoRA training-step throughput on one chip.

Runs the real hot path (cached latents + cached text embeddings, LoRA
rank-16 on every UNet linear/conv, bf16 compute, remat on) on full
SD1.5-sized weights at 512px and prints ONE JSON line.

vs_baseline compares against a published-community A100 figure for the
same workload (OneTrainer-class SD1.5 LoRA bs=4 @512 ≈ 2.9 imgs/sec on
A100 80GB; see BASELINE.md measured-value log).
"""

from __future__ import annotations

import json
import time

A100_BASELINE_IMGS_PER_SEC = 2.9


def main():
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

    batch_size = 4
    resolution = 512
    latent = resolution // 8

    # remat off: bs=4 @512 LoRA fits in HBM without it and runs ~25% faster
    # (12.1 -> 15.2 imgs/sec measured on v5e)
    model = create_sd_model(ModelType.STABLE_DIFFUSION_15,
                            dtype=jnp.bfloat16, gradient_checkpointing=False)

    rng = jax.random.PRNGKey(0)
    # jitted init: eager init dispatches hundreds of small ops (slow over
    # the remote-TPU tunnel); one compiled program is cached persistently
    unet_params = jax.jit(lambda r: model.unet.init(
        r, jnp.zeros((1, latent, latent, 4), jnp.bfloat16),
        jnp.asarray([1]), jnp.zeros((1, 77, 768), jnp.bfloat16)))(rng)["params"]

    peft_cfg = PeftConfig(rank=16, alpha=16.0)
    adapters = init_peft_params(jax.random.PRNGKey(1), unet_params, peft_cfg)

    cfg = SDStepConfig(
        training_method=TrainingMethod.LORA,
        timestep=TimestepConfig(),
        loss=LossConfig(vb_loss_strength=0.0, batch_size=batch_size),
        stochastic_rounding=False,
    )
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-4))
    state = create_train_state({"unet_lora": adapters}, tx)
    step = make_sd_train_step(model, cfg, tx, peft_cfg)

    frozen = {"unet": unet_params, "text_encoder": None}
    batch = {
        "latent_image": jax.random.normal(
            jax.random.PRNGKey(2), (batch_size, latent, latent, 4), jnp.bfloat16),
        "loss_weight": jnp.ones((batch_size,)),
        "text_encoder_hidden_state": jax.random.normal(
            jax.random.PRNGKey(3), (batch_size, 77, 768), jnp.bfloat16),
    }

    # warmup / compile
    state, metrics = step(state, frozen, batch, jax.random.PRNGKey(4))
    jax.block_until_ready(metrics["loss"])

    n_steps = 20
    start = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, frozen, batch, jax.random.PRNGKey(4))
    jax.block_until_ready(metrics["loss"])
    elapsed = time.perf_counter() - start

    imgs_per_sec = batch_size * n_steps / elapsed
    print(json.dumps({
        "metric": "sd15_lora_train_imgs_per_sec_per_chip_512px_bs4",
        "value": round(imgs_per_sec, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / A100_BASELINE_IMGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
