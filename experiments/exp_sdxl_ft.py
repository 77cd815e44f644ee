"""SDXL FULL fine-tune @1024 — the BASELINE.json north-star workload
("SDXL full fine-tune on v5p ... >=3x images/sec/chip vs A100"); the
reference's SDXL fine-tune path (modules/modelSetup/
StableDiffusionXLFineTuneSetup.py with train_dtype bf16 + stochastic
rounding, modules/util/bf16_stochastic_rounding.py).

Memory plan for one 16 GB v5e (the 2.57B UNet cannot carry fp32 AdamW
state: 10.3 GB weights + 20.6 GB m,v):
- bf16 weights + stochastic-rounded updates (ops/stochastic.py) = 5.1 GB
- int8 block-2048 optimizer state (ops/quant_opt.py)            = 5.1 GB
- full remat, grads bf16 transient, donated state buffers

Usage: python experiments/exp_sdxl_ft.py [bs] [policy] [flags...]
flags: fp32 (fp32 weights, no SR), opt32 (fp32 m,v), ema, masked
Prints one JSON line; run each point in a fresh process.
"""

from __future__ import annotations

import json
import sys
import time


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    policy = sys.argv[2] if len(sys.argv) > 2 else "full"
    flags = sys.argv[3:]
    fp32 = "fp32" in flags
    opt8 = "opt32" not in flags
    ema = "ema" in flags
    masked = "masked" in flags

    import os
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax

    from onetrainer_tpu.math.losses import LossConfig
    from onetrainer_tpu.math.timesteps import TimestepConfig
    from onetrainer_tpu.models.sdxl import create_sdxl_model
    from onetrainer_tpu.train.sd_train_step import SDStepConfig
    from onetrainer_tpu.train.sdxl_train_step import make_sdxl_train_step
    from onetrainer_tpu.train.train_state import create_train_state
    from onetrainer_tpu.util.enums import ModelType, TrainingMethod

    res = 1024
    lat = res // 8
    gc = policy != "none"
    model = create_sdxl_model(
        ModelType.STABLE_DIFFUSION_XL_10_BASE, dtype=jnp.bfloat16,
        gradient_checkpointing=gc,
        remat_policy=policy if gc else "full")
    rng = jax.random.PRNGKey(0)
    unet_params = jax.jit(lambda r: model.unet.init(
        r, jnp.zeros((1, lat, lat, 4), jnp.bfloat16), jnp.asarray([1]),
        jnp.zeros((1, 77, 2048), jnp.bfloat16),
        jnp.zeros((1, 1280), jnp.bfloat16),
        jnp.zeros((1, 6), jnp.bfloat16)))(rng)["params"]
    if not fp32:
        unet_params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            unet_params)
    cfg = SDStepConfig(
        training_method=TrainingMethod.FINE_TUNE, timestep=TimestepConfig(),
        loss=LossConfig(vb_loss_strength=0.0, batch_size=bs,
                        masked_training=masked, raw_masked_training=masked,
                        unmasked_weight=0.1 if masked else 1.0,
                        normalize_masked_area_loss=masked),
        ema_decay=0.999 if ema else 0.0,
        stochastic_rounding=not fp32)
    inner = optax.adamw(3e-6)
    if opt8:
        from onetrainer_tpu.ops.quant_opt import int8_optimizer_state
        inner = int8_optimizer_state(inner)
    tx = optax.chain(optax.clip_by_global_norm(1.0), inner)
    state = create_train_state({"unet": unet_params}, tx, ema_enabled=ema)
    del unet_params
    step = make_sdxl_train_step(model, cfg, tx, peft_cfg=None)
    frozen = {"unet": None}
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
    if masked:
        batch["latent_mask"] = (jax.random.uniform(
            jax.random.PRNGKey(7), (bs, lat, lat, 1)) > 0.5).astype(jnp.bfloat16)
    flops = None
    try:
        analysis = step.lower(state, frozen, batch,
                              jax.random.PRNGKey(6)).compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        flops = float(analysis["flops"])
    except Exception:
        pass
    t0 = time.perf_counter()
    state, metrics = step(state, frozen, batch, jax.random.PRNGKey(6))
    float(metrics["loss"])
    compile_s = time.perf_counter() - t0
    n = 10
    start = time.perf_counter()
    for _ in range(n):
        state, metrics = step(state, frozen, batch, jax.random.PRNGKey(6))
    float(metrics["loss"])
    elapsed = time.perf_counter() - start
    ips = bs * n / elapsed
    out = {"workload": f"sdxl_ft_1024_bs{bs}_{policy}", "flags": flags,
           "imgs_per_sec": round(ips, 3),
           "sec_per_step": round(elapsed / n, 3),
           "compile_s": round(compile_s, 1)}
    if flops:
        out["hw_util_v5e"] = round(ips * flops / bs / 197e12, 3)
    print(json.dumps(out))
    with open("/root/repo/experiments/sweep_log.txt", "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
