"""SD1.5 LoRA @512 frozen-base weight-dtype A/B (the r4 byte-attribution
lever): the bench stage kept the frozen UNet in f32 (init default), and
the memory-space-aware HLO attribution (hlo_bytes.py) shows 10.4 GB/step
(14% of the 75 GB parser-counted traffic) is f32 weight prefetch — while
the step already sits at ~86% of the HBM roofline. The shipped trainer
stores frozen bases in config.unet.weight_dtype (bf16/fp8), so f32 is
both unrealistic and slow. Casting bf16 should cut ~5 GB/step, fp8
~7.8 GB (fp8 quantization also adds per-channel scale multiplies).

Usage: python experiments/exp_sd15_wdtype.py [f32|bf16|fp8] [bs]
Prints one JSON line with imgs/sec + XLA cost bytes.
"""
from __future__ import annotations

import json
import sys
import time


def main():
    wdtype = sys.argv[1] if len(sys.argv) > 1 else "bf16"
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 4

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
    from onetrainer_tpu.ops.quant import quantize_tree
    from onetrainer_tpu.peft.lora import PeftConfig, init_peft_params
    from onetrainer_tpu.train.sd_train_step import (
        SDStepConfig, make_sd_train_step,
    )
    from onetrainer_tpu.train.train_state import create_train_state
    from onetrainer_tpu.util.enums import ModelType, TrainingMethod

    lat = 64
    model = create_sd_model(ModelType.STABLE_DIFFUSION_15,
                            dtype=jnp.bfloat16,
                            gradient_checkpointing=False)
    rng = jax.random.PRNGKey(0)
    unet_params = jax.jit(lambda r: model.unet.init(
        r, jnp.zeros((1, lat, lat, 4), jnp.bfloat16),
        jnp.asarray([1]),
        jnp.zeros((1, 77, 768), jnp.bfloat16)))(rng)["params"]
    peft_cfg = PeftConfig(rank=16, alpha=16.0)
    adapters = init_peft_params(jax.random.PRNGKey(1), unet_params, peft_cfg)
    if wdtype == "bf16":
        unet_params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, unet_params)
    elif wdtype == "fp8":
        unet_params = quantize_tree(unet_params, jnp.float8_e4m3fn)
    cfg = SDStepConfig(
        training_method=TrainingMethod.LORA, timestep=TimestepConfig(),
        loss=LossConfig(vb_loss_strength=0.0, batch_size=bs),
        stochastic_rounding=False)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-4))
    state = create_train_state({"unet_lora": adapters}, tx)
    step = make_sd_train_step(model, cfg, tx, peft_cfg)
    frozen = {"unet": unet_params, "text_encoder": None}
    batch = {
        "latent_image": jax.random.normal(
            jax.random.PRNGKey(2), (bs, lat, lat, 4), jnp.bfloat16),
        "loss_weight": jnp.ones((bs,)),
        "text_encoder_hidden_state": jax.random.normal(
            jax.random.PRNGKey(3), (bs, 77, 768), jnp.bfloat16),
    }
    flops = hbm_bytes = None
    try:
        analysis = step.lower(state, frozen, batch,
                              jax.random.PRNGKey(6)).compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        flops = float(analysis.get("flops", 0)) or None
        hbm_bytes = float(analysis.get("bytes accessed", 0)) or None
    except Exception:
        pass
    state, metrics = step(state, frozen, batch, jax.random.PRNGKey(6))
    loss0 = float(metrics["loss"])
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = step(state, frozen, batch, jax.random.PRNGKey(6))
    float(metrics["loss"])
    elapsed = time.perf_counter() - t0
    out = {
        "workload": f"sd15_lora_512_bs{bs}_base_{wdtype}",
        "imgs_per_sec": round(bs * n / elapsed, 3),
        "sec_per_step": round(elapsed / n, 4),
        "loss0": round(loss0, 4),
    }
    if hbm_bytes:
        out["xla_bytes_per_step_gb"] = round(hbm_bytes / 1e9, 2)
        out["hbm_roofline_fraction"] = round(
            (hbm_bytes / 819e9) / (elapsed / n), 3)
    if flops:
        out["hw_flop_util_v5e"] = round(
            (flops / bs) * (bs * n / elapsed) / 197e12, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
