"""SDXL @1024 remat-policy experiment on the real chip.

Usage: python experiments/exp_sdxl_remat.py <policy> [bs]
Measures imgs/sec for one (policy, bs) point; prints one JSON line.
Run each point in a fresh process so HBM is clean.
"""
from __future__ import annotations

import json
import sys
import time


def main():
    policy = sys.argv[1] if len(sys.argv) > 1 else "full"
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    offload = "offload" in sys.argv[3:]
    opt8 = "opt8" in sys.argv[3:]
    bf16_adapters = "bf16ad" in sys.argv[3:]
    base_quant = next((f for f in sys.argv[3:]
                       if f in ("fp8", "int8", "nf4")), None)

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
    from onetrainer_tpu.peft.lora import PeftConfig, init_peft_params
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
    peft_cfg = PeftConfig(rank=16, alpha=16.0)
    adapters = init_peft_params(jax.random.PRNGKey(1), unet_params, peft_cfg)
    if bf16_adapters:
        adapters = jax.tree.map(lambda x: x.astype(jnp.bfloat16), adapters)
    cfg = SDStepConfig(
        training_method=TrainingMethod.LORA, timestep=TimestepConfig(),
        loss=LossConfig(vb_loss_strength=0.0, batch_size=bs),
        stochastic_rounding=bf16_adapters)
    inner = optax.adamw(1e-4)
    if opt8:
        from onetrainer_tpu.ops.quant_opt import int8_optimizer_state
        inner = int8_optimizer_state(inner)
    tx = optax.chain(optax.clip_by_global_norm(1.0), inner)
    if offload:
        from onetrainer_tpu.train.train_state import configure_offload
        configure_offload(opt_state=True)
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
    out = {"policy": policy, "bs": bs, "flags": sys.argv[3:],
           "imgs_per_sec": round(ips, 3),
           "sec_per_step": round(elapsed / n, 3),
           "compile_s": round(compile_s, 1)}
    if flops:
        out["hw_tflops_per_img"] = round(flops / bs / 1e12, 2)
        out["hw_util_v5e"] = round(ips * flops / bs / 197e12, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
