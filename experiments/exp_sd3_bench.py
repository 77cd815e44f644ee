"""SD3-medium-size LoRA train throughput @1024 on one chip
(BASELINE.json config 4: rectified-flow DiT LoRA, cached text).
Prints one JSON line."""

from __future__ import annotations

import json
import sys
import time


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    policy = sys.argv[2] if len(sys.argv) > 2 else "full"
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
    from onetrainer_tpu.models.sd3 import SD3Transformer2D, sd3_medium_config
    from onetrainer_tpu.peft.lora import PeftConfig, init_peft_params
    from onetrainer_tpu.train.sd3_train_step import make_sd3_train_step
    from onetrainer_tpu.train.sd_train_step import SDStepConfig
    from onetrainer_tpu.train.train_state import create_train_state
    from onetrainer_tpu.util.enums import ModelType, TrainingMethod

    res = 1024
    lat = res // 8

    class _Model:
        pass

    model = _Model()
    cfgm = sd3_medium_config(dtype=jnp.bfloat16, gradient_checkpointing=True,
                             remat_policy=policy)
    model.transformer = SD3Transformer2D(cfgm)
    model.model_type = ModelType.STABLE_DIFFUSION_3

    rng = jax.random.PRNGKey(0)
    params = jax.jit(lambda r: model.transformer.init(
        r, jnp.zeros((1, lat, lat, 16), jnp.bfloat16),
        jnp.asarray([500.0]), jnp.zeros((1, 2048), jnp.bfloat16),
        jnp.zeros((1, 154, 4096), jnp.bfloat16)))(rng)["params"]
    peft_cfg = PeftConfig(rank=16, alpha=16.0)
    adapters = init_peft_params(jax.random.PRNGKey(1), params, peft_cfg)
    cfg = SDStepConfig(
        training_method=TrainingMethod.LORA, timestep=TimestepConfig(),
        loss=LossConfig(vb_loss_strength=0.0, batch_size=bs),
        stochastic_rounding=False)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-4))
    state = create_train_state({"transformer_lora": adapters}, tx)
    step = make_sd3_train_step(model, cfg, tx, peft_cfg)
    if base_quant:
        from onetrainer_tpu.ops.quant import quantize_tree
        qdtype = {"fp8": jnp.float8_e4m3fn, "int8": jnp.int8,
                  "nf4": "nf4"}[base_quant]
        params = quantize_tree(params, qdtype)
    frozen = {"transformer": params}
    batch = {
        "latent_image": jax.random.normal(
            jax.random.PRNGKey(2), (bs, lat, lat, 16), jnp.bfloat16),
        "loss_weight": jnp.ones((bs,)),
        "sd3_context": jax.random.normal(
            jax.random.PRNGKey(3), (bs, 154, 4096), jnp.bfloat16),
        "sd3_pooled": jax.random.normal(
            jax.random.PRNGKey(4), (bs, 2048), jnp.bfloat16),
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
    state, metrics = step(state, frozen, batch, jax.random.PRNGKey(6))
    float(metrics["loss"])
    n = 10
    start = time.perf_counter()
    for _ in range(n):
        state, metrics = step(state, frozen, batch, jax.random.PRNGKey(6))
    float(metrics["loss"])
    elapsed = time.perf_counter() - start
    ips = bs * n / elapsed
    out = {"workload": f"sd3_medium_lora_{res}px_bs{bs}_{policy}" + ("_" + base_quant if base_quant else ""),
           "imgs_per_sec": round(ips, 3),
           "sec_per_step": round(elapsed / n, 3)}
    if flops:
        out["hw_tflops_per_img"] = round(flops / bs / 1e12, 2)
        out["hw_util_v5e"] = round(ips * flops / bs / 197e12, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
