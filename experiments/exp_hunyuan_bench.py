"""HunyuanVideo-scale LoRA train throughput on one chip (BASELINE.json
config 5: 3D video latents, flow matching, cached text). A reduced-size
transformer (half hidden) so the frozen base + video activations fit a
single v5e; measures frames/sec and hw util. Prints one JSON line."""

from __future__ import annotations

import json
import sys
import time


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 9   # latent frames
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    policy = sys.argv[3] if len(sys.argv) > 3 else "full"

    import os
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax

    from onetrainer_tpu.math.losses import LossConfig
    from onetrainer_tpu.math.timesteps import TimestepConfig
    from onetrainer_tpu.models.hunyuan_video import (
        HunyuanVideoConfig, HunyuanVideoTransformer3D,
    )
    from onetrainer_tpu.peft.lora import PeftConfig, init_peft_params
    from onetrainer_tpu.train.hunyuan_train_step import make_hunyuan_train_step
    from onetrainer_tpu.train.sd_train_step import SDStepConfig
    from onetrainer_tpu.train.train_state import create_train_state
    from onetrainer_tpu.util.enums import TrainingMethod

    bs = 1
    lat = res // 8

    class _Model:
        pass

    model = _Model()
    cfgm = HunyuanVideoConfig(
        num_layers=10, num_single_layers=20, num_refiner_layers=2,
        hidden_size=1536, num_heads=12, head_dim=128,
        text_embed_dim=4096, pooled_projection_dim=768,
        gradient_checkpointing=True, remat_policy=policy, dtype=jnp.bfloat16)
    model.transformer = HunyuanVideoTransformer3D(cfgm)

    rng = jax.random.PRNGKey(0)
    params = jax.jit(lambda r: model.transformer.init(
        r, jnp.zeros((1, 1, 8, 8, 16), jnp.bfloat16), jnp.asarray([500.0]),
        jnp.zeros((1, 8, 4096), jnp.bfloat16), jnp.ones((1, 8), jnp.int32),
        jnp.zeros((1, 768), jnp.bfloat16)))(rng)["params"]
    peft_cfg = PeftConfig(rank=16, alpha=16.0)
    adapters = init_peft_params(jax.random.PRNGKey(1), params, peft_cfg)
    cfg = SDStepConfig(
        training_method=TrainingMethod.LORA, timestep=TimestepConfig(),
        loss=LossConfig(vb_loss_strength=0.0, batch_size=bs),
        stochastic_rounding=False)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-4))
    state = create_train_state({"transformer_lora": adapters}, tx)
    step = make_hunyuan_train_step(model, cfg, tx, peft_cfg)
    frozen = {"transformer": params}
    batch = {
        "latent_image": jax.random.normal(
            jax.random.PRNGKey(2), (bs, frames, lat, lat, 16), jnp.bfloat16),
        "loss_weight": jnp.ones((bs,)),
        "text_encoder_1_hidden_state": jax.random.normal(
            jax.random.PRNGKey(3), (bs, 77, 4096), jnp.bfloat16),
        "tokens_mask_1": jnp.ones((bs, 77), jnp.int32),
        "text_encoder_2_pooled_state": jax.random.normal(
            jax.random.PRNGKey(4), (bs, 768), jnp.bfloat16),
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
    tokens = frames * (lat // 2) * (lat // 2)
    out = {"workload": f"hunyuan_half_lora_{res}px_f{frames}_bs{bs}_{policy}",
           "video_tokens": tokens,
           "samples_per_sec": round(bs * n / elapsed, 3),
           "sec_per_step": round(elapsed / n, 3)}
    if flops:
        out["hw_tflops_per_sample"] = round(flops / bs / 1e12, 2)
        out["hw_util_v5e"] = round(
            (bs * n / elapsed) * flops / bs / 197e12, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
