"""SD1.5 FULL fine-tune @512 — BASELINE.json config 2: masked training +
EMA + zero-terminal-SNR noise-schedule rescale (v-prediction), the
reference's "SD 1.5 full fine-tune" workload
(modules/modelSetup/StableDiffusionFineTuneSetup.py + masked loss +
EMAModuleWrapper + rescale_noise_scheduler_to_zero_terminal_snr.py).

Usage: python experiments/exp_sd15_ft.py [bs] [remat: none|full|tx_only]
                                         [mode: f32|bf16sr|bf16sr_int8opt]

mode (r4, the byte-attribution lever for full-FT — the step measures 87%
of the HBM roofline and the f32 master params + fp32 Adam m/v + fp32 EMA
are ~45 GB of its ~148 GB/step):
  f32            — fp32 master weights (r3 measured row, 19.31 imgs/sec)
  bf16sr         — bf16 params + stochastic rounding + bf16 EMA: the
                   reference's own train_dtype=bfloat16 mode
                   (modules/util/create.py optimizer SR wiring)
  bf16sr_int8opt — + block-wise int8 Adam m/v (ops/quant_opt.py), the
                   reference's bnb 8-bit optimizer analog
"""

from __future__ import annotations

import json
import sys
import time


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    policy = sys.argv[2] if len(sys.argv) > 2 else "none"
    mode = sys.argv[3] if len(sys.argv) > 3 else "f32"

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
    from onetrainer_tpu.train.sd_train_step import (
        SDStepConfig, make_sd_train_step,
    )
    from onetrainer_tpu.train.train_state import create_train_state
    from onetrainer_tpu.util.enums import ModelType, TrainingMethod

    res = 512
    lat = res // 8
    model = create_sd_model(
        ModelType.STABLE_DIFFUSION_15, dtype=jnp.bfloat16,
        gradient_checkpointing=policy != "none",
        remat_policy=policy if policy != "none" else None)
    # config 2's schedule rescale: ZTSNR + v-prediction
    model.rescale_noise_scheduler_to_zero_terminal_snr()
    rng = jax.random.PRNGKey(0)
    unet_params = jax.jit(lambda r: model.unet.init(
        r, jnp.zeros((1, lat, lat, 4), jnp.bfloat16),
        jnp.asarray([1]), jnp.zeros((1, 77, 768), jnp.bfloat16)))(rng)["params"]
    cfg = SDStepConfig(
        training_method=TrainingMethod.FINE_TUNE, timestep=TimestepConfig(),
        loss=LossConfig(vb_loss_strength=0.0, batch_size=bs,
                        masked_training=True, raw_masked_training=True,
                        unmasked_weight=0.1,
                        normalize_masked_area_loss=True,
                        v_prediction=True),
        prediction_type="v_prediction",
        ema_decay=0.999,
        stochastic_rounding=True)
    if mode.startswith("bf16sr"):
        unet_params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, unet_params)
    adamw = optax.adamw(3e-6)
    if mode.endswith("int8opt"):
        from onetrainer_tpu.ops.quant_opt import int8_optimizer_state
        adamw = int8_optimizer_state(adamw, min_size=256)
    tx = optax.chain(optax.clip_by_global_norm(1.0), adamw)
    state = create_train_state({"unet": unet_params}, tx, ema_enabled=True)
    step = make_sd_train_step(model, cfg, tx, peft_cfg=None)
    frozen = {"unet": None, "text_encoder": None}
    mask = (jax.random.uniform(jax.random.PRNGKey(7), (bs, lat, lat, 1))
            > 0.5).astype(jnp.bfloat16)
    batch = {
        "latent_image": jax.random.normal(
            jax.random.PRNGKey(2), (bs, lat, lat, 4), jnp.bfloat16),
        "latent_mask": mask,
        "loss_weight": jnp.ones((bs,)),
        "text_encoder_hidden_state": jax.random.normal(
            jax.random.PRNGKey(3), (bs, 77, 768), jnp.bfloat16),
    }
    flops = hbm_bytes = None
    try:
        analysis = step.lower(state, frozen, batch,
                              jax.random.PRNGKey(4)).compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        flops = float(analysis["flops"])
        hbm_bytes = float(analysis.get("bytes accessed", 0)) or None
    except Exception:
        pass
    t0 = time.perf_counter()
    state, metrics = step(state, frozen, batch, jax.random.PRNGKey(4))
    float(metrics["loss"])
    compile_s = time.perf_counter() - t0
    n = 20
    start = time.perf_counter()
    for _ in range(n):
        state, metrics = step(state, frozen, batch, jax.random.PRNGKey(4))
    float(metrics["loss"])
    elapsed = time.perf_counter() - start
    ips = bs * n / elapsed
    out = {"workload": f"sd15_ft_masked_ema_ztsnr_512_bs{bs}_{policy}"
                       f"_{mode}",
           "imgs_per_sec": round(ips, 3),
           "sec_per_step": round(elapsed / n, 3),
           "compile_s": round(compile_s, 1)}
    if flops:
        out["hw_util_v5e"] = round(ips * flops / bs / 197e12, 3)
    if hbm_bytes:
        out["xla_bytes_per_step_gb"] = round(hbm_bytes / 1e9, 2)
        out["hbm_roofline_fraction"] = round(
            (hbm_bytes / 819e9) / (elapsed / n), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
