"""Per-HLO byte attribution for the SD1.5 @512 steps (VERDICT r3 weak #5:
SD1.5 LoRA runs at 27.8% util and full-FT at 30.8% vs SDXL's 40.8%, and
no byte attribution exists for the conv-heavy UNet at 512px — a
different traffic mix than SDXL @1024).

Builds the same steps as bench.py's sd15 stage (LoRA bs4, no remat) and
exp_sd15_ft.py (full-FT bs4, full remat, masked+EMA+ZTSNR), compiles,
and attributes HBM bytes per fused kernel via experiments/hlo_bytes.py.

Usage: python experiments/exp_byte_attr_sd15.py [lora|ft] [bs]
"""
from __future__ import annotations

import json
import os
import sys


def build_step(kind: str, bs: int):
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
    from onetrainer_tpu.train.sd_train_step import (
        SDStepConfig, make_sd_train_step,
    )
    from onetrainer_tpu.train.train_state import create_train_state
    from onetrainer_tpu.util.enums import ModelType, TrainingMethod

    lat = 64
    if kind == "lora":
        model = create_sd_model(ModelType.STABLE_DIFFUSION_15,
                                dtype=jnp.bfloat16,
                                gradient_checkpointing=False)
    else:
        model = create_sd_model(ModelType.STABLE_DIFFUSION_15,
                                dtype=jnp.bfloat16,
                                gradient_checkpointing=True,
                                remat_policy="full")
        model.rescale_noise_scheduler_to_zero_terminal_snr()
    rng = jax.random.PRNGKey(0)
    unet_params = jax.jit(lambda r: model.unet.init(
        r, jnp.zeros((1, lat, lat, 4), jnp.bfloat16),
        jnp.asarray([1]),
        jnp.zeros((1, 77, 768), jnp.bfloat16)))(rng)["params"]
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-4))
    batch = {
        "latent_image": jax.random.normal(
            jax.random.PRNGKey(2), (bs, lat, lat, 4), jnp.bfloat16),
        "loss_weight": jnp.ones((bs,)),
        "text_encoder_hidden_state": jax.random.normal(
            jax.random.PRNGKey(3), (bs, 77, 768), jnp.bfloat16),
    }
    if kind == "lora":
        peft_cfg = PeftConfig(rank=16, alpha=16.0)
        adapters = init_peft_params(jax.random.PRNGKey(1), unet_params,
                                    peft_cfg)
        cfg = SDStepConfig(
            training_method=TrainingMethod.LORA, timestep=TimestepConfig(),
            loss=LossConfig(vb_loss_strength=0.0, batch_size=bs),
            stochastic_rounding=False)
        state = create_train_state({"unet_lora": adapters}, tx)
        step = make_sd_train_step(model, cfg, tx, peft_cfg)
        frozen = {"unet": unet_params, "text_encoder": None}
    else:
        cfg = SDStepConfig(
            training_method=TrainingMethod.FINE_TUNE,
            timestep=TimestepConfig(),
            loss=LossConfig(vb_loss_strength=0.0, batch_size=bs,
                            masked_training=True, raw_masked_training=True,
                            unmasked_weight=0.1,
                            normalize_masked_area_loss=True,
                            v_prediction=True),
            prediction_type="v_prediction", ema_decay=0.999,
            stochastic_rounding=True)
        state = create_train_state({"unet": unet_params}, tx,
                                   ema_enabled=True)
        step = make_sd_train_step(model, cfg, tx, peft_cfg=None)
        frozen = {"unet": None, "text_encoder": None}
        batch["latent_mask"] = (jax.random.uniform(
            jax.random.PRNGKey(7), (bs, lat, lat, 1)) > 0.5
        ).astype(jnp.bfloat16)
    return step, state, frozen, batch, jax.random.PRNGKey(6)


def main():
    kind = sys.argv[1] if len(sys.argv) > 1 else "lora"
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    step, state, frozen, batch, rng = build_step(kind, bs)
    compiled = step.lower(state, frozen, batch, rng).compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    hlo = compiled.as_text()
    with open(f"/tmp/sd15_{kind}_hlo.txt", "w") as f:
        f.write(hlo)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from hlo_bytes import parse_entry_instructions, summarize
    summary = summarize(parse_entry_instructions(hlo), top_n=40)
    summary["kind"] = kind
    summary["bs"] = bs
    summary["xla_cost_bytes_gb"] = round(
        float(analysis.get("bytes accessed", 0.0)) / 1e9, 2)
    summary["xla_cost_tflops"] = round(
        float(analysis.get("flops", 0)) / 1e12, 2)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
