"""Generate the committed loss-curve parity artifact: a deterministic tiny
SD1.5 LoRA run (BASELINE config 1 shape: rank-16-equivalent LoRA, eps MSE,
AdamW, cached latents/text) whose loss curve is written to
docs/parity/sd15_lora_loss_curve.json.

Determinism comes from the crc32-seeded data pipeline + fixed PRNG keys,
so re-running this script on any host must reproduce the curve bit-for-
tolerance (tests/test_loss_curve.py asserts this on a shorter run).
TensorBoard tags logged during real runs (`loss/train_step`,
`smooth_loss/train_step`, `lr/*`) follow the reference naming
(reference: GenericTrainer.py:725-748) so curves can be overlaid directly
against reference GPU runs.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def run(steps: int = 60, out_path: str | None = None) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from onetrainer_tpu.math.losses import LossConfig
    from onetrainer_tpu.math.timesteps import TimestepConfig
    from onetrainer_tpu.models.clip import CLIPTextConfig
    from onetrainer_tpu.models.sd import StableDiffusionModel
    from onetrainer_tpu.models.unet import UNetConfig
    from onetrainer_tpu.models.vae import VAEConfig
    from onetrainer_tpu.peft.lora import PeftConfig, init_peft_params
    from onetrainer_tpu.train.sd_train_step import (
        SDStepConfig, make_sd_train_step,
    )
    from onetrainer_tpu.train.train_state import create_train_state
    from onetrainer_tpu.util.enums import ModelType, TrainingMethod

    model = StableDiffusionModel(
        model_type=ModelType.STABLE_DIFFUSION_15,
        unet_config=UNetConfig(
            block_out_channels=(32, 64), cross_attn_blocks=(True, False),
            layers_per_block=1, transformer_layers_per_block=(1, 1),
            num_heads=(4, 4), cross_attention_dim=32, dtype=jnp.float32),
        vae_config=VAEConfig(block_out_channels=(32, 64), layers_per_block=1,
                             dtype=jnp.float32),
        te_config=CLIPTextConfig(
            vocab_size=100, hidden_size=32, intermediate_size=64,
            num_layers=2, num_heads=4, max_position_embeddings=16,
            eos_token_id=99, dtype=jnp.float32),
    )
    rng = jax.random.PRNGKey(0)
    unet_params = model.unet.init(
        rng, jnp.zeros((1, 8, 8, 4)), jnp.asarray([1]),
        jnp.zeros((1, 8, 32)))["params"]

    peft_cfg = PeftConfig(rank=16, alpha=16.0)
    adapters = init_peft_params(jax.random.PRNGKey(1), unet_params, peft_cfg)
    cfg = SDStepConfig(
        training_method=TrainingMethod.LORA, timestep=TimestepConfig(),
        loss=LossConfig(vb_loss_strength=0.0),
        stochastic_rounding=False)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-3))
    state = create_train_state({"unet_lora": adapters}, tx)
    step = make_sd_train_step(model, cfg, tx, peft_cfg)
    frozen = {"unet": unet_params, "text_encoder": None}

    batch_rng = np.random.default_rng(7)
    losses = []
    for i in range(steps):
        batch = {
            "latent_image": jnp.asarray(
                batch_rng.standard_normal((2, 8, 8, 4)), jnp.float32) * 0.5,
            "loss_weight": jnp.ones((2,)),
            "text_encoder_hidden_state": jnp.asarray(
                batch_rng.standard_normal((2, 8, 32)), jnp.float32),
        }
        state, metrics = step(state, frozen, batch, jax.random.PRNGKey(3))
        losses.append(float(metrics["loss"]))

    artifact = {
        "workload": "sd15-shape LoRA r16, eps-pred MSE, AdamW 1e-3, bs2, "
                    "deterministic synthetic latents (seed 7), "
                    "step rng fold_in(step)",
        "steps": steps,
        "loss": [round(v, 6) for v in losses],
        "mean_first_10": round(float(np.mean(losses[:10])), 6),
        "mean_last_10": round(float(np.mean(losses[-10:])), 6),
    }
    if out_path:
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(artifact, f, indent=2)
        print(f"wrote {out_path}")
    return artifact


if __name__ == "__main__":
    result = run(out_path=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "parity", "sd15_lora_loss_curve.json"))
    print(json.dumps({k: v for k, v in result.items() if k != "loss"}))
