"""Per-sample deterministic loss generation for dataset debugging
(reference: modules/module/GenerateLossesModel.py:17-60 — runs one
deterministic epoch at batch size 1 and writes a per-file loss JSON,
sorted descending)."""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp

from onetrainer_tpu.config.train_config import TrainConfig
from onetrainer_tpu.data.loader import Text2ImageDataLoader
from onetrainer_tpu.math.losses import diffusion_losses
from onetrainer_tpu.setup.families import get_family


class GenerateLossesModel:
    def __init__(self, config: TrainConfig, output_path: str):
        self.config = config
        self.output_path = output_path

    def start(self):
        config = self.config
        config.batch_size = 1
        family = get_family(config.model_type)
        model = family.load(config.base_model_name, config)
        setup = family.create_setup(model, config, 1)
        encode_images, encode_text = family.make_encode_fns(setup)
        loader = Text2ImageDataLoader(
            config, encode_images, encode_text,
            quantization=family.quantization, model_tag=str(config.model_type),
            latent_scale=model.vae_config.spatial_scale)

        coefficients = model.coefficients()
        cfg = setup.step_cfg

        if family.name == "sdxl":
            from onetrainer_tpu.train.sdxl_train_step import sdxl_predict

            @jax.jit
            def eval_loss(frozen, batch):
                unet, te, te2, extra = (frozen["unet"], frozen.get("text_encoder"),
                                        frozen.get("text_encoder_2"), None)
                data = sdxl_predict(model, unet, te, te2, batch,
                                    jax.random.PRNGKey(0), cfg, coefficients,
                                    deterministic=True)
                return diffusion_losses(batch, data, cfg.loss, coefficients)
        else:
            from onetrainer_tpu.train.sd_train_step import sd_predict

            @jax.jit
            def eval_loss(frozen, batch):
                data, _ = sd_predict(
                    model.unet.apply, model.text_encoder.apply,
                    frozen["unet"], frozen.get("text_encoder"), batch,
                    jax.random.PRNGKey(0), cfg, coefficients, deterministic=True)
                return diffusion_losses(batch, data, cfg.loss, coefficients)

        frozen = dict(setup.frozen)
        frozen.update(setup.trainable)
        losses: dict[str, float] = {}
        batches = loader.batches_for_epoch(0)
        loader.ensure_cached(batches)
        for batch_samples in batches:
            batch_np = loader.materialize_batch(batch_samples)
            batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
            value = eval_loss(frozen, batch)
            entry = loader.entries[batch_samples[0].entry_index]
            losses[entry.image_path] = float(value[0])

        ordered = dict(sorted(losses.items(), key=lambda kv: -kv[1]))
        os.makedirs(os.path.dirname(os.path.abspath(self.output_path)), exist_ok=True)
        with open(self.output_path, "w") as f:
            json.dump(ordered, f, indent=4)
        return ordered
