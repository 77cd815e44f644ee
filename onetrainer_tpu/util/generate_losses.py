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

        from onetrainer_tpu.setup.families import make_eval_loss
        eval_loss = make_eval_loss(setup, family.name)
        losses: dict[str, float] = {}
        batches = loader.batches_for_epoch(0)
        loader.ensure_cached(batches)
        for batch_samples in batches:
            batch_np = loader.materialize_batch(batch_samples)
            batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
            value = eval_loss(batch)
            entry = loader.entries[batch_samples[0].entry_index]
            losses[entry.image_path] = float(value[0])

        ordered = dict(sorted(losses.items(), key=lambda kv: -kv[1]))
        os.makedirs(os.path.dirname(os.path.abspath(self.output_path)), exist_ok=True)
        with open(self.output_path, "w") as f:
            json.dump(ordered, f, indent=4)
        return ordered
