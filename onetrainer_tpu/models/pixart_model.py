"""PixArt α/σ model aggregate (reference: modules/model/PixArtAlphaModel.py):
DiT + SD VAE (α; σ uses the SDXL VAE) + T5 encoder."""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp

from onetrainer_tpu.math.schedules import DiffusionScheduleCoefficients, make_betas
from onetrainer_tpu.models.pixart import (
    PixArtConfig, PixArtTransformer2D, pixart_alpha_config, pixart_sigma_config,
)
from onetrainer_tpu.models.t5 import T5Config, T5Encoder, t5_xxl_config
from onetrainer_tpu.models.vae import AutoencoderKL, VAEConfig, sd15_vae_config
from onetrainer_tpu.util.enums import ModelType


@dataclass
class PixArtAlphaModel:
    model_type: ModelType
    transformer_config: PixArtConfig
    vae_config: VAEConfig
    te_config: T5Config

    transformer_params: dict | None = None
    vae_params: dict | None = None
    te_params: dict | None = None

    betas: jnp.ndarray | None = None
    prediction_type: str = "epsilon"
    embeddings: dict = field(default_factory=dict)
    tokenizer: object | None = None

    def __post_init__(self):
        if self.betas is None:
            self.betas = make_betas("scaled_linear", 0.0001, 0.02, 1000)

    @property
    def transformer(self) -> PixArtTransformer2D:
        return PixArtTransformer2D(self.transformer_config)

    @property
    def vae(self) -> AutoencoderKL:
        return AutoencoderKL(self.vae_config)

    @property
    def text_encoder(self) -> T5Encoder:
        return T5Encoder(self.te_config)

    def coefficients(self) -> DiffusionScheduleCoefficients:
        return DiffusionScheduleCoefficients.from_betas(self.betas)


def create_pixart_model(model_type: ModelType, dtype=jnp.bfloat16,
                        gradient_checkpointing: bool = False) -> PixArtAlphaModel:
    cfg_fn = pixart_sigma_config if model_type == ModelType.PIXART_SIGMA \
        else pixart_alpha_config
    return PixArtAlphaModel(
        model_type=model_type,
        transformer_config=cfg_fn(dtype=dtype,
                                  gradient_checkpointing=gradient_checkpointing),
        vae_config=sd15_vae_config(dtype=dtype),
        te_config=t5_xxl_config(dtype=dtype),
    )
