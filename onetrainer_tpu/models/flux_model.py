"""FLUX.1 model aggregate (reference: modules/model/FluxModel.py):
FluxTransformer2D + 16ch VAE + CLIP-L (pooled) + T5-XXL (sequence)."""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp

from onetrainer_tpu.models.clip import CLIPTextConfig, CLIPTextModel, clip_vit_l_config
from onetrainer_tpu.models.flux import (
    FluxConfig, FluxTransformer2D, flux_dev_config, flux_fill_config,
)
from onetrainer_tpu.models.t5 import T5Config, T5Encoder, t5_xxl_config
from onetrainer_tpu.models.vae import AutoencoderKL, VAEConfig
from onetrainer_tpu.util.enums import ModelType


def flux_vae_config(dtype=jnp.bfloat16) -> VAEConfig:
    return VAEConfig(latent_channels=16, scaling_factor=0.3611,
                     shift_factor=0.1159, dtype=dtype)


@dataclass
class FluxModel:
    model_type: ModelType
    transformer_config: FluxConfig
    vae_config: VAEConfig
    te_config: CLIPTextConfig     # CLIP-L: pooled output only
    te2_config: T5Config          # T5-XXL: sequence states

    transformer_params: dict | None = None
    vae_params: dict | None = None
    te_params: dict | None = None
    te2_params: dict | None = None

    prediction_type: str = "flow"
    embeddings: dict = field(default_factory=dict)
    tokenizer: object | None = None      # CLIP tokenizer
    tokenizer_2: object | None = None    # T5 tokenizer

    @property
    def transformer(self) -> FluxTransformer2D:
        return FluxTransformer2D(self.transformer_config)

    @property
    def vae(self) -> AutoencoderKL:
        return AutoencoderKL(self.vae_config)

    @property
    def text_encoder(self) -> CLIPTextModel:
        return CLIPTextModel(self.te_config)

    @property
    def text_encoder_2(self) -> T5Encoder:
        return T5Encoder(self.te2_config)


def create_flux_model(model_type: ModelType, dtype=jnp.bfloat16,
                      gradient_checkpointing: bool = False) -> FluxModel:
    if model_type == ModelType.FLUX_FILL_DEV_1:
        tcfg = flux_fill_config(dtype=dtype,
                                gradient_checkpointing=gradient_checkpointing)
    else:
        tcfg = flux_dev_config(dtype=dtype,
                               gradient_checkpointing=gradient_checkpointing)
    return FluxModel(
        model_type=model_type,
        transformer_config=tcfg,
        vae_config=flux_vae_config(dtype),
        te_config=clip_vit_l_config(dtype=dtype),
        te2_config=t5_xxl_config(dtype=dtype),
    )
