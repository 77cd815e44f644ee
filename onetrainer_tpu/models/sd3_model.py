"""SD3/3.5 model aggregate (reference: modules/model/StableDiffusion3Model.py):
MMDiT + 16ch VAE + CLIP-L + CLIP-G (both with projection) + T5-XXL."""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp

from onetrainer_tpu.models.clip import (
    CLIPTextConfig, CLIPTextModel, clip_vit_l_config, open_clip_vit_bigg_config,
)
from onetrainer_tpu.models.sd3 import (
    SD3Config, SD3Transformer2D, sd3_medium_config, sd35_medium_config,
)
from onetrainer_tpu.models.t5 import T5Config, T5Encoder, t5_xxl_config
from onetrainer_tpu.models.vae import AutoencoderKL, VAEConfig
from onetrainer_tpu.util.enums import ModelType


def sd3_vae_config(dtype=jnp.bfloat16) -> VAEConfig:
    return VAEConfig(latent_channels=16, scaling_factor=1.5305,
                     shift_factor=0.0609, dtype=dtype)


@dataclass
class StableDiffusion3Model:
    model_type: ModelType
    transformer_config: SD3Config
    vae_config: VAEConfig
    te_config: CLIPTextConfig     # clip_l (projection)
    te2_config: CLIPTextConfig    # clip_g (projection)
    te3_config: T5Config          # t5-xxl

    transformer_params: dict | None = None
    vae_params: dict | None = None
    te_params: dict | None = None
    te2_params: dict | None = None
    te3_params: dict | None = None

    prediction_type: str = "flow"
    embeddings: dict = field(default_factory=dict)
    tokenizer: object | None = None
    tokenizer_2: object | None = None
    tokenizer_3: object | None = None

    @property
    def transformer(self) -> SD3Transformer2D:
        return SD3Transformer2D(self.transformer_config)

    @property
    def vae(self) -> AutoencoderKL:
        return AutoencoderKL(self.vae_config)

    @property
    def text_encoder(self) -> CLIPTextModel:
        return CLIPTextModel(self.te_config)

    @property
    def text_encoder_2(self) -> CLIPTextModel:
        return CLIPTextModel(self.te2_config)

    @property
    def text_encoder_3(self) -> T5Encoder:
        return T5Encoder(self.te3_config)


def create_sd3_model(model_type: ModelType, dtype=jnp.bfloat16,
                     gradient_checkpointing: bool = False) -> StableDiffusion3Model:
    tcfg = (sd35_medium_config if model_type == ModelType.STABLE_DIFFUSION_35
            else sd3_medium_config)(
        dtype=dtype, gradient_checkpointing=gradient_checkpointing)
    # SD3's CLIP-L also projects (projection_dim 768)
    te_cfg = clip_vit_l_config(dtype=dtype, projection_dim=768)
    return StableDiffusion3Model(
        model_type=model_type,
        transformer_config=tcfg,
        vae_config=sd3_vae_config(dtype),
        te_config=te_cfg,
        te2_config=open_clip_vit_bigg_config(dtype=dtype),
        te3_config=t5_xxl_config(dtype=dtype),
    )
