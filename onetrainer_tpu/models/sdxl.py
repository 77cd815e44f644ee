"""StableDiffusionXL model aggregate (reference:
modules/model/StableDiffusionXLModel.py): UNet + VAE + dual text encoders
(CLIP ViT-L hidden states + OpenCLIP bigG hidden states & pooled)."""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp

from onetrainer_tpu.math.schedules import (
    DiffusionScheduleCoefficients, make_betas, rescale_betas_zero_terminal_snr,
)
from onetrainer_tpu.models.clip import (
    CLIPTextConfig, CLIPTextModel, clip_vit_l_config, open_clip_vit_bigg_config,
)
from onetrainer_tpu.models.unet import (
    UNet2DCondition, UNetConfig, sdxl_inpaint_unet_config, sdxl_unet_config,
)
from onetrainer_tpu.models.vae import AutoencoderKL, VAEConfig, sdxl_vae_config
from onetrainer_tpu.util.enums import ModelType


@dataclass
class StableDiffusionXLModel:
    model_type: ModelType
    unet_config: UNetConfig
    vae_config: VAEConfig
    te_config: CLIPTextConfig       # text_encoder_1 (CLIP ViT-L)
    te2_config: CLIPTextConfig      # text_encoder_2 (OpenCLIP bigG, projected)

    unet_params: dict | None = None
    vae_params: dict | None = None
    te_params: dict | None = None
    te2_params: dict | None = None

    betas: jnp.ndarray | None = None
    prediction_type: str = "epsilon"
    text_encoder_layer_skip: int = 1   # SDXL reads the penultimate layer
    embeddings: dict = field(default_factory=dict)
    tokenizer: object | None = None
    tokenizer_2: object | None = None

    def __post_init__(self):
        if self.betas is None:
            self.betas = make_betas("scaled_linear", 0.00085, 0.012, 1000)

    @property
    def unet(self) -> UNet2DCondition:
        return UNet2DCondition(self.unet_config)

    @property
    def vae(self) -> AutoencoderKL:
        return AutoencoderKL(self.vae_config)

    @property
    def text_encoder(self) -> CLIPTextModel:
        return CLIPTextModel(self.te_config)

    @property
    def text_encoder_2(self) -> CLIPTextModel:
        return CLIPTextModel(self.te2_config)

    def coefficients(self) -> DiffusionScheduleCoefficients:
        return DiffusionScheduleCoefficients.from_betas(self.betas)

    def rescale_noise_scheduler_to_zero_terminal_snr(self):
        self.betas = rescale_betas_zero_terminal_snr(self.betas)

    def force_v_prediction(self):
        self.prediction_type = "v_prediction"

    def force_epsilon_prediction(self):
        self.prediction_type = "epsilon"


def create_sdxl_model(model_type: ModelType, dtype=jnp.bfloat16,
                      gradient_checkpointing: bool = False,
                      remat_policy: str | None = None) -> StableDiffusionXLModel:
    from onetrainer_tpu.models.remat import default_policy
    common = dict(dtype=dtype, gradient_checkpointing=gradient_checkpointing,
                  remat_policy=remat_policy or default_policy("unet"))
    if model_type == ModelType.STABLE_DIFFUSION_XL_10_BASE_INPAINTING:
        unet_cfg = sdxl_inpaint_unet_config(**common)
    else:
        unet_cfg = sdxl_unet_config(**common)
    return StableDiffusionXLModel(
        model_type=model_type,
        unet_config=unet_cfg,
        vae_config=sdxl_vae_config(dtype=dtype),
        te_config=clip_vit_l_config(dtype=dtype),
        te2_config=open_clip_vit_bigg_config(dtype=dtype),
    )
