"""StableDiffusion 1.5/2.x model aggregate: configs + param trees +
schedule for the whole family (reference: modules/model/StableDiffusionModel.py).

Pure data — all compute goes through the flax module defs; device
placement is owned by sharding, not by `*_to(device)` shuffling."""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp

from onetrainer_tpu.math.schedules import (
    DiffusionScheduleCoefficients, make_betas, rescale_betas_zero_terminal_snr,
)
from onetrainer_tpu.models.clip import (
    CLIPTextConfig, CLIPTextModel, clip_vit_l_config, open_clip_vit_h_config,
)
from onetrainer_tpu.models.unet import (
    UNet2DCondition, UNetConfig, sd15_inpaint_unet_config, sd15_unet_config,
    sd20_depth_unet_config, sd21_inpaint_unet_config, sd21_unet_config,
)
from onetrainer_tpu.models.vae import AutoencoderKL, VAEConfig, sd15_vae_config
from onetrainer_tpu.util.enums import ModelType


@dataclass
class StableDiffusionModel:
    model_type: ModelType
    unet_config: UNetConfig
    vae_config: VAEConfig
    te_config: CLIPTextConfig

    unet_params: dict | None = None
    vae_params: dict | None = None
    te_params: dict | None = None

    # training-time state
    betas: jnp.ndarray | None = None
    prediction_type: str = "epsilon"        # or "v_prediction"
    text_encoder_layer_skip: int = 0
    # trained embeddings: {uuid: {"vectors": [n, hidden]}}
    embeddings: dict = field(default_factory=dict)
    tokenizer: object | None = None

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

    def coefficients(self) -> DiffusionScheduleCoefficients:
        return DiffusionScheduleCoefficients.from_betas(self.betas)

    def rescale_noise_scheduler_to_zero_terminal_snr(self):
        """(reference: StableDiffusionModel.py:173-182 + convert util)"""
        self.betas = rescale_betas_zero_terminal_snr(self.betas)

    def force_v_prediction(self):
        self.prediction_type = "v_prediction"

    def force_epsilon_prediction(self):
        self.prediction_type = "epsilon"


def create_sd_model(model_type: ModelType, dtype=jnp.bfloat16,
                    gradient_checkpointing: bool = False,
                    remat_policy: str | None = None) -> StableDiffusionModel:
    from onetrainer_tpu.models.remat import default_policy
    common = dict(dtype=dtype, gradient_checkpointing=gradient_checkpointing,
                  remat_policy=remat_policy or default_policy("unet"))
    if model_type in (ModelType.STABLE_DIFFUSION_15,):
        unet_cfg = sd15_unet_config(**common)
        te_cfg = clip_vit_l_config(dtype=dtype)
        layer_skip = 0
    elif model_type == ModelType.STABLE_DIFFUSION_15_INPAINTING:
        unet_cfg = sd15_inpaint_unet_config(**common)
        te_cfg = clip_vit_l_config(dtype=dtype)
        layer_skip = 0
    elif model_type in (ModelType.STABLE_DIFFUSION_20, ModelType.STABLE_DIFFUSION_21):
        unet_cfg = sd21_unet_config(**common)
        te_cfg = open_clip_vit_h_config(dtype=dtype)
        layer_skip = 1  # SD2.x uses the penultimate hidden state
    elif model_type in (ModelType.STABLE_DIFFUSION_20_BASE, ModelType.STABLE_DIFFUSION_21_BASE):
        unet_cfg = sd21_unet_config(**common)
        te_cfg = open_clip_vit_h_config(dtype=dtype)
        layer_skip = 1
    elif model_type == ModelType.STABLE_DIFFUSION_20_INPAINTING:
        unet_cfg = sd21_inpaint_unet_config(**common)
        te_cfg = open_clip_vit_h_config(dtype=dtype)
        layer_skip = 1
    elif model_type == ModelType.STABLE_DIFFUSION_20_DEPTH:
        unet_cfg = sd20_depth_unet_config(**common)
        te_cfg = open_clip_vit_h_config(dtype=dtype)
        layer_skip = 1
    else:
        raise ValueError(f"not an SD1/2 model type: {model_type}")

    return StableDiffusionModel(
        model_type=model_type,
        unet_config=unet_cfg,
        vae_config=sd15_vae_config(dtype=dtype),
        te_config=te_cfg,
        text_encoder_layer_skip=layer_skip,
    )
