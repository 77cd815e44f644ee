"""Würstchen v2 / Stable Cascade model aggregate
(reference: modules/model/WuerstchenModel.py): prior + EfficientNet
encoder + prior CLIP text encoder, plus the decoder stage
(text encoder + diffnext/unet + VQGAN) used for sampling."""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp

from onetrainer_tpu.models.clip import CLIPTextConfig, CLIPTextModel as CLIPTextEncoder
from onetrainer_tpu.models.cascade import CascadePriorConfig, StableCascadePrior
from onetrainer_tpu.models.wuerstchen import (
    EffnetConfig, WuerstchenEffnetEncoder, WuerstchenPrior,
    WuerstchenPriorConfig,
)
from onetrainer_tpu.util.enums import ModelType


@dataclass
class WuerstchenModel:
    model_type: ModelType
    prior_config: WuerstchenPriorConfig | CascadePriorConfig
    effnet_config: EffnetConfig
    te_config: CLIPTextConfig

    prior_params: dict | None = None
    effnet_params: dict | None = None
    te_params: dict | None = None

    # decoder stage (sampling only; reference: decoder_* attributes)
    decoder_config: object | None = None       # DiffNeXtConfig
    vqgan_config: object | None = None         # PaellaVQConfig
    decoder_params: dict | None = None
    vqgan_params: dict | None = None
    decoder_te_config: CLIPTextConfig | None = None
    decoder_te_params: dict | None = None
    decoder_tokenizer: object | None = None

    prediction_type: str = "epsilon"
    text_encoder_layer_skip: int = 0
    embeddings: dict = field(default_factory=dict)
    tokenizer: object | None = None

    @property
    def prior(self):
        if isinstance(self.prior_config, CascadePriorConfig):
            return StableCascadePrior(self.prior_config)
        return WuerstchenPrior(self.prior_config)

    @property
    def effnet(self) -> WuerstchenEffnetEncoder:
        return WuerstchenEffnetEncoder(self.effnet_config)

    @property
    def text_encoder(self) -> CLIPTextEncoder:
        return CLIPTextEncoder(self.te_config)

    @property
    def decoder(self):
        from onetrainer_tpu.models.diffnext import WuerstchenDiffNeXt
        return WuerstchenDiffNeXt(self.decoder_config)

    @property
    def vqgan_decoder(self):
        from onetrainer_tpu.models.paella_vq import PaellaVQDecoder
        return PaellaVQDecoder(self.vqgan_config)

    @property
    def decoder_text_encoder(self) -> CLIPTextEncoder:
        return CLIPTextEncoder(self.decoder_te_config)

    # the training loop treats this like a VAE-config carrier; effnet
    # latents are image*(0.75/32) spatial (≈ /42.67)
    @property
    def vae_config(self):
        class _Cfg:
            spatial_scale = 128.0 / 3.0
            scaling_factor = 1.0
        return _Cfg()

    def latent_size(self, height: int, width: int) -> tuple[int, int]:
        return (int(round(height * 0.75)) // 32, int(round(width * 0.75)) // 32)


def create_wuerstchen_model(model_type: ModelType, dtype=jnp.bfloat16,
                            gradient_checkpointing: bool = False,
                            ) -> WuerstchenModel:
    from onetrainer_tpu.models.clip import clip_h_text_config
    return WuerstchenModel(
        model_type=model_type,
        prior_config=WuerstchenPriorConfig(
            dtype=dtype, gradient_checkpointing=gradient_checkpointing),
        effnet_config=EffnetConfig(dtype=dtype),
        te_config=clip_h_text_config(dtype=dtype),
    )
