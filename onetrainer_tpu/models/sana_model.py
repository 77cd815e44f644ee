"""Sana model aggregate (reference: modules/model/SanaModel.py):
Sana linear-attention DiT + DC-AE (32×) + Gemma2 text encoder."""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp

from onetrainer_tpu.models.dcae import AutoencoderDC, DCAEConfig
from onetrainer_tpu.models.gemma import Gemma2Config, Gemma2Encoder
from onetrainer_tpu.models.sana import SanaConfig, SanaTransformer2D
from onetrainer_tpu.util.enums import ModelType


@dataclass
class SanaModel:
    model_type: ModelType
    transformer_config: SanaConfig
    vae_config: DCAEConfig
    te_config: Gemma2Config

    transformer_params: dict | None = None
    vae_params: dict | None = None
    te_params: dict | None = None

    prediction_type: str = "flow"
    embeddings: dict = field(default_factory=dict)
    tokenizer: object | None = None

    @property
    def transformer(self) -> SanaTransformer2D:
        return SanaTransformer2D(self.transformer_config)

    @property
    def vae(self) -> AutoencoderDC:
        return AutoencoderDC(self.vae_config)

    @property
    def text_encoder(self) -> Gemma2Encoder:
        return Gemma2Encoder(self.te_config)


def create_sana_model(model_type: ModelType, dtype=jnp.bfloat16,
                      gradient_checkpointing: bool = False) -> SanaModel:
    return SanaModel(
        model_type=model_type,
        transformer_config=SanaConfig(
            dtype=dtype, gradient_checkpointing=gradient_checkpointing),
        vae_config=DCAEConfig(dtype=dtype),
        te_config=Gemma2Config(dtype=dtype),
    )
