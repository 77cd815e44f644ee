"""HiDream model aggregate (reference: modules/model/HiDreamModel.py):
MoE DiT + FLUX VAE (16ch) + 4 text encoders (CLIP-L pooled, CLIP-G pooled,
T5 sequence, Llama-3 all-layer states)."""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp

from onetrainer_tpu.models.clip import CLIPTextConfig, CLIPTextModel
from onetrainer_tpu.models.hidream import HiDreamConfig, HiDreamTransformer2D
from onetrainer_tpu.models.llama import LlamaConfig, LlamaEncoder
from onetrainer_tpu.models.t5 import T5Config, T5Encoder
from onetrainer_tpu.models.vae import AutoencoderKL, VAEConfig
from onetrainer_tpu.util.enums import ModelType


@dataclass
class HiDreamModel:
    model_type: ModelType
    transformer_config: HiDreamConfig
    vae_config: VAEConfig
    te_config: CLIPTextConfig       # text_encoder_1 (CLIP-L, pooled)
    te2_config: CLIPTextConfig      # text_encoder_2 (CLIP-G, pooled)
    te3_config: T5Config            # text_encoder_3 (T5)
    te4_config: LlamaConfig         # text_encoder_4 (Llama-3)

    transformer_params: dict | None = None
    vae_params: dict | None = None
    te_params: dict | None = None
    te2_params: dict | None = None
    te3_params: dict | None = None
    te4_params: dict | None = None

    prediction_type: str = "flow"
    embeddings: dict = field(default_factory=dict)
    tokenizer: object | None = None
    tokenizer_2: object | None = None
    tokenizer_3: object | None = None
    tokenizer_4: object | None = None

    @property
    def transformer(self) -> HiDreamTransformer2D:
        return HiDreamTransformer2D(self.transformer_config)

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

    @property
    def text_encoder_4(self) -> LlamaEncoder:
        return LlamaEncoder(self.te4_config)


def create_hidream_model(model_type: ModelType, dtype=jnp.bfloat16,
                         gradient_checkpointing: bool = False) -> HiDreamModel:
    from onetrainer_tpu.models.clip import (
        clip_vit_l_config, open_clip_vit_bigg_config,
    )
    from onetrainer_tpu.models.llama import llama3_8b_config
    from onetrainer_tpu.models.t5 import t5_xxl_config
    from onetrainer_tpu.models.vae import flux_vae_config
    return HiDreamModel(
        model_type=model_type,
        transformer_config=HiDreamConfig(
            dtype=dtype, gradient_checkpointing=gradient_checkpointing),
        vae_config=flux_vae_config(dtype=dtype),
        te_config=clip_vit_l_config(dtype=dtype, projection_dim=768),
        te2_config=open_clip_vit_bigg_config(dtype=dtype),
        te3_config=t5_xxl_config(dtype=dtype),
        te4_config=llama3_8b_config(dtype=dtype),
    )
