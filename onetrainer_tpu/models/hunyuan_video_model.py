"""HunyuanVideo model aggregate
(reference: modules/model/HunyuanVideoModel.py): 3D DiT + causal video VAE
+ Llama text encoder (primary) + CLIP-L (pooled)."""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp

from onetrainer_tpu.models.clip import CLIPTextConfig, CLIPTextModel
from onetrainer_tpu.models.hunyuan_video import (
    HunyuanVideoConfig, HunyuanVideoTransformer3D,
)
from onetrainer_tpu.models.llama import LlamaConfig, LlamaEncoder
from onetrainer_tpu.models.video_vae import AutoencoderKLVideo, VideoVAEConfig
from onetrainer_tpu.util.enums import ModelType


@dataclass
class HunyuanVideoModel:
    model_type: ModelType
    transformer_config: HunyuanVideoConfig
    vae_config: VideoVAEConfig
    te_config: LlamaConfig            # text_encoder_1 (llama)
    te2_config: CLIPTextConfig        # text_encoder_2 (CLIP-L, pooled only)

    transformer_params: dict | None = None
    vae_params: dict | None = None
    te_params: dict | None = None
    te2_params: dict | None = None

    prediction_type: str = "flow"
    embeddings: dict = field(default_factory=dict)
    tokenizer: object | None = None        # llama tokenizer wrapper
    tokenizer_2: object | None = None      # CLIP tokenizer wrapper

    @property
    def transformer(self) -> HunyuanVideoTransformer3D:
        return HunyuanVideoTransformer3D(self.transformer_config)

    @property
    def vae(self) -> AutoencoderKLVideo:
        return AutoencoderKLVideo(self.vae_config)

    @property
    def text_encoder(self) -> LlamaEncoder:
        return LlamaEncoder(self.te_config)

    @property
    def text_encoder_2(self) -> CLIPTextModel:
        return CLIPTextModel(self.te2_config)


def create_hunyuan_video_model(model_type: ModelType, dtype=jnp.bfloat16,
                               gradient_checkpointing: bool = False,
                               ) -> HunyuanVideoModel:
    from onetrainer_tpu.models.clip import clip_vit_l_config
    from onetrainer_tpu.models.llama import llama3_8b_config
    return HunyuanVideoModel(
        model_type=model_type,
        transformer_config=HunyuanVideoConfig(
            dtype=dtype, gradient_checkpointing=gradient_checkpointing),
        vae_config=VideoVAEConfig(dtype=dtype),
        te_config=llama3_8b_config(dtype=dtype),
        te2_config=clip_vit_l_config(dtype=dtype, projection_dim=768),
    )
