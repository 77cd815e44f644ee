"""Würstchen v2 / Stable Cascade setup: trainable/frozen trees, optimizer,
encode fns, jitted train step
(reference: modules/modelSetup/WuerstchenLoRASetup.py,
WuerstchenFineTuneSetup.py, WuerstchenEmbeddingSetup.py,
BaseWuerstchenSetup.py)."""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
import optax

from onetrainer_tpu.config.train_config import TrainConfig
from onetrainer_tpu.models.clip import apply_final_layer_norm, encode_clip_text
from onetrainer_tpu.models.wuerstchen_model import WuerstchenModel
from onetrainer_tpu.peft.lora import PeftConfig, apply_peft, init_peft_params
from onetrainer_tpu.setup.sd_setup import (
    _group_schedule, _init_embedding_vectors,
)
from onetrainer_tpu.setup.tokenizer import SDTokenizer
from onetrainer_tpu.train.optimizers import create_group_optimizer
from onetrainer_tpu.train.sd_train_step import SDStepConfig
from onetrainer_tpu.train.train_state import create_train_state
from onetrainer_tpu.train.wuerstchen_train_step import (
    make_wuerstchen_train_step,
)
from onetrainer_tpu.util.enums import EMAMode, TrainingMethod

# imagenet channel stats for the EfficientNet encoder
# (reference: WuerstchenBaseDataLoader.py:65 NormalizeImageChannels)
_IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


@dataclass
class WuerstchenSetup:
    model: WuerstchenModel
    config: TrainConfig
    tokenizer: SDTokenizer
    peft_cfg: PeftConfig | None
    step_cfg: SDStepConfig
    trainable: dict
    frozen: dict
    tx: object
    train_step: object
    state: object = None
    embedding_ids: dict = field(default_factory=dict)
    group_schedules: dict = field(default_factory=dict)

    def merged_inference_params(self, params=None):
        params = params if params is not None else self.state.params
        method = self.config.training_method
        if method == TrainingMethod.LORA:
            prior = apply_peft(self.frozen["prior"], params["prior_lora"],
                               self.peft_cfg) if "prior_lora" in params \
                else self.frozen["prior"]
            te = self.frozen.get("text_encoder")
            if "te_lora" in params and te is not None:
                te = apply_peft(te, params["te_lora"], self.peft_cfg)
            return prior, te, params.get("embeddings")
        if method == TrainingMethod.EMBEDDING:
            return (self.frozen["prior"], self.frozen["text_encoder"],
                    params["embeddings"])
        prior = params.get("prior", self.frozen.get("prior"))
        te = params.get("text_encoder", self.frozen.get("text_encoder"))
        return prior, te, params.get("embeddings")


def create_wuerstchen_setup(
        model: WuerstchenModel,
        config: TrainConfig,
        total_steps: int = 10_000,
        steps_per_epoch: int = 100,
) -> WuerstchenSetup:
    method = config.training_method

    if isinstance(model.tokenizer, SDTokenizer):
        tokenizer = model.tokenizer
    else:
        tc = model.te_config
        tokenizer = SDTokenizer(
            model.tokenizer, max_length=tc.max_position_embeddings,
            vocab_size=tc.vocab_size, bos=max(tc.eos_token_id - 1, 0),
            eos=tc.eos_token_id)
        model.tokenizer = tokenizer

    peft_cfg = None
    trainable: dict = {}
    frozen: dict = {}
    group_schedules: dict = {}
    labels: dict = {}
    embedding_ids: dict = {}

    if method == TrainingMethod.LORA:
        peft_cfg = PeftConfig.from_train_config(config)
        if config.prior.train:
            trainable["prior_lora"] = init_peft_params(
                jax.random.PRNGKey(0), model.prior_params, peft_cfg)
            group_schedules["prior_lora"] = _group_schedule(
                config, config.prior.learning_rate, total_steps,
                config.prior, steps_per_epoch)
            labels["prior_lora"] = jax.tree.map(
                lambda _: "prior_lora", trainable["prior_lora"])
        if config.text_encoder.train and model.te_params is not None:
            trainable["te_lora"] = init_peft_params(
                jax.random.PRNGKey(1), model.te_params, peft_cfg)
            group_schedules["te_lora"] = _group_schedule(
                config, config.text_encoder.learning_rate, total_steps,
                config.text_encoder, steps_per_epoch)
            labels["te_lora"] = jax.tree.map(
                lambda _: "te_lora", trainable["te_lora"])
        if config.lora_model_name:
            # continue training from an existing kohya LoRA file
            # (reference: LoRALoaderMixin.py:14-90)
            from onetrainer_tpu.peft.lora import apply_lora_checkpoint
            peft_cfg = apply_lora_checkpoint(
                config.lora_model_name, trainable,
                {"prior_lora": "lora_prior", "te_lora": "lora_prior_te"},
                peft_cfg)
        frozen["prior"] = model.prior_params
        frozen["text_encoder"] = model.te_params
    elif method == TrainingMethod.EMBEDDING:
        vectors, embedding_ids = _init_embedding_vectors(
            model, model.te_params, tokenizer, config)
        trainable["embeddings"] = vectors
        lr = config.embedding_learning_rate or config.learning_rate
        group_schedules["embeddings"] = _group_schedule(config, lr, total_steps,
                steps_per_epoch=steps_per_epoch)
        labels["embeddings"] = "embeddings"
        frozen["prior"] = model.prior_params
        frozen["text_encoder"] = model.te_params
    else:  # FINE_TUNE
        if config.prior.train:
            trainable["prior"] = model.prior_params
            group_schedules["prior"] = _group_schedule(
                config, config.prior.learning_rate, total_steps,
                config.prior, steps_per_epoch)
            labels["prior"] = jax.tree.map(lambda _: "prior",
                                           trainable["prior"])
        else:
            frozen["prior"] = model.prior_params
        if config.text_encoder.train:
            trainable["text_encoder"] = model.te_params
            group_schedules["text_encoder"] = _group_schedule(
                config, config.text_encoder.learning_rate, total_steps,
                config.text_encoder, steps_per_epoch)
            labels["text_encoder"] = jax.tree.map(
                lambda _: "text_encoder", trainable["text_encoder"])
        else:
            frozen["text_encoder"] = model.te_params
        if config.train_any_embedding():
            vectors, embedding_ids = _init_embedding_vectors(
                model, model.te_params, tokenizer, config)
            if vectors is not None:
                trainable["embeddings"] = vectors
                lr = config.embedding_learning_rate or config.learning_rate
                group_schedules["embeddings"] = _group_schedule(
                    config, lr, total_steps, steps_per_epoch=steps_per_epoch)
                labels["embeddings"] = "embeddings"

    # quantized frozen base (setup/quantize.py; reference quantizes the
    # same parts post-load: modules/util/quantization_util.py:72-160)
    from onetrainer_tpu.setup.quantize import quantize_frozen_parts
    quantize_frozen_parts(frozen, config.weight_dtypes(),
                          {"prior": "prior", "text_encoder": "text_encoder"},
                          model=model)

    tx = create_group_optimizer(
        group_schedules, config.optimizer.optimizer, config.optimizer, labels)
    if config.clip_grad_norm is not None and config.clip_grad_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(config.clip_grad_norm), tx)
    if config.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=config.gradient_accumulation_steps)

    step_cfg = SDStepConfig.from_train_config(
        config, "epsilon", config.text_encoder_layer_skip or 0)
    overrides = {"vae_scaling_factor": 1.0}
    if method == TrainingMethod.EMBEDDING or embedding_ids:
        overrides["train_text_encoder"] = True
    step_cfg = SDStepConfig(**{**step_cfg.__dict__, **overrides})

    train_step = make_wuerstchen_train_step(model, step_cfg, tx, peft_cfg)
    state = create_train_state(trainable, tx,
                               ema_enabled=config.ema != EMAMode.OFF)

    return WuerstchenSetup(
        model=model, config=config, tokenizer=tokenizer, peft_cfg=peft_cfg,
        step_cfg=step_cfg, trainable=trainable, frozen=frozen, tx=tx,
        train_step=train_step, state=state, embedding_ids=embedding_ids,
        group_schedules=group_schedules)


def make_wuerstchen_encode_fns(setup: WuerstchenSetup):
    """Data-loader encode fns: ×0.75 resize + imagenet normalization +
    jitted EfficientNet encode (the family's latent cache), plus CLIP text
    caching (reference: WuerstchenBaseDataLoader._preparation_modules,
    EncodeWuerstchenEffnet)."""
    model = setup.model
    effnet_params = model.effnet_params

    # params are jit arguments, not closure captures (captured arrays
    # inline into the HLO as literals — see make_sdxl_encode_fns)
    @jax.jit
    def _effnet_encode(effnet_params, pixels01):
        x = (pixels01 - _IMAGENET_MEAN) / _IMAGENET_STD
        return model.effnet.apply({"params": effnet_params}, x)

    def encode_images(images: np.ndarray) -> dict:
        # images arrive in [-1, 1]; the reference scales by 0.75 first
        b, h, w, c = images.shape
        x01 = (jnp.asarray(images) + 1.0) * 0.5
        target = (int(round(h * 0.75)), int(round(w * 0.75)))
        x01 = jax.image.resize(x01, (b,) + target + (c,), "bilinear")
        latent = _effnet_encode(effnet_params, x01)
        return {"latent_image": np.asarray(latent, np.float32)}

    cache_te = not setup.step_cfg.train_text_encoder and model.te_params is not None

    if cache_te:
        te_params = model.te_params

        is_cascade = model.model_type.is_stable_cascade()

        @jax.jit
        def _te_encode(te_params, tokens):
            out = model.text_encoder.apply({"params": te_params}, tokens[None])
            hidden = encode_clip_text(out, setup.step_cfg.text_encoder_layer_skip)
            if is_cascade:
                # Cascade: raw hidden state + pooled projection
                # (reference: WuerstchenModel.encode_text:249-251)
                return hidden[0], out["pooled_output"][0]
            return apply_final_layer_norm(te_params, hidden)[0], None

        def encode_text(prompt: str) -> dict:
            tokens = setup.tokenizer(prompt)
            hidden, pooled = _te_encode(te_params, jnp.asarray(tokens))
            row = {"tokens": tokens,
                   "text_encoder_hidden_state": np.asarray(hidden, np.float32)}
            if pooled is not None:
                row["pooled_text_encoder_output"] = np.asarray(pooled, np.float32)
            return row
    else:
        def encode_text(prompt: str) -> dict:
            return {"tokens": setup.tokenizer(prompt)}

    return encode_images, encode_text
