"""Sana setup: trainable/frozen trees, optimizer, encode fns, jitted step
(reference: modules/modelSetup/SanaLoRASetup.py, SanaFineTuneSetup.py,
BaseSanaSetup.py)."""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
import optax

from onetrainer_tpu.config.train_config import TrainConfig
from onetrainer_tpu.models.gemma import apply_gemma_final_norm, encode_gemma_text
from onetrainer_tpu.models.sana_model import SanaModel
from onetrainer_tpu.peft.lora import PeftConfig, apply_peft, init_peft_params
from onetrainer_tpu.setup.sd_setup import _group_schedule
from onetrainer_tpu.setup.tokenizer import GemmaTokenizerWrapper
from onetrainer_tpu.train.optimizers import create_group_optimizer
from onetrainer_tpu.train.sana_train_step import make_sana_train_step
from onetrainer_tpu.train.sd_train_step import SDStepConfig
from onetrainer_tpu.train.train_state import create_train_state
from onetrainer_tpu.util.enums import EMAMode, TrainingMethod


@dataclass
class SanaSetup:
    model: SanaModel
    config: TrainConfig
    tokenizer: GemmaTokenizerWrapper
    peft_cfg: PeftConfig | None
    step_cfg: SDStepConfig
    trainable: dict
    frozen: dict
    tx: object
    train_step: object
    state: object = None
    embedding_ids: dict = field(default_factory=dict)
    group_schedules: dict = field(default_factory=dict)
    # artifact key names (reference: SanaEmbeddingSaver.py:27-31)
    embedding_save_keys: dict = field(default_factory=lambda: {
        "embeddings": "gemma", "output_embeddings": "gemma_out"})

    def merged_inference_params(self, params=None):
        params = params if params is not None else self.state.params
        method = self.config.training_method
        if method == TrainingMethod.LORA:
            transformer = apply_peft(
                self.frozen["transformer"], params["transformer_lora"],
                self.peft_cfg) if "transformer_lora" in params \
                else self.frozen["transformer"]
            te = self.frozen.get("text_encoder")
            if "te_lora" in params and te is not None:
                te = apply_peft(te, params["te_lora"], self.peft_cfg)
            return transformer, te, params.get("embeddings")
        transformer = params.get("transformer", self.frozen.get("transformer"))
        te = params.get("text_encoder", self.frozen.get("text_encoder"))
        return transformer, te, params.get("embeddings")


def create_sana_setup(
        model: SanaModel,
        config: TrainConfig,
        total_steps: int = 10_000,
        steps_per_epoch: int = 100,
) -> SanaSetup:
    method = config.training_method

    tokenizer = model.tokenizer if isinstance(model.tokenizer, GemmaTokenizerWrapper) \
        else GemmaTokenizerWrapper(model.tokenizer, max_length=300,
                                   vocab_size=model.te_config.vocab_size)
    model.tokenizer = tokenizer

    trainable: dict = {}
    frozen: dict = {"transformer": model.transformer_params,
                    "text_encoder": model.te_params}
    group_schedules: dict = {}
    labels: dict = {}
    peft_cfg = None
    embedding_ids: dict = {}
    out_spans: tuple = ()
    out_stds: tuple = ()
    n_input = 0

    if method == TrainingMethod.LORA:
        peft_cfg = PeftConfig.from_train_config(config)
        if config.prior.train:
            trainable["transformer_lora"] = init_peft_params(
                jax.random.PRNGKey(0), model.transformer_params, peft_cfg)
            group_schedules["transformer_lora"] = _group_schedule(
                config, config.prior.learning_rate, total_steps,
                config.prior, steps_per_epoch)
            labels["transformer_lora"] = jax.tree.map(
                lambda _: "transformer_lora", trainable["transformer_lora"])
        if config.text_encoder.train and model.te_params is not None:
            trainable["te_lora"] = init_peft_params(
                jax.random.PRNGKey(1), model.te_params, peft_cfg)
            group_schedules["te_lora"] = _group_schedule(
                config, config.text_encoder.learning_rate, total_steps,
                config.text_encoder, steps_per_epoch)
            labels["te_lora"] = jax.tree.map(
                lambda _: "te_lora", trainable["te_lora"])
    elif method == TrainingMethod.EMBEDDING:
        # Gemma2 textual inversion (reference: SanaEmbeddingSetup.py,
        # SanaEmbeddingSaver.py gemma/gemma_out keys)
        from onetrainer_tpu.setup.sd_setup import (
            _init_embedding_vectors, _init_output_embeddings,
        )
        lr = config.embedding_learning_rate or config.learning_rate
        vectors, embedding_ids = _init_embedding_vectors(
            model, model.te_params, tokenizer, config)
        if vectors is not None:
            trainable["embeddings"] = vectors
            group_schedules["embeddings"] = _group_schedule(config, lr, total_steps,
                steps_per_epoch=steps_per_epoch)
            labels["embeddings"] = "embeddings"
        n_input = int(vectors.shape[0]) if vectors is not None else 0
        out_in, out_vec, out_ids, out_spans, out_stds = \
            _init_output_embeddings(model.text_encoder, model.te_params,
                                    tokenizer, config, n_input)
        if out_vec is not None:
            trainable["output_embeddings"] = out_vec
            frozen["embedding_inputs"] = out_in
            group_schedules["output_embeddings"] = _group_schedule(
                config, lr, total_steps, steps_per_epoch=steps_per_epoch)
            labels["output_embeddings"] = "output_embeddings"
            embedding_ids.update(out_ids)
    else:
        if config.prior.train:
            trainable["transformer"] = frozen.pop("transformer")
            group_schedules["transformer"] = _group_schedule(
                config, config.prior.learning_rate, total_steps,
                config.prior, steps_per_epoch)
            labels["transformer"] = jax.tree.map(
                lambda _: "transformer", trainable["transformer"])
        if config.text_encoder.train:
            trainable["text_encoder"] = frozen.pop("text_encoder")
            group_schedules["text_encoder"] = _group_schedule(
                config, config.text_encoder.learning_rate, total_steps,
                config.text_encoder, steps_per_epoch)
            labels["text_encoder"] = jax.tree.map(
                lambda _: "text_encoder", trainable["text_encoder"])

    if method == TrainingMethod.LORA and config.lora_model_name:
        # continue training from an existing kohya LoRA file
        # (reference: LoRALoaderMixin.py:14-90)
        from onetrainer_tpu.peft.lora import apply_lora_checkpoint
        peft_cfg = apply_lora_checkpoint(
            config.lora_model_name, trainable,
            {"transformer_lora": "lora_transformer", "te_lora": "lora_te1"}, peft_cfg)

    # quantized frozen base (setup/quantize.py; reference quantizes the
    # same parts post-load: modules/util/quantization_util.py:72-160)
    from onetrainer_tpu.setup.quantize import quantize_frozen_parts
    quantize_frozen_parts(frozen, config.weight_dtypes(),
                          {"transformer": "prior", "text_encoder": "text_encoder"},
                          model=model)

    tx = create_group_optimizer(
        group_schedules, config.optimizer.optimizer, config.optimizer, labels)
    if config.clip_grad_norm is not None and config.clip_grad_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(config.clip_grad_norm), tx)
    if config.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=config.gradient_accumulation_steps)

    step_cfg = SDStepConfig.from_train_config(
        config, "flow", config.text_encoder_layer_skip or 0)
    overrides = {
        "vae_scaling_factor": model.vae_config.scaling_factor,
        "train_text_encoder": (config.text_encoder.train
                               or method == TrainingMethod.EMBEDDING),
    }
    if "output_embeddings" in trainable:
        overrides.update(
            output_embedding_base_id=model.te_config.vocab_size + n_input,
            output_embedding_spans=out_spans,
            output_embedding_stds=out_stds)
    step_cfg = SDStepConfig(**{**step_cfg.__dict__, **overrides})

    train_step = make_sana_train_step(model, step_cfg, tx, peft_cfg)
    state = create_train_state(trainable, tx,
                               ema_enabled=config.ema != EMAMode.OFF)

    return SanaSetup(
        model=model, config=config, tokenizer=tokenizer, peft_cfg=peft_cfg,
        step_cfg=step_cfg, trainable=trainable, frozen=frozen, tx=tx,
        train_step=train_step, state=state, embedding_ids=embedding_ids,
        group_schedules=group_schedules)


def make_sana_encode_fns(setup: SanaSetup):
    """DC-AE latent caching (deterministic encoder) + Gemma2 hidden-state
    caching with attention masks
    (reference: SanaBaseDataLoader preparation modules)."""
    model = setup.model
    vae_params = model.vae_params

    # params are jit arguments, not closure captures (captured arrays
    # inline into the HLO as literals — see make_sdxl_encode_fns)
    @jax.jit
    def _vae_encode(vae_params, pixels):
        return model.vae.apply({"params": vae_params}, pixels,
                               method=model.vae.encode)

    def encode_images(images: np.ndarray) -> dict:
        latent = _vae_encode(vae_params, jnp.asarray(images))
        return {"latent_image": np.asarray(latent, np.float32)}

    cache_te = not setup.step_cfg.train_text_encoder and model.te_params is not None

    if cache_te:
        te_params = model.te_params

        @jax.jit
        def _te_encode(te_params, tokens, mask):
            out = model.text_encoder.apply(
                {"params": te_params}, tokens[None], mask[None])
            hidden = encode_gemma_text(
                out, setup.step_cfg.text_encoder_layer_skip)
            if setup.step_cfg.text_encoder_layer_skip > 0:
                hidden = apply_gemma_final_norm(te_params, hidden)
            return hidden[0]

        def encode_text(prompt: str) -> dict:
            tokens = setup.tokenizer(prompt)
            mask = setup.tokenizer.mask(tokens)
            hidden = _te_encode(te_params, jnp.asarray(tokens),
                                jnp.asarray(mask))
            return {"tokens": tokens, "tokens_mask": mask,
                    "text_encoder_hidden_state": np.asarray(hidden, np.float32)}
    else:
        def encode_text(prompt: str) -> dict:
            tokens = setup.tokenizer(prompt)
            return {"tokens": tokens, "tokens_mask": setup.tokenizer.mask(tokens)}

    return encode_images, encode_text
