"""PixArt model setup (reference: modules/modelSetup/PixArtAlphaLoRASetup.py,
BasePixArtAlphaSetup.py). The DiT is the reference's 'prior' part; T5 is
text_encoder (reference uses the te1 slot for it)."""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
import optax

from onetrainer_tpu.config.train_config import TrainConfig
from onetrainer_tpu.models.pixart_model import PixArtAlphaModel
from onetrainer_tpu.peft.lora import PeftConfig, apply_peft, init_peft_params
from onetrainer_tpu.setup.sd_setup import _group_schedule
from onetrainer_tpu.setup.tokenizer import T5TokenizerWrapper
from onetrainer_tpu.train.optimizers import create_group_optimizer
from onetrainer_tpu.train.pixart_train_step import make_pixart_train_step
from onetrainer_tpu.train.sd_train_step import SDStepConfig
from onetrainer_tpu.train.train_state import create_train_state
from onetrainer_tpu.util.enums import EMAMode, TrainingMethod


@dataclass
class PixArtSetup:
    model: PixArtAlphaModel
    config: TrainConfig
    tokenizer: T5TokenizerWrapper      # single T5 tokenizer
    tokenizer_2: T5TokenizerWrapper    # alias (loader passes tokens_2)
    peft_cfg: PeftConfig | None
    step_cfg: SDStepConfig
    trainable: dict
    frozen: dict
    tx: object
    train_step: object
    state: object = None
    embedding_ids: dict = field(default_factory=dict)
    group_schedules: dict = field(default_factory=dict)
    # reference: PixArtAlphaEmbeddingSaver.py:29-31
    embedding_save_keys: dict = field(default_factory=lambda: {
        "embeddings": "t5", "output_embeddings": "t5_out"})

    def merged_inference_params(self, params=None):
        params = params if params is not None else self.state.params
        frozen = self.frozen
        if self.config.training_method == TrainingMethod.LORA:
            transformer = apply_peft(frozen["transformer"],
                                     params["transformer_lora"], self.peft_cfg) \
                if "transformer_lora" in params else frozen["transformer"]
            return transformer, frozen.get("text_encoder"), params.get("embeddings")
        if self.config.training_method == TrainingMethod.EMBEDDING:
            import jax.numpy as jnp
            extra = params.get("embeddings")
            inputs = frozen.get("embedding_inputs")
            if inputs is not None:
                rows = ([extra] if extra is not None else []) + [inputs]
                extra = jnp.concatenate(rows, axis=0)
            return frozen["transformer"], frozen["text_encoder"], extra
        return (params.get("transformer", frozen.get("transformer")),
                params.get("text_encoder", frozen.get("text_encoder")),
                params.get("embeddings"))


def create_pixart_setup(model: PixArtAlphaModel, config: TrainConfig,
                        total_steps: int = 10_000,
                        steps_per_epoch: int = 100) -> PixArtSetup:
    method = config.training_method

    tokenizer = model.tokenizer if isinstance(model.tokenizer, T5TokenizerWrapper) \
        else T5TokenizerWrapper(model.tokenizer,
                                max_length=120,
                                vocab_size=model.te_config.vocab_size)
    model.tokenizer = tokenizer

    trainable: dict = {}
    frozen: dict = {"transformer": model.transformer_params,
                    "text_encoder": model.te_params}
    group_schedules: dict = {}
    labels: dict = {}
    embedding_ids: dict = {}
    peft_cfg = None

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
    elif method == TrainingMethod.EMBEDDING:
        # T5 textual inversion (reference: PixArtAlphaModelEmbedding,
        # PixArtAlphaEmbeddingSaver.py:29-31 t5/t5_out keys)
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

    if method == TrainingMethod.LORA and config.lora_model_name:
        # continue training from an existing kohya LoRA file
        # (reference: LoRALoaderMixin.py:14-90)
        from onetrainer_tpu.peft.lora import apply_lora_checkpoint
        peft_cfg = apply_lora_checkpoint(
            config.lora_model_name, trainable,
            {"transformer_lora": "lora_transformer"}, peft_cfg)

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

    step_cfg = SDStepConfig.from_train_config(config, "epsilon", 0)
    overrides = {
        "vae_scaling_factor": model.vae_config.scaling_factor,
        "train_text_encoder": method == TrainingMethod.EMBEDDING,
    }
    if "output_embeddings" in trainable:
        overrides.update(
            output_embedding_base_id=model.te_config.vocab_size + n_input,
            output_embedding_spans=out_spans,
            output_embedding_stds=out_stds)
    step_cfg = SDStepConfig(**{**step_cfg.__dict__, **overrides})

    train_step = make_pixart_train_step(model, step_cfg, tx, peft_cfg)
    state = create_train_state(trainable, tx, ema_enabled=config.ema != EMAMode.OFF)

    return PixArtSetup(
        model=model, config=config, tokenizer=tokenizer, tokenizer_2=tokenizer,
        peft_cfg=peft_cfg, step_cfg=step_cfg, trainable=trainable, frozen=frozen,
        tx=tx, train_step=train_step, state=state,
        embedding_ids=embedding_ids, group_schedules=group_schedules)


def make_pixart_encode_fns(setup: PixArtSetup):
    model = setup.model
    vae_params = model.vae_params

    # params are jit arguments, not closure captures (captured arrays
    # inline into the HLO as literals — see make_sdxl_encode_fns)
    @jax.jit
    def _vae_encode(vae_params, pixels):
        return model.vae.apply({"params": vae_params}, pixels,
                               method=model.vae.encode)

    def encode_images(images: np.ndarray) -> dict:
        mean, logvar = _vae_encode(vae_params, jnp.asarray(images))
        return {"latent_image": np.asarray(mean, np.float32),
                "latent_logvar": np.asarray(logvar, np.float32)}

    te_params = model.te_params

    @jax.jit
    def _te_encode(te_params, tokens):
        return model.text_encoder.apply(
            {"params": te_params}, tokens[None],
            layer_skip=setup.step_cfg.text_encoder_layer_skip)[0]

    def encode_text(prompt: str) -> dict:
        tokens = setup.tokenizer(prompt)
        t5 = _te_encode(te_params, jnp.asarray(tokens))
        return {"tokens_2": tokens,
                "t5_hidden_state": np.asarray(t5, np.float32)}

    return encode_images, encode_text
