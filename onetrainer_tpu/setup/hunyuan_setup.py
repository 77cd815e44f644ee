"""HunyuanVideo setup: trainable/frozen trees, optimizer, encode fns,
jitted train step (reference: modules/modelSetup/HunyuanVideoLoRASetup.py,
BaseHunyuanVideoSetup.py)."""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
import optax

from onetrainer_tpu.config.train_config import TrainConfig
from onetrainer_tpu.models.hunyuan_video import PROMPT_TEMPLATE_CROP_START
from onetrainer_tpu.models.hunyuan_video_model import HunyuanVideoModel
from onetrainer_tpu.models.llama import encode_llama_text
from onetrainer_tpu.peft.lora import PeftConfig, apply_peft, init_peft_params
from onetrainer_tpu.setup.sd_setup import _group_schedule
from onetrainer_tpu.setup.tokenizer import LlamaTokenizerWrapper, SDTokenizer
from onetrainer_tpu.train.hunyuan_train_step import make_hunyuan_train_step
from onetrainer_tpu.train.optimizers import create_group_optimizer
from onetrainer_tpu.train.sd_train_step import SDStepConfig
from onetrainer_tpu.train.train_state import create_train_state
from onetrainer_tpu.util.enums import EMAMode, TrainingMethod


@dataclass
class HunyuanSetup:
    model: HunyuanVideoModel
    config: TrainConfig
    tokenizer: LlamaTokenizerWrapper
    tokenizer_2: SDTokenizer
    peft_cfg: PeftConfig | None
    step_cfg: SDStepConfig
    trainable: dict
    frozen: dict
    tx: object
    train_step: object
    state: object = None
    embedding_ids: dict = field(default_factory=dict)
    group_schedules: dict = field(default_factory=dict)
    # artifact key names (reference: HunyuanVideoEmbeddingSaver.py:27-35)
    embedding_save_keys: dict = field(default_factory=lambda: {
        "embeddings": "llama", "embeddings_2": "clip_l",
        "output_embeddings": "llama_out"})

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
            return transformer, te, self.frozen.get("text_encoder_2"), \
                params.get("embeddings")
        return (params.get("transformer", self.frozen.get("transformer")),
                params.get("text_encoder", self.frozen.get("text_encoder")),
                self.frozen.get("text_encoder_2"),
                params.get("embeddings"))


def create_hunyuan_setup(
        model: HunyuanVideoModel,
        config: TrainConfig,
        total_steps: int = 10_000,
        steps_per_epoch: int = 100,
) -> HunyuanSetup:
    method = config.training_method

    tokenizer = model.tokenizer if isinstance(model.tokenizer, LlamaTokenizerWrapper) \
        else LlamaTokenizerWrapper(model.tokenizer,
                                   vocab_size=model.te_config.vocab_size)
    model.tokenizer = tokenizer
    if isinstance(model.tokenizer_2, SDTokenizer):
        tokenizer_2 = model.tokenizer_2
    else:
        tc = model.te2_config
        tokenizer_2 = SDTokenizer(
            model.tokenizer_2, max_length=tc.max_position_embeddings,
            vocab_size=tc.vocab_size, bos=max(tc.eos_token_id - 1, 0),
            eos=tc.eos_token_id)
        model.tokenizer_2 = tokenizer_2

    trainable: dict = {}
    frozen: dict = {"transformer": model.transformer_params,
                    "text_encoder": model.te_params,
                    "text_encoder_2": model.te2_params}
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
        # llama + clip_l textual inversion; output embeddings patch the
        # llama context (reference: HunyuanVideoEmbeddingSetup.py,
        # HunyuanVideoEmbeddingSaver.py llama/clip_l/llama_out keys;
        # HunyuanVideoModelEmbedding: is_output_embedding on TE1 only)
        from onetrainer_tpu.setup.sd_setup import (
            _init_embedding_vectors, _init_output_embeddings,
        )
        lr = config.embedding_learning_rate or config.learning_rate
        vectors, embedding_ids = _init_embedding_vectors(
            model, model.te_params, tokenizer, config)
        vectors2, _ = _init_embedding_vectors(
            model, model.te2_params, tokenizer_2, config)
        if vectors is not None:
            trainable["embeddings"] = vectors
            trainable["embeddings_2"] = vectors2
            for name in ("embeddings", "embeddings_2"):
                group_schedules[name] = _group_schedule(config, lr, total_steps,
                steps_per_epoch=steps_per_epoch)
                labels[name] = name
        n_input = int(vectors.shape[0]) if vectors is not None else 0

        def _llama_context(tokens):
            out = model.text_encoder.apply(
                {"params": model.te_params}, tokens)
            return encode_llama_text(out, 0, default_layer=-3,
                                     crop_start=PROMPT_TEMPLATE_CROP_START)

        out_in, out_vec, out_ids, out_spans, out_stds = \
            _init_output_embeddings(model.text_encoder, model.te_params,
                                    tokenizer, config, n_input,
                                    encode_fn=_llama_context, start=0)
        # keep the clip tokenizer's placeholder registry aligned (no
        # output patch on TE2 -> skip its forward)
        out_in2, _, _, _, _ = _init_output_embeddings(
            model.text_encoder_2, model.te2_params, tokenizer_2, config,
            n_input, compute_output=False)
        if out_vec is not None:
            trainable["output_embeddings"] = out_vec
            frozen["embedding_inputs"] = out_in
            frozen["embedding_inputs_2"] = out_in2
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
        from onetrainer_tpu.peft.lora import apply_lora_checkpoint
        peft_cfg = apply_lora_checkpoint(
            config.lora_model_name, trainable,
            {"transformer_lora": "lora_transformer", "te_lora": "lora_te1"},
            peft_cfg)

    # quantized frozen base (setup/quantize.py; reference quantizes the
    # same parts post-load: modules/util/quantization_util.py:72-160)
    from onetrainer_tpu.setup.quantize import quantize_frozen_parts
    quantize_frozen_parts(frozen, config.weight_dtypes(),
                          {"transformer": "prior", "text_encoder": "text_encoder",
                           "text_encoder_2": "text_encoder_2"},
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

    train_step = make_hunyuan_train_step(
        model, step_cfg, tx, peft_cfg,
        guidance_scale=config.prior.guidance_scale or 1.0)
    state = create_train_state(trainable, tx,
                               ema_enabled=config.ema != EMAMode.OFF)

    return HunyuanSetup(
        model=model, config=config, tokenizer=tokenizer,
        tokenizer_2=tokenizer_2, peft_cfg=peft_cfg, step_cfg=step_cfg,
        trainable=trainable, frozen=frozen, tx=tx, train_step=train_step,
        state=state, embedding_ids=embedding_ids,
        group_schedules=group_schedules)


def make_hunyuan_encode_fns(setup: HunyuanSetup):
    """Video-VAE latent caching + Llama/CLIP text caching
    (reference: HunyuanVideoBaseDataLoader preparation modules)."""
    model = setup.model
    vae_params = model.vae_params

    # params are jit arguments, not closure captures (captured arrays
    # inline into the HLO as literals — see make_sdxl_encode_fns)
    @jax.jit
    def _vae_encode(vae_params, pixels):
        mean, logvar = model.vae.apply({"params": vae_params}, pixels,
                                       method=model.vae.encode)
        return mean, logvar

    def encode_images(images: np.ndarray) -> dict:
        x = jnp.asarray(images)
        if x.ndim == 4:            # image rows -> 1-frame clips
            x = x[:, None]
        mean, logvar = _vae_encode(vae_params, x)
        return {"latent_image": np.asarray(mean, np.float32),
                "latent_logvar": np.asarray(logvar, np.float32)}

    cache_te = not setup.step_cfg.train_text_encoder and model.te_params is not None

    if cache_te:
        te_params = model.te_params
        te2_params = model.te2_params

        @jax.jit
        def _te_encode(te_params, te2_params, tokens, mask, tokens2):
            out = model.text_encoder.apply(
                {"params": te_params}, tokens[None], mask[None])
            states = encode_llama_text(
                out, setup.step_cfg.text_encoder_layer_skip,
                default_layer=-3, crop_start=PROMPT_TEMPLATE_CROP_START)
            out2 = model.text_encoder_2.apply(
                {"params": te2_params}, tokens2[None])
            return states[0], out2["pooled_output"][0]

        def encode_text(prompt: str) -> dict:
            tokens = setup.tokenizer(prompt)
            mask = setup.tokenizer.mask(tokens)
            tokens2 = setup.tokenizer_2(prompt)
            states, pooled = _te_encode(
                te_params, te2_params,
                jnp.asarray(tokens), jnp.asarray(mask), jnp.asarray(tokens2))
            return {
                "tokens_1": tokens, "tokens_mask_1": mask[PROMPT_TEMPLATE_CROP_START:],
                "tokens_2": tokens2,
                "text_encoder_1_hidden_state": np.asarray(states, np.float32),
                "text_encoder_2_pooled_state": np.asarray(pooled, np.float32),
            }
    else:
        def encode_text(prompt: str) -> dict:
            tokens = setup.tokenizer(prompt)
            return {"tokens_1": tokens,
                    "tokens_mask_1": setup.tokenizer.mask(tokens),
                    "tokens_2": setup.tokenizer_2(prompt)}

    return encode_images, encode_text
