"""SD3 model setup (reference: modules/modelSetup/StableDiffusion3LoRASetup.py,
BaseStableDiffusion3Setup.py). The MMDiT is the reference's 'prior' part."""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
import optax

from onetrainer_tpu.config.train_config import TrainConfig
from onetrainer_tpu.models.clip import encode_clip_text
from onetrainer_tpu.models.sd3 import sd3_text_context
from onetrainer_tpu.models.sd3_model import StableDiffusion3Model
from onetrainer_tpu.peft.lora import PeftConfig, apply_peft, init_peft_params
from onetrainer_tpu.setup.sd_setup import _group_schedule, _init_embedding_vectors
from onetrainer_tpu.setup.tokenizer import SDTokenizer, T5TokenizerWrapper
from onetrainer_tpu.train.optimizers import create_group_optimizer
from onetrainer_tpu.train.sd3_train_step import make_sd3_train_step
from onetrainer_tpu.train.sd_train_step import SDStepConfig
from onetrainer_tpu.train.train_state import create_train_state
from onetrainer_tpu.util.enums import EMAMode, TrainingMethod


@dataclass
class SD3Setup:
    model: StableDiffusion3Model
    config: TrainConfig
    tokenizer: SDTokenizer
    tokenizer_2: SDTokenizer
    tokenizer_3: T5TokenizerWrapper
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
        frozen = self.frozen
        method = self.config.training_method
        if method == TrainingMethod.LORA:
            transformer = apply_peft(frozen["transformer"],
                                     params["transformer_lora"], self.peft_cfg) \
                if "transformer_lora" in params else frozen["transformer"]
            te = frozen.get("text_encoder")
            te2 = frozen.get("text_encoder_2")
            if "te_lora" in params and te is not None:
                te = apply_peft(te, params["te_lora"], self.peft_cfg)
            if "te2_lora" in params and te2 is not None:
                te2 = apply_peft(te2, params["te2_lora"], self.peft_cfg)
            return (transformer, te, te2, frozen.get("text_encoder_3"),
                    (params.get("embeddings"), params.get("embeddings_2"),
                     params.get("embeddings_3")))
        extras = []
        if method == TrainingMethod.EMBEDDING:
            import jax.numpy as jnp
            for suffix in ("", "_2", "_3"):
                extra = params.get(f"embeddings{suffix}")
                inputs = frozen.get(f"embedding_inputs{suffix}")
                if inputs is not None:
                    rows = ([extra] if extra is not None else []) + [inputs]
                    extra = jnp.concatenate(rows, axis=0)
                extras.append(extra)
        else:
            extras = [params.get("embeddings"), params.get("embeddings_2"),
                      params.get("embeddings_3")]
        return (params.get("transformer", frozen.get("transformer")),
                params.get("text_encoder", frozen.get("text_encoder")),
                params.get("text_encoder_2", frozen.get("text_encoder_2")),
                params.get("text_encoder_3", frozen.get("text_encoder_3")),
                tuple(extras))


def create_sd3_setup(model: StableDiffusion3Model, config: TrainConfig,
                     total_steps: int = 10_000,
                     steps_per_epoch: int = 100) -> SD3Setup:
    method = config.training_method

    def wrap_clip(tok, cfg):
        if isinstance(tok, SDTokenizer):
            return tok
        return SDTokenizer(tok, max_length=cfg.max_position_embeddings,
                           vocab_size=cfg.vocab_size,
                           bos=max(cfg.eos_token_id - 1, 0), eos=cfg.eos_token_id)

    tokenizer = wrap_clip(model.tokenizer, model.te_config)
    tokenizer_2 = wrap_clip(model.tokenizer_2, model.te2_config)
    tokenizer_3 = model.tokenizer_3 if isinstance(model.tokenizer_3, T5TokenizerWrapper) \
        else T5TokenizerWrapper(model.tokenizer_3,
                                vocab_size=model.te3_config.vocab_size)
    model.tokenizer, model.tokenizer_2, model.tokenizer_3 = \
        tokenizer, tokenizer_2, tokenizer_3

    trainable: dict = {}
    frozen: dict = {"transformer": model.transformer_params,
                    "text_encoder": model.te_params,
                    "text_encoder_2": model.te2_params,
                    "text_encoder_3": model.te3_params}
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
        if config.text_encoder.train:
            trainable["te_lora"] = init_peft_params(
                jax.random.PRNGKey(1), model.te_params, peft_cfg)
            group_schedules["te_lora"] = _group_schedule(
                config, config.text_encoder.learning_rate, total_steps,
                config.text_encoder, steps_per_epoch)
            labels["te_lora"] = jax.tree.map(lambda _: "te_lora",
                                             trainable["te_lora"])
        if config.text_encoder_2.train:
            trainable["te2_lora"] = init_peft_params(
                jax.random.PRNGKey(2), model.te2_params, peft_cfg)
            group_schedules["te2_lora"] = _group_schedule(
                config, config.text_encoder_2.learning_rate, total_steps,
                config.text_encoder_2, steps_per_epoch)
            labels["te2_lora"] = jax.tree.map(lambda _: "te2_lora",
                                              trainable["te2_lora"])
    elif method != TrainingMethod.EMBEDDING:
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

    n_input = 0
    out_spans: tuple = ()
    out_stds: tuple = ()
    out_stds_2: tuple = ()
    out_stds_3: tuple = ()
    if method == TrainingMethod.EMBEDDING:
        # per-TE vector tables (reference: StableDiffusion3ModelEmbedding
        # holds text_encoder_{1,2,3}_vector)
        from onetrainer_tpu.setup.sd_setup import _init_output_embeddings
        lr = config.embedding_learning_rate or config.learning_rate
        tes = [(model.text_encoder, model.te_params, tokenizer, ""),
               (model.text_encoder_2, model.te2_params, tokenizer_2, "_2"),
               (model.text_encoder_3, model.te3_params, tokenizer_3, "_3")]
        for te_module, te_params, tok, suffix in tes:
            vectors, ids = _init_embedding_vectors(model, te_params, tok, config)
            if vectors is not None:
                trainable[f"embeddings{suffix}"] = vectors
                group_schedules[f"embeddings{suffix}"] = _group_schedule(
                    config, lr, total_steps, steps_per_epoch=steps_per_epoch)
                labels[f"embeddings{suffix}"] = f"embeddings{suffix}"
                if suffix == "":
                    embedding_ids.update(ids)
                    n_input = int(vectors.shape[0])
        for te_module, te_params, tok, suffix in tes:
            out_in, out_vec, out_ids, spans, stds = _init_output_embeddings(
                te_module, te_params, tok, config, n_input)
            if out_vec is not None:
                trainable[f"output_embeddings{suffix}"] = out_vec
                frozen[f"embedding_inputs{suffix}"] = out_in
                group_schedules[f"output_embeddings{suffix}"] = \
                    _group_schedule(config, lr, total_steps,
                steps_per_epoch=steps_per_epoch)
                labels[f"output_embeddings{suffix}"] = \
                    f"output_embeddings{suffix}"
                if suffix == "":
                    embedding_ids.update(out_ids)
                    out_spans, out_stds = spans, stds
                elif suffix == "_2":
                    out_stds_2 = stds
                else:
                    out_stds_3 = stds

    if method == TrainingMethod.LORA and config.lora_model_name:
        # continue training from an existing kohya LoRA file
        # (reference: LoRALoaderMixin.py:14-90)
        from onetrainer_tpu.peft.lora import apply_lora_checkpoint
        peft_cfg = apply_lora_checkpoint(
            config.lora_model_name, trainable,
            {"transformer_lora": "lora_transformer", "te_lora": "lora_te1", "te2_lora": "lora_te2"}, peft_cfg)

    # quantized frozen base (setup/quantize.py; reference quantizes the
    # same parts post-load: modules/util/quantization_util.py:72-160)
    from onetrainer_tpu.setup.quantize import quantize_frozen_parts
    quantize_frozen_parts(frozen, config.weight_dtypes(),
                          {"transformer": "prior", "text_encoder": "text_encoder",
                           "text_encoder_2": "text_encoder_2",
                           "text_encoder_3": "text_encoder_3"},
                          model=model)

    tx = create_group_optimizer(
        group_schedules, config.optimizer.optimizer, config.optimizer, labels)
    if config.clip_grad_norm is not None and config.clip_grad_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(config.clip_grad_norm), tx)
    if config.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=config.gradient_accumulation_steps)

    step_cfg = SDStepConfig.from_train_config(config, "flow", 0)
    overrides = {
        "vae_scaling_factor": model.vae_config.scaling_factor,
        "vae_shift_factor": model.vae_config.shift_factor,
        "train_text_encoder": (config.train_text_encoder_or_embedding()
                               or config.train_text_encoder_2_or_embedding()
                               or method == TrainingMethod.EMBEDDING),
    }
    if "output_embeddings" in trainable:
        overrides.update(
            output_embedding_base_id=model.te_config.vocab_size + n_input,
            output_embedding_base_id_2=model.te2_config.vocab_size + n_input,
            output_embedding_base_id_3=model.te3_config.vocab_size + n_input,
            output_embedding_spans=out_spans,
            output_embedding_stds=out_stds,
            output_embedding_stds_2=out_stds_2,
            output_embedding_stds_3=out_stds_3)
    step_cfg = SDStepConfig(**{**step_cfg.__dict__, **overrides})

    train_step = make_sd3_train_step(model, step_cfg, tx, peft_cfg)
    state = create_train_state(trainable, tx, ema_enabled=config.ema != EMAMode.OFF)

    return SD3Setup(
        model=model, config=config, tokenizer=tokenizer, tokenizer_2=tokenizer_2,
        tokenizer_3=tokenizer_3, peft_cfg=peft_cfg, step_cfg=step_cfg,
        trainable=trainable, frozen=frozen, tx=tx, train_step=train_step,
        state=state, embedding_ids=embedding_ids,
        group_schedules=group_schedules)


def make_sd3_encode_fns(setup: SD3Setup):
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

    cache_te = not setup.step_cfg.train_text_encoder

    if cache_te:
        te, te2, te3 = model.te_params, model.te2_params, model.te3_params

        @jax.jit
        def _encode(te, te2, te3, t1, t2, t3):
            out_l = model.text_encoder.apply({"params": te}, t1[None])
            out_g = model.text_encoder_2.apply({"params": te2}, t2[None])
            t5 = model.text_encoder_3.apply(
                {"params": te3}, t3[None],
                layer_skip=setup.step_cfg.te3_layer_skip)
            context, pooled = sd3_text_context(
                encode_clip_text(out_l, setup.step_cfg.text_encoder_layer_skip),
                encode_clip_text(out_g, setup.step_cfg.te2_layer_skip),
                t5, out_l["pooled_output"], out_g["pooled_output"])
            return context[0], pooled[0]

        def encode_text(prompt: str) -> dict:
            t1 = setup.tokenizer(prompt)
            t2 = setup.tokenizer_2(prompt)
            t3 = setup.tokenizer_3(prompt)
            context, pooled = _encode(te, te2, te3, jnp.asarray(t1),
                                      jnp.asarray(t2), jnp.asarray(t3))
            return {"tokens": t1, "tokens_2": t2, "tokens_3": t3,
                    "sd3_context": np.asarray(context, np.float32),
                    "sd3_pooled": np.asarray(pooled, np.float32)}
    else:
        def encode_text(prompt: str) -> dict:
            return {"tokens": setup.tokenizer(prompt),
                    "tokens_2": setup.tokenizer_2(prompt),
                    "tokens_3": setup.tokenizer_3(prompt)}

    return encode_images, encode_text
