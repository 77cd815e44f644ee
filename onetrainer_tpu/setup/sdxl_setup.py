"""SDXL model setup (reference: modules/modelSetup/StableDiffusionXLLoRASetup.py,
StableDiffusionXLFineTuneSetup.py, BaseStableDiffusionXLSetup.py)."""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
import optax

from onetrainer_tpu.config.train_config import TrainConfig
from onetrainer_tpu.models.clip import encode_clip_text
from onetrainer_tpu.models.sdxl import StableDiffusionXLModel
from onetrainer_tpu.peft.lora import PeftConfig, apply_peft, init_peft_params
from onetrainer_tpu.setup.sd_setup import _group_schedule, _init_embedding_vectors
from onetrainer_tpu.setup.tokenizer import SDTokenizer
from onetrainer_tpu.train.optimizers import create_group_optimizer
from onetrainer_tpu.train.sd_train_step import SDStepConfig
from onetrainer_tpu.train.sdxl_train_step import make_sdxl_train_step
from onetrainer_tpu.train.train_state import create_train_state
from onetrainer_tpu.util.enums import EMAMode, TrainingMethod


@dataclass
class SDXLSetup:
    model: StableDiffusionXLModel
    config: TrainConfig
    tokenizer: SDTokenizer
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

    def merged_inference_params(self, params=None):
        params = params if params is not None else self.state.params
        method = self.config.training_method
        frozen = self.frozen
        if method == TrainingMethod.LORA:
            unet = apply_peft(frozen["unet"], params["unet_lora"], self.peft_cfg) \
                if "unet_lora" in params else frozen["unet"]
            te = frozen.get("text_encoder")
            te2 = frozen.get("text_encoder_2")
            if "te_lora" in params and te is not None:
                te = apply_peft(te, params["te_lora"], self.peft_cfg)
            if "te2_lora" in params and te2 is not None:
                te2 = apply_peft(te2, params["te2_lora"], self.peft_cfg)
            return unet, te, te2, (params.get("embeddings"),
                                   params.get("embeddings_2"))
        if method == TrainingMethod.EMBEDDING:
            import jax.numpy as jnp
            extra_1 = params.get("embeddings")
            extra_2 = params.get("embeddings_2")
            if "embedding_inputs" in frozen:
                rows_1 = ([extra_1] if extra_1 is not None else []) + \
                    [frozen["embedding_inputs"]]
                rows_2 = ([extra_2] if extra_2 is not None else []) + \
                    [frozen["embedding_inputs_2"]]
                extra_1 = jnp.concatenate(rows_1, axis=0)
                extra_2 = jnp.concatenate(rows_2, axis=0)
            return (frozen["unet"], frozen["text_encoder"],
                    frozen["text_encoder_2"], (extra_1, extra_2))
        return (params.get("unet", frozen.get("unet")),
                params.get("text_encoder", frozen.get("text_encoder")),
                params.get("text_encoder_2", frozen.get("text_encoder_2")),
                (params.get("embeddings"), params.get("embeddings_2")))


def create_sdxl_setup(model: StableDiffusionXLModel, config: TrainConfig,
                      total_steps: int = 10_000,
                      steps_per_epoch: int = 100) -> SDXLSetup:
    method = config.training_method

    if config.rescale_noise_scheduler_to_zero_terminal_snr:
        model.rescale_noise_scheduler_to_zero_terminal_snr()
        model.force_v_prediction()
    if config.force_v_prediction:
        model.force_v_prediction()
    if config.force_epsilon_prediction:
        model.force_epsilon_prediction()

    def wrap_tokenizer(tok, cfg):
        if isinstance(tok, SDTokenizer):
            return tok
        return SDTokenizer(tok, max_length=cfg.max_position_embeddings,
                           vocab_size=cfg.vocab_size,
                           bos=max(cfg.eos_token_id - 1, 0), eos=cfg.eos_token_id)

    tokenizer = wrap_tokenizer(model.tokenizer, model.te_config)
    tokenizer_2 = wrap_tokenizer(model.tokenizer_2, model.te2_config)
    model.tokenizer, model.tokenizer_2 = tokenizer, tokenizer_2

    trainable: dict = {}
    frozen: dict = {"unet": model.unet_params,
                    "text_encoder": model.te_params,
                    "text_encoder_2": model.te2_params}
    group_schedules: dict = {}
    labels: dict = {}
    embedding_ids: dict = {}
    peft_cfg = None

    if method == TrainingMethod.LORA:
        peft_cfg = PeftConfig.from_train_config(config)
        if config.unet.train:
            trainable["unet_lora"] = init_peft_params(
                jax.random.PRNGKey(0), model.unet_params, peft_cfg)
            group_schedules["unet_lora"] = _group_schedule(
                config, config.unet.learning_rate, total_steps, config.unet, steps_per_epoch)
            labels["unet_lora"] = jax.tree.map(lambda _: "unet_lora",
                                               trainable["unet_lora"])
        if config.text_encoder.train:
            trainable["te_lora"] = init_peft_params(
                jax.random.PRNGKey(1), model.te_params, peft_cfg)
            group_schedules["te_lora"] = _group_schedule(
                config, config.text_encoder.learning_rate, total_steps, config.text_encoder, steps_per_epoch)
            labels["te_lora"] = jax.tree.map(lambda _: "te_lora", trainable["te_lora"])
        if config.text_encoder_2.train:
            trainable["te2_lora"] = init_peft_params(
                jax.random.PRNGKey(2), model.te2_params, peft_cfg)
            group_schedules["te2_lora"] = _group_schedule(
                config, config.text_encoder_2.learning_rate, total_steps, config.text_encoder_2, steps_per_epoch)
            labels["te2_lora"] = jax.tree.map(lambda _: "te2_lora",
                                              trainable["te2_lora"])
    elif method == TrainingMethod.EMBEDDING:
        # per-TE vector tables (different hidden sizes; reference:
        # StableDiffusionXLModelEmbedding holds text_encoder_1_vector and
        # text_encoder_2_vector)
        vectors, embedding_ids = _init_embedding_vectors(
            model, model.te_params, tokenizer, config)
        vectors2, _ = _init_embedding_vectors(
            model, model.te2_params, tokenizer_2, config)
        lr = config.embedding_learning_rate or config.learning_rate
        if vectors is not None:
            trainable["embeddings"] = vectors
            trainable["embeddings_2"] = vectors2
            group_schedules["embeddings"] = _group_schedule(config, lr, total_steps,
                steps_per_epoch=steps_per_epoch)
            group_schedules["embeddings_2"] = _group_schedule(config, lr, total_steps,
                steps_per_epoch=steps_per_epoch)
            labels["embeddings"] = "embeddings"
            labels["embeddings_2"] = "embeddings_2"
        n_input = int(vectors.shape[0]) if vectors is not None else 0
        from onetrainer_tpu.setup.sd_setup import _init_output_embeddings
        out_in1, out_vec1, out_ids, out_spans, out_stds = \
            _init_output_embeddings(model.text_encoder, model.te_params,
                                    tokenizer, config, n_input)
        out_in2, out_vec2, _, _, out_stds_2 = \
            _init_output_embeddings(model.text_encoder_2, model.te2_params,
                                    tokenizer_2, config, n_input)
        if out_vec1 is not None:
            trainable["output_embeddings"] = out_vec1
            trainable["output_embeddings_2"] = out_vec2
            frozen["embedding_inputs"] = out_in1
            frozen["embedding_inputs_2"] = out_in2
            for name in ("output_embeddings", "output_embeddings_2"):
                group_schedules[name] = _group_schedule(config, lr, total_steps,
                steps_per_epoch=steps_per_epoch)
                labels[name] = name
            embedding_ids.update(out_ids)
    else:
        if config.unet.train:
            trainable["unet"] = frozen.pop("unet")
            group_schedules["unet"] = _group_schedule(
                config, config.unet.learning_rate, total_steps, config.unet, steps_per_epoch)
            labels["unet"] = jax.tree.map(lambda _: "unet", trainable["unet"])
        if config.text_encoder.train:
            trainable["text_encoder"] = frozen.pop("text_encoder")
            group_schedules["text_encoder"] = _group_schedule(
                config, config.text_encoder.learning_rate, total_steps, config.text_encoder, steps_per_epoch)
            labels["text_encoder"] = jax.tree.map(
                lambda _: "text_encoder", trainable["text_encoder"])
        if config.text_encoder_2.train:
            trainable["text_encoder_2"] = frozen.pop("text_encoder_2")
            group_schedules["text_encoder_2"] = _group_schedule(
                config, config.text_encoder_2.learning_rate, total_steps, config.text_encoder_2, steps_per_epoch)
            labels["text_encoder_2"] = jax.tree.map(
                lambda _: "text_encoder_2", trainable["text_encoder_2"])

    if method == TrainingMethod.LORA and config.lora_model_name:
        # continue training from an existing kohya LoRA file
        # (reference: LoRALoaderMixin.py:14-90)
        from onetrainer_tpu.peft.lora import apply_lora_checkpoint
        peft_cfg = apply_lora_checkpoint(
            config.lora_model_name, trainable,
            {"unet_lora": "lora_unet", "te_lora": "lora_te1", "te2_lora": "lora_te2"}, peft_cfg)

    # quantized frozen base (setup/quantize.py; reference quantizes the
    # same parts post-load: modules/util/quantization_util.py:72-160)
    from onetrainer_tpu.setup.quantize import quantize_frozen_parts
    quantize_frozen_parts(frozen, config.weight_dtypes(),
                          {"unet": "unet", "text_encoder": "text_encoder",
                           "text_encoder_2": "text_encoder_2"},
                          model=model)

    tx = create_group_optimizer(
        group_schedules, config.optimizer.optimizer, config.optimizer, labels)
    if config.clip_grad_norm is not None and config.clip_grad_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(config.clip_grad_norm), tx)
    if config.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=config.gradient_accumulation_steps)

    step_cfg = SDStepConfig.from_train_config(
        config, model.prediction_type, model.text_encoder_layer_skip)
    overrides = {
        "vae_scaling_factor": model.vae_config.scaling_factor,
        "train_text_encoder": (config.train_text_encoder_or_embedding()
                               or config.train_text_encoder_2_or_embedding()
                               or method == TrainingMethod.EMBEDDING),
    }
    if "output_embeddings" in trainable:
        overrides["output_embedding_base_id"] = \
            model.te_config.vocab_size + n_input
        overrides["output_embedding_base_id_2"] = \
            model.te2_config.vocab_size + n_input
        overrides["output_embedding_spans"] = out_spans
        overrides["output_embedding_stds"] = out_stds
        overrides["output_embedding_stds_2"] = out_stds_2
    step_cfg = SDStepConfig(**{**step_cfg.__dict__, **overrides})

    train_step = make_sdxl_train_step(model, step_cfg, tx, peft_cfg)
    state = create_train_state(trainable, tx, ema_enabled=config.ema != EMAMode.OFF)

    return SDXLSetup(
        model=model, config=config, tokenizer=tokenizer, tokenizer_2=tokenizer_2,
        peft_cfg=peft_cfg, step_cfg=step_cfg, trainable=trainable, frozen=frozen,
        tx=tx, train_step=train_step, state=state, embedding_ids=embedding_ids,
        group_schedules=group_schedules)


def make_sdxl_encode_fns(setup: SDXLSetup):
    model = setup.model
    vae_params = model.vae_params

    # Encoder params are jit ARGUMENTS, never closure captures: a
    # closed-over array is inlined into the HLO as a literal, bloating the
    # serialized graph by the full encoder size (CLIP-G alone ~1.4 GB) —
    # pathologically slow constant-folding locally, and an oversized
    # request through a remote-compile service.
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
        te_params, te2_params = model.te_params, model.te2_params

        @jax.jit
        def _te_encode(te_params, te2_params, tokens, tokens_2):
            out1 = model.text_encoder.apply({"params": te_params}, tokens[None])
            out2 = model.text_encoder_2.apply({"params": te2_params}, tokens_2[None])
            h1 = encode_clip_text(out1, setup.step_cfg.text_encoder_layer_skip)[0]
            h2 = encode_clip_text(out2, setup.step_cfg.te2_layer_skip)[0]
            return h1, h2, out2["pooled_output"][0]

        def encode_text(prompt: str) -> dict:
            tokens = setup.tokenizer(prompt)
            tokens_2 = setup.tokenizer_2(prompt)
            h1, h2, pooled = _te_encode(te_params, te2_params,
                                        jnp.asarray(tokens),
                                        jnp.asarray(tokens_2))
            return {
                "tokens": tokens, "tokens_2": tokens_2,
                "text_encoder_hidden_state": np.asarray(h1, np.float32),
                "text_encoder_2_hidden_state": np.asarray(h2, np.float32),
                "text_encoder_2_pooled_state": np.asarray(pooled, np.float32),
            }
    else:
        def encode_text(prompt: str) -> dict:
            return {"tokens": setup.tokenizer(prompt),
                    "tokens_2": setup.tokenizer_2(prompt)}

    return encode_images, encode_text
