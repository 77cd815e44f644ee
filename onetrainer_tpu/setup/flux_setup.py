"""FLUX model setup (reference: modules/modelSetup/FluxLoRASetup.py,
FluxFineTuneSetup.py, BaseFluxSetup.py). The transformer is the reference's
'prior' model part; quantized frozen-base training (the reference's NF4
path) maps to fp8/int8 quantize_tree."""

from __future__ import annotations

from dataclasses import dataclass, field, replace

import jax
import jax.numpy as jnp
import numpy as np
import optax

from onetrainer_tpu.config.train_config import TrainConfig
from onetrainer_tpu.models.clip import encode_clip_text
from onetrainer_tpu.models.flux_model import FluxModel
from onetrainer_tpu.peft.lora import PeftConfig, apply_peft, init_peft_params
from onetrainer_tpu.setup.sd_setup import _group_schedule, _init_embedding_vectors
from onetrainer_tpu.setup.tokenizer import SDTokenizer, T5TokenizerWrapper
from onetrainer_tpu.train.flux_train_step import make_flux_train_step
from onetrainer_tpu.train.optimizers import create_group_optimizer
from onetrainer_tpu.train.sd_train_step import SDStepConfig
from onetrainer_tpu.train.train_state import create_train_state
from onetrainer_tpu.util.enums import EMAMode, TrainingMethod

# FLUX layer-filter presets (reference: FluxLoRASetup.PRESETS:12-16)
FLUX_LORA_PRESETS = {
    "attn-mlp": ("attn", "ff", "proj_mlp", "proj_out"),
    "attn-only": ("attn",),
    "full": (),
}


@dataclass
class FluxSetup:
    model: FluxModel
    config: TrainConfig
    tokenizer: SDTokenizer
    tokenizer_2: T5TokenizerWrapper
    peft_cfg: PeftConfig | None
    step_cfg: SDStepConfig
    trainable: dict
    frozen: dict
    tx: object
    train_step: object
    state: object = None
    embedding_ids: dict = field(default_factory=dict)
    group_schedules: dict = field(default_factory=dict)
    # reference: FluxEmbeddingSaver.py:29-35
    embedding_save_keys: dict = field(default_factory=lambda: {
        "embeddings": "clip_l", "embeddings_2": "t5",
        "output_embeddings_2": "t5_out"})

    def merged_inference_params(self, params=None):
        params = params if params is not None else self.state.params
        method = self.config.training_method
        frozen = self.frozen
        if method == TrainingMethod.LORA:
            transformer = apply_peft(frozen["transformer"],
                                     params["transformer_lora"], self.peft_cfg) \
                if "transformer_lora" in params else frozen["transformer"]
            te = frozen.get("text_encoder")
            if "te_lora" in params and te is not None:
                te = apply_peft(te, params["te_lora"], self.peft_cfg)
            return transformer, te, frozen.get("text_encoder_2"), \
                (params.get("embeddings"), params.get("embeddings_2"))
        if method == TrainingMethod.EMBEDDING:
            import jax.numpy as jnp
            extras = []
            for suffix in ("", "_2"):
                extra = params.get(f"embeddings{suffix}")
                inputs = frozen.get(f"embedding_inputs{suffix}")
                if inputs is not None:
                    rows = ([extra] if extra is not None else []) + [inputs]
                    extra = jnp.concatenate(rows, axis=0)
                extras.append(extra)
            return (frozen["transformer"], frozen["text_encoder"],
                    frozen["text_encoder_2"], tuple(extras))
        return (params.get("transformer", frozen.get("transformer")),
                params.get("text_encoder", frozen.get("text_encoder")),
                params.get("text_encoder_2", frozen.get("text_encoder_2")),
                (params.get("embeddings"), params.get("embeddings_2")))


def create_flux_setup(model: FluxModel, config: TrainConfig,
                      total_steps: int = 10_000,
                      steps_per_epoch: int = 100) -> FluxSetup:
    method = config.training_method

    tokenizer = model.tokenizer if isinstance(model.tokenizer, SDTokenizer) \
        else SDTokenizer(model.tokenizer,
                         max_length=model.te_config.max_position_embeddings,
                         vocab_size=model.te_config.vocab_size,
                         bos=max(model.te_config.eos_token_id - 1, 0),
                         eos=model.te_config.eos_token_id)
    tokenizer_2 = model.tokenizer_2 if isinstance(model.tokenizer_2, T5TokenizerWrapper) \
        else T5TokenizerWrapper(model.tokenizer_2,
                                vocab_size=model.te2_config.vocab_size)
    model.tokenizer, model.tokenizer_2 = tokenizer, tokenizer_2

    trainable: dict = {}
    frozen: dict = {"transformer": model.transformer_params,
                    "text_encoder": model.te_params,
                    "text_encoder_2": model.te2_params}
    group_schedules: dict = {}
    labels: dict = {}
    embedding_ids: dict = {}
    peft_cfg = None

    if method == TrainingMethod.LORA:
        peft_cfg = PeftConfig.from_train_config(config)
        if config.lora_layer_preset in FLUX_LORA_PRESETS and not peft_cfg.layer_filter:
            peft_cfg = replace(
                peft_cfg, layer_filter=FLUX_LORA_PRESETS[config.lora_layer_preset])
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
    elif method == TrainingMethod.EMBEDDING:
        # per-TE vector tables (reference: FluxModelEmbedding holds
        # text_encoder_1_vector (clip) + text_encoder_2_vector (t5));
        # output embeddings apply to the T5 output only
        # (reference: FluxModel.encode_text:278)
        from onetrainer_tpu.setup.sd_setup import _init_output_embeddings
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
        # keep tokenizer placeholder registries aligned across TEs
        # only TE2's (T5) output is patched; TE1 just registers
        # placeholders + frozen input rows
        out_in1, out_vec1, out_ids, out_spans, out_stds = \
            _init_output_embeddings(model.text_encoder, model.te_params,
                                    tokenizer, config, n_input,
                                    compute_output=False)
        out_in2, out_vec2, _, _, out_stds_2 = \
            _init_output_embeddings(model.text_encoder_2, model.te2_params,
                                    tokenizer_2, config, n_input)
        if out_vec2 is not None:
            trainable["output_embeddings_2"] = out_vec2
            frozen["embedding_inputs"] = out_in1
            frozen["embedding_inputs_2"] = out_in2
            group_schedules["output_embeddings_2"] = \
                _group_schedule(config, lr, total_steps,
                steps_per_epoch=steps_per_epoch)
            labels["output_embeddings_2"] = "output_embeddings_2"
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
                          {"transformer": "prior", "text_encoder": "text_encoder",
                           "text_encoder_2": "text_encoder_2"},
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
                               or method == TrainingMethod.EMBEDDING),
    }
    if "output_embeddings_2" in trainable:
        overrides.update(
            output_embedding_base_id_2=model.te2_config.vocab_size + n_input,
            output_embedding_spans=out_spans,
            output_embedding_stds_2=out_stds_2)
    step_cfg = SDStepConfig(**{**step_cfg.__dict__, **overrides})

    train_step = make_flux_train_step(
        model, step_cfg, tx, peft_cfg,
        guidance_scale=config.prior.guidance_scale)
    state = create_train_state(trainable, tx, ema_enabled=config.ema != EMAMode.OFF)

    return FluxSetup(
        model=model, config=config, tokenizer=tokenizer, tokenizer_2=tokenizer_2,
        peft_cfg=peft_cfg, step_cfg=step_cfg, trainable=trainable, frozen=frozen,
        tx=tx, train_step=train_step, state=state, embedding_ids=embedding_ids,
        group_schedules=group_schedules)


def make_flux_encode_fns(setup: FluxSetup):
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
        te_params, te2_params = model.te_params, model.te2_params

        @jax.jit
        def _te_encode(te_params, te2_params, tokens, tokens_2):
            out_clip = model.text_encoder.apply({"params": te_params}, tokens[None])
            t5 = model.text_encoder_2.apply(
                {"params": te2_params}, tokens_2[None],
                layer_skip=setup.step_cfg.te2_layer_skip)
            return out_clip["pooled_output"][0], t5[0]

        def encode_text(prompt: str) -> dict:
            tokens = setup.tokenizer(prompt)
            tokens_2 = setup.tokenizer_2(prompt)
            pooled, t5 = _te_encode(te_params, te2_params,
                                    jnp.asarray(tokens), jnp.asarray(tokens_2))
            return {
                "tokens": tokens, "tokens_2": tokens_2,
                "clip_pooled_state": np.asarray(pooled, np.float32),
                "t5_hidden_state": np.asarray(t5, np.float32),
            }
    else:
        def encode_text(prompt: str) -> dict:
            return {"tokens": setup.tokenizer(prompt),
                    "tokens_2": setup.tokenizer_2(prompt)}

    return encode_images, encode_text
