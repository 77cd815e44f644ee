"""SD-family model setup: bind (model, TrainConfig) into trainable/frozen
param trees, the optimizer, encode fns for the data loader, and the jitted
train step.

Functional replacement for the reference's setup classes
(reference: modules/modelSetup/StableDiffusionFineTuneSetup.py,
StableDiffusionLoRASetup.py, StableDiffusionEmbeddingSetup.py,
BaseStableDiffusionSetup.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
import optax

from onetrainer_tpu.config.train_config import TrainConfig, TrainModelPartConfig
from onetrainer_tpu.math.timesteps import TimestepConfig
from onetrainer_tpu.models.clip import encode_clip_text
from onetrainer_tpu.models.sd import StableDiffusionModel
from onetrainer_tpu.peft.lora import PeftConfig, apply_peft, init_peft_params
from onetrainer_tpu.setup.tokenizer import SDTokenizer
from onetrainer_tpu.train.lr_schedules import (
    make_schedule,
    resolve_warmup_steps,
    tabulate_custom_schedule,
)
from onetrainer_tpu.train.optimizers import create_group_optimizer
from onetrainer_tpu.train.sd_train_step import SDStepConfig, make_sd_train_step
from onetrainer_tpu.train.train_state import create_train_state
from onetrainer_tpu.util.enums import (
    EMAMode,
    LearningRateScaler,
    LearningRateScheduler,
    TrainingMethod,
)


@dataclass
class SDSetup:
    model: StableDiffusionModel
    config: TrainConfig
    tokenizer: SDTokenizer
    peft_cfg: PeftConfig | None
    step_cfg: SDStepConfig
    trainable: dict
    frozen: dict
    tx: object
    train_step: object
    state: object = None
    embedding_ids: dict = field(default_factory=dict)   # uuid -> (start, count)
    group_schedules: dict = field(default_factory=dict)

    def effective_vae_params(self):
        """Trained VAE params when fine-tuning the VAE, else the frozen
        ones (used by sampling/saving)."""
        if self.state is not None and "vae" in self.state.params:
            return self.state.params["vae"]
        return self.model.vae_params

    def merged_inference_params(self, params=None):
        """(unet, te, extra_embeddings) with adapters applied, for
        sampling/saving."""
        params = params if params is not None else self.state.params
        method = self.config.training_method
        if method == TrainingMethod.LORA:
            unet = apply_peft(self.frozen["unet"], params["unet_lora"], self.peft_cfg)
            te = self.frozen.get("text_encoder")
            if "te_lora" in params and te is not None:
                te = apply_peft(te, params["te_lora"], self.peft_cfg)
            return unet, te, params.get("embeddings")
        if method == TrainingMethod.EMBEDDING:
            extra = params.get("embeddings")
            if "embedding_inputs" in self.frozen:
                rows = [extra] if extra is not None else []
                rows.append(self.frozen["embedding_inputs"])
                extra = jnp.concatenate(rows, axis=0)
            return self.frozen["unet"], self.frozen["text_encoder"], extra
        unet = params.get("unet", self.frozen.get("unet"))
        te = params.get("text_encoder", self.frozen.get("text_encoder"))
        return unet, te, params.get("embeddings")


def _lr_scale(config: TrainConfig) -> float:
    """sqrt batch/accum LR scaling (reference:
    modules/util/NamedParameterGroup.py parameters_for_optimizer)."""
    scaler = config.learning_rate_scaler
    scale = 1.0
    if scaler in (LearningRateScaler.BATCH, LearningRateScaler.BOTH):
        scale *= config.batch_size ** 0.5
    if scaler in (LearningRateScaler.GRADIENT_ACCUMULATION, LearningRateScaler.BOTH):
        scale *= config.gradient_accumulation_steps ** 0.5
    return scale


def _stop_step(part: TrainModelPartConfig, steps_per_epoch: int) -> int | None:
    """stop_training_after in optimizer steps (reference: per-part
    stop_training_after timers, BaseModelSetup.stop_* re-evaluated after
    each step)."""
    from onetrainer_tpu.util.enums import TimeUnit
    if part.stop_training_after is None or \
            part.stop_training_after_unit == TimeUnit.NEVER:
        return None
    if part.stop_training_after_unit == TimeUnit.EPOCH:
        return int(part.stop_training_after * steps_per_epoch)
    if part.stop_training_after_unit == TimeUnit.STEP:
        return int(part.stop_training_after)
    return None


def _group_schedule(config: TrainConfig, group_lr: float | None, total_steps: int,
                    part: TrainModelPartConfig | None = None,
                    steps_per_epoch: int = 1):
    base_lr = (group_lr if group_lr is not None else config.learning_rate)
    base_lr *= _lr_scale(config)
    scheduler = config.learning_rate_scheduler
    # Schedule-free optimizers carry their own internal schedule; the
    # reference forces CONSTANT and skips warmup for them
    # (modules/util/create.py:1139-1141,1227-1228).
    if config.optimizer.optimizer.is_schedule_free():
        scheduler = LearningRateScheduler.CONSTANT
        warmup = 0
    else:
        warmup = resolve_warmup_steps(
            config.learning_rate_warmup_steps, total_steps,
            config.gradient_accumulation_steps)
    if scheduler == LearningRateScheduler.CUSTOM:
        schedule = tabulate_custom_schedule(
            config.custom_learning_rate_scheduler,
            config.scheduler_params,
            base_lr,
            config.learning_rate,
            total_steps,
            warmup,
            config.epochs,
            steps_per_epoch,
        )
    else:
        schedule = make_schedule(
            scheduler,
            total_steps,
            warmup,
            config.learning_rate_cycles,
            config.learning_rate_min_factor,
            base_lr,
        )
    stop = _stop_step(part, steps_per_epoch) if part is not None else None
    if stop is None:
        return schedule
    return lambda step: schedule(step) * (jnp.asarray(step, jnp.float32) < stop)


def _embedding_table(te_params: dict):
    """The TE input-embedding table: CLIP stores it at 'token_embedding',
    T5 at 'shared', Gemma2/Llama at 'embed_tokens' (models/gemma.py:155,
    models/llama.py:127)."""
    for key in ("token_embedding", "shared", "embed_tokens"):
        if key in te_params:
            return te_params[key]
    raise KeyError("no input embedding table in text-encoder params")


def _init_embedding_vectors(model, te_params, tokenizer: SDTokenizer,
                            config: TrainConfig) -> tuple[jnp.ndarray | None, dict]:
    """Create trained-embedding vectors from initial text token embeddings
    (reference: ModelSetupEmbeddingMixin.py:37-80)."""
    embedding_configs = [e for e in config.all_embedding_configs()
                         if not e.is_output_embedding]
    if not embedding_configs:
        return None, {}
    # CLIP tables live at 'token_embedding'; T5 at 'shared'
    table = np.asarray(_embedding_table(te_params))
    vectors = []
    ids_map = {}
    offset = 0
    for e in embedding_configs:
        count = e.token_count or 1
        init = _load_embedding_file(e.model_name, table.shape[-1])
        if init is not None:
            count = init.shape[0]
        else:
            init_ids = tokenizer._encode_words(e.initial_embedding_text)
            if not init_ids:
                init_ids = [0]
            init = np.stack([table[init_ids[i % len(init_ids)]]
                             for i in range(count)])
        vectors.append(init)
        tokenizer.register_placeholder(e.placeholder, count)
        ids_map[e.uuid] = (offset, count)
        offset += count
    return jnp.asarray(np.concatenate(vectors, 0), jnp.float32), ids_map


def _init_output_embeddings(te_module, te_params, tokenizer: SDTokenizer,
                            config: TrainConfig, input_count: int,
                            encode_fn=None, start: int | None = None,
                            compute_output: bool = True):
    """Output embeddings: trained vectors patched into the TE *output* at
    the placeholder positions; the input-level rows stay frozen at their
    initial-text values (reference: BaseModel._apply_output_embeddings
    :119-143, ModelSetupEmbeddingMixin:37-110 incl. norm preservation).

    Placeholders register after the input-embedding ones, so their token
    ids start at vocab_size + input_count. Returns (frozen input rows,
    trainable output vectors, ids map, spans, original stds)."""
    output_configs = [e for e in config.all_embedding_configs()
                      if e.is_output_embedding]
    if not output_configs:
        return None, None, {}, (), ()
    table = np.asarray(_embedding_table(te_params))
    input_rows, out_vectors = [], []
    ids_map: dict = {}
    spans: list[tuple[int, int]] = []
    stds: list[float] = []
    offset = 0
    for e in output_configs:
        count = e.token_count or 1
        init_ids = tokenizer._encode_words(e.initial_embedding_text) or [0]
        input_rows.append(np.stack(
            [table[init_ids[i % len(init_ids)]] for i in range(count)]))
        if compute_output:
            # output init: the TE's own output for the initial text.
            # Callers that only patch ONE TE's output (e.g. HiDream's
            # t5_out) pass compute_output=False for the others so the
            # frozen input rows + placeholder registration happen without
            # running (and compiling) a possibly-8B TE forward
            tokens = tokenizer(e.initial_embedding_text)
            if encode_fn is not None:
                out = encode_fn(jnp.asarray(tokens)[None])
            else:
                out = te_module.apply(
                    {"params": te_params}, jnp.asarray(tokens)[None])
            hidden = np.asarray(
                out["last_hidden_state"][0]
                if isinstance(out, dict) else out[0], np.float32)
            # CLIP/Gemma prompts start with BOS; T5 has none; template-
            # prefixed TEs (HunyuanVideo llama) pass their crop offset
            # via `start`
            s0 = start if start is not None \
                else (0 if not hasattr(tokenizer, "bos") else 1)
            vec = hidden[s0:s0 + count]
            out_vectors.append(vec)
            stds.append(float(vec.std(axis=1).mean()))
        tokenizer.register_placeholder(e.placeholder, count)
        ids_map[e.uuid] = (input_count + offset, count)
        spans.append((offset, count))
        offset += count
    out_vec = jnp.asarray(np.concatenate(out_vectors, 0), jnp.float32) \
        if out_vectors else None
    return (jnp.asarray(np.concatenate(input_rows, 0), jnp.float32),
            out_vec, ids_map, tuple(spans), tuple(stds))


def _load_embedding_file(path: str, hidden: int) -> np.ndarray | None:
    """Standalone embedding file (continue training / fixed init) —
    reference: modules/modelLoader/mixin/EmbeddingLoaderMixin.py:14-68.
    Accepts our own 'emp_params' format, bundled 'bundle_emb.*' keys, or
    any single [n, hidden] tensor."""
    if not path:
        return None
    from onetrainer_tpu.io.safetensors_io import load_safetensors
    sd = load_safetensors(path)
    for key in ("emp_params", "string_to_param"):
        if key in sd:
            return np.asarray(sd[key], np.float32)
    candidates = [v for v in sd.values()
                  if getattr(v, "ndim", 0) == 2 and v.shape[-1] == hidden]
    if len(candidates) == 1:
        return np.asarray(candidates[0], np.float32)
    raise ValueError(f"could not find an embedding tensor in {path}")


def create_sd_setup(
        model: StableDiffusionModel,
        config: TrainConfig,
        total_steps: int = 10_000,
        steps_per_epoch: int = 100,
) -> SDSetup:
    method = config.training_method

    # prediction forcing (reference: StableDiffusionFineTuneSetup.py:80-86)
    if config.rescale_noise_scheduler_to_zero_terminal_snr:
        model.rescale_noise_scheduler_to_zero_terminal_snr()
        model.force_v_prediction()
    if config.force_v_prediction:
        model.force_v_prediction()
    if config.force_epsilon_prediction:
        model.force_epsilon_prediction()

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

    train_te = config.train_text_encoder_or_embedding()

    if method == TrainingMethod.LORA:
        peft_cfg = PeftConfig.from_train_config(config)
        rng = jax.random.PRNGKey(0)
        if config.unet.train:
            trainable["unet_lora"] = init_peft_params(rng, model.unet_params, peft_cfg)
            group_schedules["unet_lora"] = _group_schedule(
                config, config.unet.learning_rate, total_steps,
                config.unet, steps_per_epoch)
            labels["unet_lora"] = jax.tree.map(lambda _: "unet_lora",
                                               trainable["unet_lora"])
        if config.text_encoder.train and model.te_params is not None:
            trainable["te_lora"] = init_peft_params(
                jax.random.PRNGKey(1), model.te_params, peft_cfg)
            group_schedules["te_lora"] = _group_schedule(
                config, config.text_encoder.learning_rate, total_steps,
                config.text_encoder, steps_per_epoch)
            labels["te_lora"] = jax.tree.map(lambda _: "te_lora", trainable["te_lora"])
        if config.lora_model_name:
            # continue training from an existing kohya LoRA file
            # (reference: LoRALoaderMixin.py:14-90)
            from onetrainer_tpu.peft.lora import apply_lora_checkpoint
            peft_cfg = apply_lora_checkpoint(
                config.lora_model_name, trainable,
                {"unet_lora": "lora_unet", "te_lora": "lora_te"}, peft_cfg)
        frozen["unet"] = model.unet_params
        frozen["text_encoder"] = model.te_params
    elif method == TrainingMethod.EMBEDDING:
        vectors, embedding_ids = _init_embedding_vectors(
            model, model.te_params, tokenizer, config)
        lr = config.embedding_learning_rate or config.learning_rate
        if vectors is not None:
            trainable["embeddings"] = vectors
            group_schedules["embeddings"] = _group_schedule(config, lr, total_steps,
                steps_per_epoch=steps_per_epoch)
            labels["embeddings"] = "embeddings"
        n_input = int(vectors.shape[0]) if vectors is not None else 0
        out_inputs, out_vectors, out_ids, out_spans, out_stds = \
            _init_output_embeddings(model.text_encoder, model.te_params, tokenizer,
                                    config, n_input)
        if out_vectors is not None:
            trainable["output_embeddings"] = out_vectors
            frozen["embedding_inputs"] = out_inputs
            group_schedules["output_embeddings"] = _group_schedule(
                config, lr, total_steps, steps_per_epoch=steps_per_epoch)
            labels["output_embeddings"] = "output_embeddings"
            embedding_ids.update(out_ids)
        frozen["unet"] = model.unet_params
        frozen["text_encoder"] = model.te_params
    elif method == TrainingMethod.FINE_TUNE_VAE:
        # decode(latent) -> pixel reconstruction (reference:
        # StableDiffusionFineTuneVaeSetup.py:68-101)
        trainable["vae"] = model.vae_params
        group_schedules["vae"] = _group_schedule(
            config, config.vae.learning_rate, total_steps,
            config.vae, steps_per_epoch)
        labels["vae"] = jax.tree.map(lambda _: "vae", trainable["vae"])
        frozen["unet"] = model.unet_params
        frozen["text_encoder"] = model.te_params
    else:  # FINE_TUNE
        if config.unet.train:
            trainable["unet"] = model.unet_params
            group_schedules["unet"] = _group_schedule(
                config, config.unet.learning_rate, total_steps,
                config.unet, steps_per_epoch)
            labels["unet"] = jax.tree.map(lambda _: "unet", trainable["unet"])
        else:
            frozen["unet"] = model.unet_params
        if config.text_encoder.train:
            trainable["text_encoder"] = model.te_params
            group_schedules["text_encoder"] = _group_schedule(
                config, config.text_encoder.learning_rate, total_steps,
                config.text_encoder, steps_per_epoch)
            labels["text_encoder"] = jax.tree.map(
                lambda _: "text_encoder", trainable["text_encoder"])
        else:
            frozen["text_encoder"] = model.te_params
        # trained additional embeddings alongside fine tune
        if config.train_any_embedding():
            vectors, embedding_ids = _init_embedding_vectors(
                model, model.te_params, tokenizer, config)
            if vectors is not None:
                trainable["embeddings"] = vectors
                lr = config.embedding_learning_rate or config.learning_rate
                group_schedules["embeddings"] = _group_schedule(config, lr, total_steps,
                steps_per_epoch=steps_per_epoch)
                labels["embeddings"] = "embeddings"

    # quantized frozen base (setup/quantize.py; reference quantizes the
    # same parts post-load: modules/util/quantization_util.py:72-160)
    from onetrainer_tpu.setup.quantize import quantize_frozen_parts
    quantize_frozen_parts(frozen, config.weight_dtypes(),
                          {"unet": "unet", "text_encoder": "text_encoder"},
                          model=model)

    tx = create_group_optimizer(
        group_schedules, config.optimizer.optimizer, config.optimizer, labels)
    if config.clip_grad_norm is not None and config.clip_grad_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(config.clip_grad_norm), tx)
    if config.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=config.gradient_accumulation_steps)

    step_cfg = SDStepConfig.from_train_config(
        config, model.prediction_type, model.text_encoder_layer_skip)
    overrides = {"vae_scaling_factor": model.vae_config.scaling_factor}
    if method == TrainingMethod.EMBEDDING or embedding_ids:
        # live TE encode required when embeddings train
        overrides["train_text_encoder"] = True
    if "output_embeddings" in trainable:
        overrides["output_embedding_base_id"] = \
            model.te_config.vocab_size + n_input
        overrides["output_embedding_spans"] = out_spans
        overrides["output_embedding_stds"] = out_stds
    from onetrainer_tpu.util.enums import ConceptType
    has_prior_concepts = any(
        c.type == ConceptType.PRIOR_PREDICTION for c in (config.concepts or []))
    if config.masked_prior_preservation_weight > 0 or has_prior_concepts:
        overrides["prior_preservation"] = True
    step_cfg = SDStepConfig(**{**step_cfg.__dict__, **overrides})

    if method == TrainingMethod.FINE_TUNE_VAE:
        from dataclasses import replace as _replace
        from onetrainer_tpu.train.vae_train_step import make_vae_train_step
        step_cfg = _replace(step_cfg.__class__(**step_cfg.__dict__),
                            loss=_replace(step_cfg.loss,
                                          masked_training=False,
                                          vb_loss_strength=0.0))
        train_step = make_vae_train_step(model, step_cfg, tx)
    else:
        train_step = make_sd_train_step(model, step_cfg, tx, peft_cfg)
    state = create_train_state(trainable, tx,
                               ema_enabled=config.ema != EMAMode.OFF)

    return SDSetup(
        model=model, config=config, tokenizer=tokenizer, peft_cfg=peft_cfg,
        step_cfg=step_cfg, trainable=trainable, frozen=frozen, tx=tx,
        train_step=train_step, state=state, embedding_ids=embedding_ids,
        group_schedules=group_schedules)


def make_encode_fns(setup: SDSetup):
    """Data-loader encode fns: jitted VAE encode + tokenization (+ TE
    encode when the TE is frozen — cached hidden states, the reference's
    text-embedding caching path)."""
    model = setup.model
    config = setup.config
    vae_params = model.vae_params

    # params are jit arguments, not closure captures (captured arrays
    # inline into the HLO as literals — see make_sdxl_encode_fns)
    @jax.jit
    def _vae_encode(vae_params, pixels):
        mean, logvar = model.vae.apply(
            {"params": vae_params}, pixels, method=model.vae.encode)
        return mean, logvar

    def encode_images(images: np.ndarray) -> dict:
        mean, logvar = _vae_encode(vae_params, jnp.asarray(images))
        return {"latent_image": np.asarray(mean, np.float32),
                "latent_logvar": np.asarray(logvar, np.float32)}

    cache_te = not setup.step_cfg.train_text_encoder and model.te_params is not None

    if cache_te:
        te_params = model.te_params

        @jax.jit
        def _te_encode(te_params, tokens):
            out = model.text_encoder.apply({"params": te_params}, tokens[None])
            return encode_clip_text(out, setup.step_cfg.text_encoder_layer_skip)[0]

        def encode_text(prompt: str) -> dict:
            tokens = setup.tokenizer(prompt)
            hidden = _te_encode(te_params, jnp.asarray(tokens))
            return {"tokens": tokens,
                    "text_encoder_hidden_state": np.asarray(hidden, np.float32)}
    else:
        def encode_text(prompt: str) -> dict:
            return {"tokens": setup.tokenizer(prompt)}

    return encode_images, encode_text
