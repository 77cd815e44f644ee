"""HiDream setup (reference: modules/modelSetup/HiDreamLoRASetup.py,
BaseHiDreamSetup.py): 4 frozen text encoders, MoE DiT trainable."""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
import optax

from onetrainer_tpu.config.train_config import TrainConfig
from onetrainer_tpu.models.hidream_model import HiDreamModel
from onetrainer_tpu.peft.lora import PeftConfig, apply_peft, init_peft_params
from onetrainer_tpu.setup.sd_setup import _group_schedule
from onetrainer_tpu.setup.tokenizer import (
    LlamaTokenizerWrapper, SDTokenizer, T5TokenizerWrapper,
)
from onetrainer_tpu.train.hidream_train_step import make_hidream_train_step
from onetrainer_tpu.train.optimizers import create_group_optimizer
from onetrainer_tpu.train.sd_train_step import SDStepConfig
from onetrainer_tpu.train.train_state import create_train_state
from onetrainer_tpu.util.enums import EMAMode, TrainingMethod


@dataclass
class HiDreamSetup:
    model: HiDreamModel
    config: TrainConfig
    tokenizer: SDTokenizer
    tokenizer_2: SDTokenizer
    tokenizer_3: T5TokenizerWrapper
    tokenizer_4: LlamaTokenizerWrapper
    peft_cfg: PeftConfig | None
    step_cfg: SDStepConfig
    trainable: dict
    frozen: dict
    tx: object
    train_step: object
    state: object = None
    embedding_ids: dict = field(default_factory=dict)
    group_schedules: dict = field(default_factory=dict)
    # artifact key names (reference: HiDreamEmbeddingSaver.py:27-43)
    embedding_save_keys: dict = field(default_factory=lambda: {
        "embeddings": "clip_l", "embeddings_2": "clip_g",
        "embeddings_3": "t5", "embeddings_4": "llama",
        "output_embeddings_3": "t5_out"})

    def merged_inference_params(self, params=None):
        params = params if params is not None else self.state.params
        if self.config.training_method == TrainingMethod.LORA:
            transformer = apply_peft(
                self.frozen["transformer"], params["transformer_lora"],
                self.peft_cfg) if "transformer_lora" in params \
                else self.frozen["transformer"]
        else:
            transformer = params.get("transformer",
                                     self.frozen.get("transformer"))
        return (transformer, self.frozen.get("text_encoder"),
                self.frozen.get("text_encoder_2"),
                self.frozen.get("text_encoder_3"),
                self.frozen.get("text_encoder_4"), params.get("embeddings"))


def create_hidream_setup(
        model: HiDreamModel,
        config: TrainConfig,
        total_steps: int = 10_000,
        steps_per_epoch: int = 100,
) -> HiDreamSetup:
    method = config.training_method

    def clip_wrapper(current, cfg):
        if isinstance(current, SDTokenizer):
            return current
        return SDTokenizer(current, max_length=cfg.max_position_embeddings,
                           vocab_size=cfg.vocab_size,
                           bos=max(cfg.eos_token_id - 1, 0),
                           eos=cfg.eos_token_id)

    tokenizer = clip_wrapper(model.tokenizer, model.te_config)
    tokenizer_2 = clip_wrapper(model.tokenizer_2, model.te2_config)
    tokenizer_3 = model.tokenizer_3 if isinstance(model.tokenizer_3, T5TokenizerWrapper) \
        else T5TokenizerWrapper(model.tokenizer_3, max_length=128,
                                vocab_size=model.te3_config.vocab_size)
    tokenizer_4 = model.tokenizer_4 if isinstance(model.tokenizer_4, LlamaTokenizerWrapper) \
        else LlamaTokenizerWrapper(model.tokenizer_4, max_length=128,
                                   vocab_size=model.te4_config.vocab_size)
    model.tokenizer, model.tokenizer_2 = tokenizer, tokenizer_2
    model.tokenizer_3, model.tokenizer_4 = tokenizer_3, tokenizer_4

    trainable: dict = {}
    frozen: dict = {"transformer": model.transformer_params,
                    "text_encoder": model.te_params,
                    "text_encoder_2": model.te2_params,
                    "text_encoder_3": model.te3_params,
                    "text_encoder_4": model.te4_params}
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
    elif method == TrainingMethod.EMBEDDING:
        # 4-TE textual inversion (reference: HiDreamEmbeddingSetup.py;
        # HiDreamModelEmbedding carries one vector per TE and
        # HiDreamEmbeddingSaver.py saves clip_l/clip_g/t5/llama keys).
        # Output embeddings patch the T5 context (is_output_embedding is
        # set on TE3/TE4 in the reference; the TE4 llama-out path is not
        # implemented here — the T5 scatter is, matching the t5_out key)
        from onetrainer_tpu.setup.sd_setup import (
            _init_embedding_vectors, _init_output_embeddings,
        )
        lr = config.embedding_learning_rate or config.learning_rate
        embedding_ids = {}
        tes = ((model.te_params, tokenizer, ""),
               (model.te2_params, tokenizer_2, "_2"),
               (model.te3_params, tokenizer_3, "_3"),
               (model.te4_params, tokenizer_4, "_4"))
        n_input = 0
        for te_p, tok, suffix in tes:
            vectors, ids = _init_embedding_vectors(model, te_p, tok, config)
            if vectors is not None:
                trainable[f"embeddings{suffix}"] = vectors
                group_schedules[f"embeddings{suffix}"] = _group_schedule(
                    config, lr, total_steps, steps_per_epoch=steps_per_epoch)
                labels[f"embeddings{suffix}"] = f"embeddings{suffix}"
                if suffix == "":
                    embedding_ids = ids
                    n_input = int(vectors.shape[0])
        out_vec = None
        for (te_p, tok, suffix), te_mod in zip(
                tes, (model.text_encoder, model.text_encoder_2,
                      model.text_encoder_3, model.text_encoder_4)):
            # only TE3's (T5) output is patched — the other TEs just need
            # frozen input rows + placeholder registration, so skip their
            # TE forwards (TE4 is an 8B Llama; compiling it here would be
            # minutes of wasted work)
            out_in, vec, out_ids, spans, stds = _init_output_embeddings(
                te_mod, te_p, tok, config, n_input,
                compute_output=suffix == "_3")
            if out_in is not None:
                frozen[f"embedding_inputs{suffix}"] = out_in
            if suffix == "_3" and vec is not None:
                out_vec, out_spans, out_stds = vec, spans, stds
                trainable["output_embeddings_3"] = vec
                group_schedules["output_embeddings_3"] = _group_schedule(
                    config, lr, total_steps, steps_per_epoch=steps_per_epoch)
                labels["output_embeddings_3"] = "output_embeddings_3"
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
            {"transformer_lora": "lora_transformer"}, peft_cfg)

    # quantized frozen base (setup/quantize.py; reference quantizes the
    # same parts post-load: modules/util/quantization_util.py:72-160)
    from onetrainer_tpu.setup.quantize import quantize_frozen_parts
    quantize_frozen_parts(frozen, config.weight_dtypes(),
                          {"transformer": "prior", "text_encoder": "text_encoder",
                           "text_encoder_2": "text_encoder_2",
                           "text_encoder_3": "text_encoder_3",
                           "text_encoder_4": "text_encoder_4"},
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
        "train_text_encoder": method == TrainingMethod.EMBEDDING,
    }
    if "output_embeddings_3" in trainable:
        overrides.update(
            output_embedding_base_id_3=model.te3_config.vocab_size + n_input,
            output_embedding_spans=out_spans,
            output_embedding_stds_3=out_stds)
    step_cfg = SDStepConfig(**{**step_cfg.__dict__, **overrides})

    train_step = make_hidream_train_step(model, step_cfg, tx, peft_cfg)
    state = create_train_state(trainable, tx,
                               ema_enabled=config.ema != EMAMode.OFF)

    return HiDreamSetup(
        model=model, config=config, tokenizer=tokenizer,
        tokenizer_2=tokenizer_2, tokenizer_3=tokenizer_3,
        tokenizer_4=tokenizer_4, peft_cfg=peft_cfg, step_cfg=step_cfg,
        trainable=trainable, frozen=frozen, tx=tx, train_step=train_step,
        state=state, embedding_ids=embedding_ids,
        group_schedules=group_schedules)


def make_hidream_encode_fns(setup: HiDreamSetup):
    """VAE latent caching + 4-TE text caching
    (reference: HiDreamBaseDataLoader preparation modules)."""
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
        mean, logvar = _vae_encode(vae_params, jnp.asarray(images))
        return {"latent_image": np.asarray(mean, np.float32),
                "latent_logvar": np.asarray(logvar, np.float32)}

    if setup.step_cfg.train_text_encoder:
        # embedding training: the TEs run inside the jitted step with the
        # trained vectors spliced in — cache tokens only
        def encode_text_tokens(prompt: str) -> dict:
            t4 = setup.tokenizer_4(prompt)
            return {
                "tokens_1": setup.tokenizer(prompt),
                "tokens_2": setup.tokenizer_2(prompt),
                "tokens_3": setup.tokenizer_3(prompt),
                "tokens_4": t4, "tokens_mask_4": setup.tokenizer_4.mask(t4),
            }
        return encode_images, encode_text_tokens

    te = model.te_params
    te2 = model.te2_params
    te3 = model.te3_params
    te4 = model.te4_params

    @jax.jit
    def _te_encode(te, te2, te3, te4, t1, t2, t3, t4, m4):
        out1 = model.text_encoder.apply({"params": te}, t1[None])
        out2 = model.text_encoder_2.apply({"params": te2}, t2[None])
        t5 = model.text_encoder_3.apply(
            {"params": te3}, t3[None],
            layer_skip=setup.step_cfg.te3_layer_skip)
        out4 = model.text_encoder_4.apply({"params": te4}, t4[None], m4[None])
        states = out4["hidden_states"]
        layers = list(states[1:])
        layers = [layer * m4[None, :, None].astype(layer.dtype)
                  for layer in layers]
        llama = jnp.stack(layers, axis=0)[:, 0]
        return (out1["pooled_output"][0], out2["pooled_output"][0],
                t5[0], llama)

    def encode_text(prompt: str) -> dict:
        t1 = setup.tokenizer(prompt)
        t2 = setup.tokenizer_2(prompt)
        t3 = setup.tokenizer_3(prompt)
        t4 = setup.tokenizer_4(prompt)
        m4 = setup.tokenizer_4.mask(t4)
        p1, p2, t5s, llama = _te_encode(
            te, te2, te3, te4,
            jnp.asarray(t1), jnp.asarray(t2), jnp.asarray(t3),
            jnp.asarray(t4), jnp.asarray(m4))
        return {
            "tokens_1": t1, "tokens_2": t2, "tokens_3": t3, "tokens_4": t4,
            "tokens_mask_4": m4,
            "text_encoder_1_pooled_state": np.asarray(p1, np.float32),
            "text_encoder_2_pooled_state": np.asarray(p2, np.float32),
            "text_encoder_3_hidden_state": np.asarray(t5s, np.float32),
            "text_encoder_4_hidden_state": np.asarray(llama, np.float32),
        }

    return encode_images, encode_text
