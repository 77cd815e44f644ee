"""The local training loop: load → setup → cache → epoch/step loop →
sample/backup/save → final save.

(reference: modules/trainer/GenericTrainer.py — same orchestration
contract: TimedAction-scheduled sampling/backup/save, TrainCommands
polling, TensorBoard scalars `loss/train_step`, `smooth_loss/train_step`,
per-group `lr/*`, rolling backups, backup_before_save.)

The hot loop is one jitted call per batch; the python layer only does
cadence, I/O, and metrics.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np

from onetrainer_tpu.config.train_config import TrainConfig
from onetrainer_tpu.data.loader import Text2ImageDataLoader
from onetrainer_tpu.io.pytree_io import load_pytree, save_pytree
from onetrainer_tpu.io.safetensors_io import save_safetensors
from onetrainer_tpu.setup.families import get_family, save_lora_output
from onetrainer_tpu.trainer.base_trainer import BaseTrainer
from onetrainer_tpu.train.train_state import TrainState
from onetrainer_tpu.util.callbacks import TrainCallbacks
from onetrainer_tpu.util.commands import TrainCommands
from onetrainer_tpu.util.enums import (
    EMAMode, ModelFormat, ModelType, TimeUnit, TrainingMethod,
)
from onetrainer_tpu.util.train_progress import TrainProgress


def _adaptive_d(opt_state) -> float | None:
    """Mean of the d-adaptation estimate (optax prodigy/dadapt state field
    `estim_lr`) across groups — the reference multiplies each group's LR
    by the optimizer's d before logging (BaseModelSetup.py:96-119)."""
    values: list[float] = []

    def walk(node):
        if hasattr(node, "_fields"):
            for field_name in node._fields:
                child = getattr(node, field_name)
                if field_name == "estim_lr":
                    try:
                        values.append(float(np.asarray(child)))
                    except Exception:
                        pass
                else:
                    walk(child)
        elif isinstance(node, (list, tuple)):
            for child in node:
                walk(child)
        elif isinstance(node, dict):
            for child in node.values():
                walk(child)

    walk(opt_state)
    return float(np.mean(values)) if values else None


class GenericTrainer(BaseTrainer):
    def __init__(self, config: TrainConfig,
                 callbacks: TrainCallbacks | None = None,
                 commands: TrainCommands | None = None):
        super().__init__(config, callbacks or TrainCallbacks(),
                         commands or TrainCommands())
        self.model = None
        self.setup = None
        self.family = None
        self.mesh = None
        self.data_loader: Text2ImageDataLoader | None = None
        self.train_progress = TrainProgress()
        self._loss_ema = None
        # pipelined metrics queue: step N's loss is fetched OT_METRICS_LAG
        # steps later. Depth 1 (default) never blocks dispatch on fetch;
        # deeper lags amortize the per-step scalar round trip when the
        # device sits behind a high-latency transport (the axon tunnel
        # adds ~0.1 s/step of fetch RTT — measured e2e 4.24 vs synthetic
        # 4.98 imgs/sec; on a local TPU host the fetch is microseconds
        # and lag 1 is right)
        self._metrics_lag = max(1, int(os.environ.get("OT_METRICS_LAG", "1")))
        self._pending_metrics: list = []   # [(metrics, global_step), ...]

    # -- lifecycle ----------------------------------------------------------------

    def start(self):
        config = self.config
        if os.environ.get("OT_MEM_DEBUG") == "1":
            # print HBM in-use/peak at every status transition — the tool
            # for attributing device memory across load/quantize/cache/
            # train phases when a workload OOMs (CLAUDE.md: OOM triage)
            from onetrainer_tpu.util.profiling import device_memory_stats
            _orig_status = self.callbacks.on_update_status

            def _status_with_mem(status: str):
                _orig_status(status)
                try:
                    parts = [f"{k.rsplit('/', 2)[-2]}={v:.2f}GiB"
                             for k, v in device_memory_stats().items()]
                    print(f"[mem] {status}: {', '.join(parts) or 'n/a'}",
                          flush=True)
                except Exception:
                    pass

            self.callbacks.on_update_status = _status_with_mem
        self.callbacks.on_update_status("loading the model")

        base_model_name = config.base_model_name
        if config.continue_last_backup:
            last_backup = config.get_last_backup_path()
            if last_backup:
                base_model_name = os.path.join(last_backup, "model")
                print(f"resuming from backup {last_backup}")
                self._restore_backup_meta(last_backup)

        self.family = get_family(config.model_type)
        # tileable-texture training: route every spatially padded conv to
        # circular padding before the model is built/traced
        # (reference: modules/util/conv_util.py:6-9 applied in
        # setup_optimizations, e.g. BaseStableDiffusionSetup.py:51-55)
        from onetrainer_tpu.models.convpad import set_circular_padding
        set_circular_padding(bool(config.force_circular_padding))
        # host offload: optimizer state when gradient_checkpointing is
        # CPU_OFFLOADED, EMA params when ema mode is CPU — the reference's
        # RAM-offload / EMAMode.CPU analogs via XLA pinned_host memories
        # (reference: LayerOffloadConductor.py, EMAModule.py EMAMode.CPU).
        # Single-chip only; _setup_mesh disables it (FSDP is the mesh tool)
        from onetrainer_tpu.train.train_state import configure_offload
        from onetrainer_tpu.util.enums import EMAMode
        configure_offload(
            opt_state=config.gradient_checkpointing.offload(),
            ema=config.ema == EMAMode.CPU)
        self.model = self.family.load(base_model_name, config)
        self._source_dir = base_model_name

        self.callbacks.on_update_status("creating the data loader")
        # steps-per-epoch estimate for LR schedules
        self.setup = self.family.create_setup(
            self.model, config, max(config.epochs * 100, 1000))
        encode_images, encode_text = self.family.make_encode_fns(self.setup)
        self.data_loader = Text2ImageDataLoader(
            config, encode_images, encode_text,
            quantization=self.family.quantization,
            model_tag=str(config.model_type),
            latent_scale=self.model.vae_config.spatial_scale,
            conditioning_image=(config.model_type.has_conditioning_image_input()
                                or config.custom_conditioning_image),
            fill_mask_channels=(config.model_type == ModelType.FLUX_FILL_DEV_1),
            video_mode=getattr(self.family, "video", False),
            cache_pixels=(config.training_method == TrainingMethod.FINE_TUNE_VAE),
            depth_fn=self._make_depth_fn(base_model_name))

        # rebuild schedules with the real epoch length
        steps_per_epoch = max(len(self.data_loader), 1)
        total = config.epochs * steps_per_epoch // max(
            config.gradient_accumulation_steps, 1)
        self.setup = self.family.create_setup(
            self.model, config, max(total, 1), steps_per_epoch)

        self._setup_mesh()

        # validation data loader over VALIDATION concepts only
        self.validation_loader = None
        if config.validation:
            from onetrainer_tpu.config.train_config import TrainConfig as _TC
            from onetrainer_tpu.util.enums import ConceptType
            val_config = _TC.default_values().from_dict(config.to_dict())
            val_config.concepts = [
                c for c in (config.concepts or [])
                if c.type == ConceptType.VALIDATION]
            if val_config.concepts:
                self.validation_loader = Text2ImageDataLoader(
                    val_config, encode_images, encode_text,
                    quantization=self.family.quantization,
                    include_validation=True,
                    model_tag=str(config.model_type) + "-val",
                    latent_scale=self.model.vae_config.spatial_scale)

        if config.continue_last_backup and config.get_last_backup_path():
            self._restore_internal_state(config.get_last_backup_path())

    def _make_depth_fn(self, base_model_name: str):
        if not self.config.model_type.has_depth_input():
            return None
        from onetrainer_tpu.data.depth import make_depth_fn
        return make_depth_fn(base_model_name,
                             self.model.vae_config.spatial_scale)

    def _setup_mesh(self):
        """Multi-chip sharding: OT_MESH_DP / OT_MESH_FSDP env vars (or all
        devices on fsdp by default when >1 device is visible). Frozen params
        and full-finetune trainables shard FSDP-style; adapter trees
        replicate; batches shard over (data, fsdp)."""
        import os as _os
        from onetrainer_tpu.parallel.mesh import (
            create_mesh, param_shardings, shard_params,
        )
        from onetrainer_tpu.train.train_state import create_train_state

        self.mesh = None
        n_devices = jax.device_count()
        dp = int(_os.environ.get("OT_MESH_DP", 0)) or None
        fsdp = int(_os.environ.get("OT_MESH_FSDP", 0)) or None
        # sequence parallelism for video DiTs (Ulysses; parallel/sp.py)
        sp = int(_os.environ.get("OT_MESH_SP", 0)) or 1
        # explicit opt-in via env, or automatic on real multi-chip TPU
        # (virtual CPU device farms from tests must not trigger it)
        auto = n_devices > 1 and jax.default_backend() == "tpu"
        if not (dp or fsdp or sp > 1 or auto):
            return
        self.mesh = create_mesh(dp=dp, fsdp=fsdp, sp=sp)
        # on a mesh, FSDP sharding replaces host offload (single-device
        # pinned_host placement would fight the NamedShardings)
        from onetrainer_tpu.train.train_state import configure_offload
        configure_offload(opt_state=False, ema=False)
        if sp > 1:
            from onetrainer_tpu.parallel.sp import enable_sp
            enable_sp(self.mesh)
        from onetrainer_tpu.parallel.mesh import DATA_AXIS, FSDP_AXIS
        batch_shards = self.mesh.shape[DATA_AXIS] * self.mesh.shape[FSDP_AXIS]
        if self.config.batch_size % batch_shards != 0:
            raise ValueError(
                f"batch_size {self.config.batch_size} must be divisible by "
                f"the mesh's {batch_shards} batch shards (data x fsdp)")
        setup = self.setup
        setup.frozen = {k: shard_params(v, self.mesh) if v is not None else None
                        for k, v in setup.frozen.items()}
        sharded_trainable = {
            k: shard_params(v, self.mesh) for k, v in setup.trainable.items()}
        setup.trainable = sharded_trainable
        setup.state = create_train_state(
            sharded_trainable, setup.tx,
            ema_enabled=setup.state.ema is not None)
        print(f"training on mesh {dict(self.mesh.shape)}")

    def _restore_backup_meta(self, backup_dir: str):
        meta_path = os.path.join(backup_dir, "meta.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                self.train_progress = TrainProgress.from_dict(
                    json.load(f).get("train_progress", {}))

    def _restore_internal_state(self, backup_dir: str):
        opt_path = os.path.join(backup_dir, "optimizer.safetensors")
        if os.path.exists(opt_path):
            try:
                tree = load_pytree(opt_path)
                state = self.setup.state
                from onetrainer_tpu.train.train_state import opt_to_storage
                self.setup.state = TrainState(
                    step=jnp.asarray(self.train_progress.global_step, jnp.int32),
                    params=tree["params"],
                    opt_state=opt_to_storage(jax.tree.unflatten(
                        jax.tree.structure(state.opt_state),
                        jax.tree.leaves(tree["opt_state"]))),
                    ema=state.ema)
                print("restored optimizer state")
            except Exception as e:
                print(f"could not restore optimizer state: {e}")
        ema_path = os.path.join(backup_dir, "ema.safetensors")
        if os.path.exists(ema_path) and self.setup.state.ema is not None:
            try:
                from onetrainer_tpu.train.ema import EMAState
                from onetrainer_tpu.train.train_state import ema_to_storage
                tree = load_pytree(ema_path)
                self.setup.state = self.setup.state.replace(
                    ema=ema_to_storage(
                        EMAState(params=tree["params"],
                                 step=jnp.asarray(tree["step"], jnp.int32))))
            except Exception as e:
                print(f"could not restore ema state: {e}")

    # -- scheduled actions ----------------------------------------------------------

    def _needs(self, name: str, interval, unit: TimeUnit, start_at_zero=False) -> bool:
        return self.repeating_action_needed(
            name, interval, unit, self.train_progress, start_at_zero=start_at_zero)

    def backup(self, train_progress: TrainProgress | None = None):
        progress = train_progress or self.train_progress
        self.callbacks.on_update_status("creating backup")
        stamp = time.strftime("%Y-%m-%d_%H-%M-%S")
        backup_dir = os.path.join(
            self.config.workspace_dir, "backup",
            f"{stamp}-backup-{progress.filename_string()}")
        try:
            self._save_internal(backup_dir, progress)
            self._prune_backups()
        except Exception:
            traceback.print_exc()
            shutil.rmtree(backup_dir, ignore_errors=True)

    def _save_internal(self, backup_dir: str, progress: TrainProgress):
        os.makedirs(backup_dir, exist_ok=True)
        self.family.save_model(self.setup, os.path.join(backup_dir, "model"),
                               self._source_dir)
        state = self.setup.state
        save_pytree(os.path.join(backup_dir, "optimizer.safetensors"), {
            "params": jax.device_get(state.params),
            "opt_state": jax.device_get(state.opt_state),
        })
        if state.ema is not None:
            save_pytree(os.path.join(backup_dir, "ema.safetensors"), {
                "params": jax.device_get(state.ema.params),
                "step": int(state.ema.step),
            })
        with open(os.path.join(backup_dir, "meta.json"), "w") as f:
            json.dump({"train_progress": progress.to_dict()}, f, indent=2)
        # config copies (reference: GenericTrainer.__save_backup_config)
        config_dir = os.path.join(backup_dir, "onetrainer_config")
        os.makedirs(config_dir, exist_ok=True)
        with open(os.path.join(config_dir, "args.json"), "w") as f:
            json.dump(self.config.to_settings_dict(secrets=False), f, indent=4)

    def _prune_backups(self):
        if not self.config.rolling_backup:
            return
        backups_dir = os.path.join(self.config.workspace_dir, "backup")
        if not os.path.isdir(backups_dir):
            return
        backups = sorted(
            p for p in os.listdir(backups_dir)
            if os.path.isdir(os.path.join(backups_dir, p)))
        for p in backups[:-self.config.rolling_backup_count]:
            shutil.rmtree(os.path.join(backups_dir, p), ignore_errors=True)

    def _export_params(self):
        """Context manager: swap EMA weights (or schedule-free eval params)
        into state.params for export, restore after
        (reference: GenericTrainer.py:467-495 copies EMA into the model
        before every save and the final save :779-780; schedule-free
        eval() before save :414-417)."""
        from contextlib import contextmanager

        @contextmanager
        def _ctx():
            state = self.setup.state
            real_params = state.params
            if state.ema is not None:
                self.setup.state = state.replace(params=state.ema.params)
            elif self.config.optimizer.optimizer.is_schedule_free():
                from onetrainer_tpu.train.optimizers import (
                    schedule_free_eval_params,
                )
                self.setup.state = state.replace(
                    params=schedule_free_eval_params(
                        state.opt_state, state.params))
            try:
                yield
            finally:
                self.setup.state = self.setup.state.replace(params=real_params)

        return _ctx()

    def save(self, destination: str | None = None,
             raise_on_error: bool = False):
        self.callbacks.on_update_status("saving")
        config = self.config
        destination = destination or config.output_model_destination
        if config.backup_before_save and destination == config.output_model_destination:
            pass  # backup handled by caller cadence; avoid doubling in save loops
        try:
            with self._export_params():
                self._save_output(destination)
        except Exception:
            # mid-training saves are best-effort like the reference's,
            # but the FINAL save must not fail silently (a run that
            # "succeeds" without writing output_model_destination)
            if raise_on_error:
                raise
            traceback.print_exc()

    def _save_output(self, destination: str):
        config = self.config
        # every exported tensor is cast to output_dtype (reference:
        # GenericTrainer.save passes output_dtype.torch_dtype() into the
        # saver, GenericTrainer.py:479; backups keep the train dtype)
        save_dtype = config.output_dtype.to_save_dtype()
        if config.training_method == TrainingMethod.LORA:
            save_lora_output(self.setup, destination,
                             self.family.lora_prefixes, save_dtype=save_dtype)
        elif config.training_method == TrainingMethod.EMBEDDING:
            params = self.setup.state.params
            tensors = {}
            # per-family artifact key names (reference:
            # {StableDiffusionXL,StableDiffusion3,Flux,...}EmbeddingSaver)
            save_keys = getattr(self.setup, "embedding_save_keys", None)
            multi_te = any(k.endswith("_2") or k.endswith("_3")
                           for k in params)
            if save_keys is None and multi_te:
                save_keys = {"embeddings": "clip_l",
                             "embeddings_2": "clip_g",
                             "embeddings_3": "t5",
                             "output_embeddings": "clip_l_out",
                             "output_embeddings_2": "clip_g_out",
                             "output_embeddings_3": "t5_out"}
            from onetrainer_tpu.setup.families import cast_float_array
            if save_keys:
                for key, name in save_keys.items():
                    if key in params:
                        tensors[name] = cast_float_array(
                            params[key], save_dtype)
            else:
                if "embeddings" in params:
                    tensors["emp_params"] = cast_float_array(
                        params["embeddings"], save_dtype)
                if "output_embeddings" in params:
                    # output-embedding vectors (reference:
                    # BaseModelEmbedding output_vector save path)
                    tensors["output_emp_params"] = cast_float_array(
                        params["output_embeddings"], save_dtype)
            if not destination.endswith(".safetensors"):
                destination = destination + ".safetensors"
            save_safetensors(destination, tensors, metadata={"format": "pt"})
        elif config.output_model_format.is_single_file():
            if not destination.endswith((".safetensors", ".ckpt")):
                destination += config.output_model_format.file_extension()
            self.family.save_single_file(self.setup, destination,
                                         save_dtype=save_dtype)
        else:
            self.family.save_model(self.setup, destination, self._source_dir,
                                   save_dtype=save_dtype)

    # -- validation ----------------------------------------------------------------

    def _validate(self):
        """Per-concept deterministic validation losses
        (reference: GenericTrainer.__validate:319-389 — TB tags
        loss/validation_step/<concept> plus the total average)."""
        if self.validation_loader is None:
            return
        from onetrainer_tpu.setup.families import make_eval_loss
        if not hasattr(self, "_eval_loss_fn"):
            self._eval_loss_fn = make_eval_loss(self.setup, self.family.name)
        self.callbacks.on_update_status("validating")
        per_concept: dict[str, list[float]] = {}
        batches = self.validation_loader.batches_for_epoch(0)
        self.validation_loader.ensure_cached(batches)
        for batch_samples in batches:
            batch_np = self.validation_loader.materialize_batch(batch_samples)
            if self.mesh is not None:
                from onetrainer_tpu.parallel.mesh import shard_batch
                batch = shard_batch(batch_np, self.mesh)
            else:
                batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
            losses = np.asarray(self._eval_loss_fn(batch))
            for sample, value in zip(batch_samples, losses):
                entry = self.validation_loader.entries[sample.entry_index]
                name = entry.concept.name or f"concept_{entry.concept_index}"
                per_concept.setdefault(name, []).append(float(value))
        if self.tensorboard:
            all_losses = []
            for name, values in per_concept.items():
                mean = float(np.mean(values))
                all_losses.extend(values)
                self.tensorboard.add_scalar(
                    f"loss/validation_step/{name}", mean,
                    self.train_progress.global_step)
            if len(per_concept) > 1 and all_losses:
                self.tensorboard.add_scalar(
                    "loss/validation_step/total_average",
                    float(np.mean(all_losses)), self.train_progress.global_step)

    # -- sampling during training ------------------------------------------------------

    def _sample_during_training(self, custom_samples=None):
        """Scheduled/default sampling, or — with `custom_samples` — the
        queued TrainCommands.sample_custom configs (reference:
        GenericTrainer.py:640-648 polls them each step and routes output
        to samples/custom + on_sample_custom)."""
        config = self.config
        custom = custom_samples is not None
        samples = custom_samples if custom else (config.samples or [])
        if not samples:
            return
        state = self.setup.state
        use_ema = state.ema is not None
        real_params = state.params
        if use_ema:
            # sample with EMA weights, restore after
            # (reference: GenericTrainer.py:289-309 copy_ema_to/copy_temp_to)
            self.setup.state = state.replace(params=state.ema.params)
        elif self.config.optimizer.optimizer.is_schedule_free():
            # schedule-free: sample with the eval (x) params
            # (reference: GenericTrainer.py:268-271 optimizer.eval()/train())
            from onetrainer_tpu.train.optimizers import schedule_free_eval_params
            self.setup.state = state.replace(
                params=schedule_free_eval_params(state.opt_state, state.params))
        try:
            self._sample_batch(config, samples, custom=custom)
        finally:
            self.setup.state = self.setup.state.replace(params=real_params)
        if use_ema and config.non_ema_sampling and not custom:
            self._sample_batch(config, samples, suffix=" - no-ema")
        return

    def _sample_batch(self, config, samples, suffix: str = "",
                      custom: bool = False):
        from onetrainer_tpu.util.path_util import (
            get_string_timestamp, safe_filename,
        )
        self.callbacks.on_update_status("sampling")
        for i, sample_config in enumerate(samples):
            if not sample_config.enabled:
                continue
            try:
                # reference layout: samples/{i} - {safe_prompt}{postfix}/
                # {prefix}{timestamp}-training-sample-{progress}{ext}
                # (GenericTrainer.py:207-226); custom samples go flat into
                # samples/custom/
                if custom:
                    sample_dir = os.path.join(
                        config.workspace_dir, "samples", "custom")
                else:
                    safe_prompt = safe_filename(sample_config.prompt)
                    sample_dir = os.path.join(
                        config.workspace_dir, "samples",
                        f"{i} - {safe_prompt}{suffix}")
                os.makedirs(sample_dir, exist_ok=True)
                if custom:
                    # custom configs carry only what the caller set; fill
                    # sampler defaults from the train config (reference:
                    # GenericTrainer.py:245 from_train_config)
                    sample_config.from_train_config(config)
                    progress_cb = self.callbacks.on_update_sample_custom_progress
                else:
                    progress_cb = lambda s, m, i=i: \
                        self.callbacks.on_update_sample_default_progress(
                            f"sample_{i}", s, m)  # noqa: E731
                out = self.family.sample(self.setup, sample_config, progress_cb)
                from PIL import Image
                name = (f"{config.save_filename_prefix}"
                        f"{get_string_timestamp()}-training-sample-"
                        f"{self.train_progress.filename_string()}"
                        f"{config.sample_image_format.extension()}")
                path = os.path.join(sample_dir, name)
                Image.fromarray(out.image).save(path)
                if getattr(out, "video", None) is not None:
                    # honor sample_video_format (reference: VideoFormat —
                    # MP4 or a numbered PNG/JPG image sequence,
                    # BaseModelSampler.save_video)
                    from onetrainer_tpu.util.enums import VideoFormat
                    vfmt = config.sample_video_format
                    stem = os.path.splitext(path)[0]
                    if vfmt in (VideoFormat.PNG_IMAGE_SEQUENCE,
                                VideoFormat.JPG_IMAGE_SEQUENCE):
                        ext = ".png" if vfmt == VideoFormat.PNG_IMAGE_SEQUENCE \
                            else ".jpg"
                        os.makedirs(stem, exist_ok=True)
                        for fi, frame in enumerate(out.video):
                            Image.fromarray(frame).save(
                                os.path.join(stem, f"{fi:05d}{ext}"))
                    else:
                        from onetrainer_tpu.sampling.hunyuan_sampler import (
                            write_video,
                        )
                        write_video(stem + ".mp4", out.video)
                if self.tensorboard and config.samples_to_tensorboard \
                        and not custom:
                    self.tensorboard.add_image(
                        f"sample{i} - {safe_filename(sample_config.prompt)}",
                        out.image.transpose(2, 0, 1),
                        self.train_progress.global_step)
                if custom:
                    self.callbacks.on_sample_custom(out)
                else:
                    self.callbacks.on_sample_default(out)
            except Exception:
                traceback.print_exc()

    # -- the loop -------------------------------------------------------------------

    def train(self):
        config = self.config
        progress = self.train_progress
        rng = jax.random.PRNGKey(42)
        from onetrainer_tpu.util.profiling import StepProfiler
        profiler = StepProfiler(os.path.join(config.workspace_dir, "profile"))
        # survive transient remote-transport hiccups (dropped helper
        # connection) instead of losing a multi-hour run; the functional
        # state makes a re-dispatch with identical inputs exact
        from onetrainer_tpu.data.loader import retry_transport
        train_step = retry_transport(self.setup.train_step)

        for epoch in range(progress.epoch, config.epochs):
            self.callbacks.on_update_status(f"epoch {epoch}: caching")
            start_batch = progress.epoch_step if epoch == progress.epoch else 0

            if config.only_cache:
                batches = self.data_loader.batches_for_epoch(epoch)
                self.data_loader.ensure_cached(batches)
                progress.next_epoch()
                continue

            self.callbacks.on_update_status(f"training epoch {epoch}")
            for batch_np in self.data_loader.iter_epoch(epoch, start_batch):
                if self.commands.get_stop_command():
                    self._flush_pending_metrics()
                    return

                if self._needs("sample", config.sample_after,
                               config.sample_after_unit) \
                        or self.commands.get_and_reset_sample_default_command():
                    if not self.single_action_elapsed(
                            "sample_skip_first", config.sample_skip_first,
                            config.sample_after_unit, progress) \
                            and config.sample_skip_first > 0:
                        pass
                    else:
                        self._sample_during_training()

                custom_cmds = \
                    self.commands.get_and_reset_sample_custom_commands()
                if custom_cmds:
                    self._sample_during_training(custom_samples=custom_cmds)

                if self._needs("backup", config.backup_after,
                               config.backup_after_unit) \
                        or self.commands.get_and_reset_backup_command():
                    self._flush_pending_metrics()
                    self.backup()

                if config.validation and self._needs(
                        "validate", config.validate_after,
                        config.validate_after_unit, start_at_zero=False):
                    self._flush_pending_metrics()
                    self._validate()

                if config.save_every_unit != TimeUnit.NEVER and \
                        self._needs("save", config.save_every, config.save_every_unit) \
                        and self.single_action_elapsed(
                            "save_skip_first", config.save_skip_first,
                            config.save_every_unit, progress) \
                        or self.commands.get_and_reset_save_command():
                    from onetrainer_tpu.util.path_util import (
                        get_string_timestamp,
                    )
                    prefix = config.save_filename_prefix
                    dest = os.path.join(
                        config.workspace_dir, "save",
                        f"{prefix}{get_string_timestamp()}-save-"
                        f"{progress.filename_string()}")
                    os.makedirs(os.path.dirname(dest), exist_ok=True)
                    self.save(dest)

                if self.mesh is not None:
                    from onetrainer_tpu.parallel.mesh import (
                        process_batch_slice, shard_batch,
                    )
                    if jax.process_count() > 1:
                        # multi-host: every host plans the same epoch
                        # (deterministic seeds) but ships only its slice
                        sl = process_batch_slice(config.batch_size)
                        batch_np = {k: v[sl] for k, v in batch_np.items()}
                    batch = shard_batch(batch_np, self.mesh)
                else:
                    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
                self.setup.state, metrics = train_step(
                    self.setup.state, self.setup.frozen, batch, rng)

                if config.debug_mode:
                    self._debug_dump(batch)

                profiler.maybe_start(progress.global_step)
                # pipelined metrics: step N's loss is read here on a
                # later iteration, after the next step is already
                # dispatched — the host never blocks between fetch and
                # dispatch
                self._pending_metrics.append((metrics, progress.global_step))
                self._flush_pending_metrics(keep=self._metrics_lag)
                profiler.maybe_stop(progress.global_step)
                progress.next_step(config.batch_size)
                self.callbacks.on_update_train_progress(
                    progress, len(self.data_loader), config.epochs)

            self._flush_pending_metrics()
            progress.next_epoch()
        profiler.close()

    def _debug_dump(self, batch):
        """Per-step decoded artifact dumps when config.debug_mode is on
        (reference: ModelSetupDebugMixin.py:11-69, config.debug_dir)."""
        try:
            if not hasattr(self, "_debug_data_fn"):
                from onetrainer_tpu.setup.families import make_debug_data
                self._debug_data_fn = make_debug_data(
                    self.setup, self.family.name)
            if self._debug_data_fn is None:
                return
            from onetrainer_tpu.util.debug_dump import dump_training_batch
            data = self._debug_data_fn(batch)
            dump_training_batch(
                data, {k: np.asarray(v) for k, v in batch.items()},
                self.config.debug_dir or os.path.join(
                    self.config.workspace_dir, "debug"),
                self.train_progress.global_step)
        except Exception:
            traceback.print_exc()

    def _flush_pending_metrics(self, keep: int = 0):
        """Materialize + log queued step metrics down to `keep` pending
        (pipelined loop: the host reads step N's loss only after later
        steps are dispatched, so H2D transfer and dispatch overlap device
        compute instead of serializing behind a per-step float() sync)."""
        while len(self._pending_metrics) > keep:
            metrics, step = self._pending_metrics.pop(0)
            self._log_metrics(float(metrics["loss"]), metrics, step=step)

    def _log_metrics(self, loss: float, metrics: dict, step: int | None = None):
        progress = self.train_progress
        if step is None:
            step = progress.global_step
        if self._loss_ema is None:
            self._loss_ema = loss
        decay = min(0.99, 1 - 1 / (step + 1))
        self._loss_ema = self._loss_ema * decay + loss * (1 - decay)
        if not self.tensorboard:
            return
        self.tensorboard.add_scalar("loss/train_step", loss, step)
        self.tensorboard.add_scalar("smooth_loss/train_step", self._loss_ema, step)
        # per-group lr/* with adaptive-d adjustment, plus ema_decay
        # (reference: BaseModelSetup.report_to_tensorboard:96-119,
        # GenericTrainer.py:725-748)
        opt_step = step // max(self.config.gradient_accumulation_steps, 1)
        d = None
        if self.config.optimizer.optimizer.is_adaptive():
            d = _adaptive_d(self.setup.state.opt_state)
        for name, schedule in getattr(self.setup, "group_schedules", {}).items():
            try:
                lr = float(schedule(opt_step)) if callable(schedule) else float(schedule)
            except Exception:
                continue
            if d is not None:
                lr *= d
            self.tensorboard.add_scalar(f"lr/{name}", lr, step)
        if step % 50 == 0:
            from onetrainer_tpu.util.profiling import device_memory_stats
            for tag, value in device_memory_stats().items():
                self.tensorboard.add_scalar(tag, value, step)
        state = self.setup.state
        if state.ema is not None:
            from onetrainer_tpu.train.ema import ema_decay as _ema_decay
            self.tensorboard.add_scalar(
                "ema_decay",
                float(_ema_decay(state.ema.step, self.config.ema_decay)), step)

    def end(self):
        try:
            if self.config.backup_before_save:
                self.backup()
            dest = self.config.output_model_destination
            if os.path.isdir(dest) and \
                    self.config.output_model_format.is_single_file():
                # the reference drops a timestamped file INTO an existing
                # directory destination (GenericTrainer.py:780-784)
                from onetrainer_tpu.util.path_util import (
                    get_string_timestamp,
                )
                dest = os.path.join(
                    dest,
                    f"{self.config.save_filename_prefix}"
                    f"{get_string_timestamp()}"
                    f"{self.config.output_model_format.file_extension()}")
            self.save(dest, raise_on_error=True)
        finally:
            if self.tensorboard:
                self.tensorboard.close()
            self._stop_tensorboard()
