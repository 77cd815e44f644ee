"""End-to-end `scripts/train.py` TPU throughput (VERDICT r3 weak #7 /
next #6): measure the SHIPPED trainer — data loader threads, callbacks,
timed actions, TB writes — on the bench's headline workload (SDXL LoRA
r16 @1024, fp8 frozen base, cached latents/text) and bound the
pipeline/callback overhead against the synthetic bench number.

Stages (run each in a fresh process):
  prep   — write a full-size random-weight SDXL diffusers checkpoint
           (shapes via jax.eval_shape, no device compute) + a 64-image
           1024px dataset + the train config JSON under /root/e2e_sdxl.
  train  — run `scripts/train.py --config-path /root/e2e_sdxl/config.json`
           on the TPU (epochs sized for ~200 steady-state steps).
  parse  — read the TB event file wall-times of loss/train_step and
           print steady-state steps/sec + imgs/sec (drops epoch-boundary
           and compile steps by excluding the slowest 5%% of gaps).

The measured row lands in BASELINE.md; the reference workload being
vouched for is GenericTrainer's loop
(/root/reference/modules/trainer/GenericTrainer.py:568-764).
"""
from __future__ import annotations

import json
import os
import sys

ROOT = "/root/e2e_sdxl"
BS = 4
RES = 1024
N_IMAGES = 64
EPOCHS = 14   # 64/4 = 16 steps/epoch -> 224 steps total, ~200 steady


def _np_tree(shapes, rng, scale=0.02):
    import numpy as np
    import jax
    leaves, treedef = jax.tree.flatten(shapes)
    out = []
    for leaf in leaves:
        arr = (rng.standard_normal(leaf.shape, dtype=np.float32) * scale)
        out.append(arr.astype(np.float16))
    return jax.tree.unflatten(treedef, out)


def prep():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    import numpy as np
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from onetrainer_tpu.io.safetensors_io import save_safetensors
    from onetrainer_tpu.io.torch_flax import (
        clip_flax_to_state_dict, unet_flax_to_state_dict,
        vae_flax_to_state_dict,
    )
    from onetrainer_tpu.models.sdxl import create_sdxl_model
    from onetrainer_tpu.util.enums import ModelType

    model = create_sdxl_model(ModelType.STABLE_DIFFUSION_XL_10_BASE,
                              dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    lat = RES // 8

    # shapes only — no init compute for the 2.6B UNet
    unet_shapes = jax.eval_shape(
        lambda r: model.unet.init(
            r, jnp.zeros((1, lat, lat, 4), jnp.bfloat16), jnp.asarray([1]),
            jnp.zeros((1, 77, 2048), jnp.bfloat16),
            jnp.zeros((1, 1280), jnp.bfloat16),
            jnp.zeros((1, 6), jnp.bfloat16))["params"], rng)
    vae_shapes = jax.eval_shape(
        lambda r: model.vae.init(r, jnp.zeros((1, 64, 64, 3), jnp.bfloat16),
                                 r)["params"], rng)
    te_shapes = jax.eval_shape(
        lambda r: model.text_encoder.init(
            r, jnp.zeros((1, 8), jnp.int32))["params"], rng)
    te2_shapes = jax.eval_shape(
        lambda r: model.text_encoder_2.init(
            r, jnp.zeros((1, 8), jnp.int32))["params"], rng)

    nrng = np.random.default_rng(0)
    base = os.path.join(ROOT, "ckpt")

    def write(component, sd, config,
              weights_name="diffusion_pytorch_model.safetensors"):
        d = os.path.join(base, component)
        os.makedirs(d, exist_ok=True)
        save_safetensors(os.path.join(d, weights_name), sd, {"format": "pt"})
        with open(os.path.join(d, "config.json"), "w") as f:
            json.dump(config, f)

    print("writing unet ...")
    write("unet", unet_flax_to_state_dict(_np_tree(unet_shapes, nrng)), {
        "in_channels": 4, "out_channels": 4,
        "block_out_channels": [320, 640, 1280],
        "down_block_types": ["DownBlock2D", "CrossAttnDownBlock2D",
                             "CrossAttnDownBlock2D"],
        "layers_per_block": 2,
        "transformer_layers_per_block": [1, 2, 10],
        "attention_head_dim": [5, 10, 20],
        "cross_attention_dim": 2048,
        "use_linear_projection": True,
        "addition_time_embed_dim": 256,
        "projection_class_embeddings_input_dim": 2816,
    })
    print("writing vae ...")
    write("vae", vae_flax_to_state_dict(_np_tree(vae_shapes, nrng)), {
        "in_channels": 3, "out_channels": 3, "latent_channels": 4,
        "block_out_channels": [128, 256, 512, 512], "layers_per_block": 2,
        "scaling_factor": 0.13025,
    })
    print("writing text encoders ...")
    write("text_encoder", clip_flax_to_state_dict(_np_tree(te_shapes, nrng)),
          {"vocab_size": 49408, "hidden_size": 768,
           "intermediate_size": 3072, "num_hidden_layers": 12,
           "num_attention_heads": 12, "max_position_embeddings": 77,
           "hidden_act": "quick_gelu", "eos_token_id": 49407},
          weights_name="model.safetensors")
    write("text_encoder_2",
          clip_flax_to_state_dict(_np_tree(te2_shapes, nrng)),
          {"vocab_size": 49408, "hidden_size": 1280,
           "intermediate_size": 5120, "num_hidden_layers": 32,
           "num_attention_heads": 20, "max_position_embeddings": 77,
           "hidden_act": "gelu", "eos_token_id": 49407,
           "projection_dim": 1280,
           "architectures": ["CLIPTextModelWithProjection"]},
          weights_name="model.safetensors")
    os.makedirs(os.path.join(base, "scheduler"), exist_ok=True)
    with open(os.path.join(base, "scheduler", "scheduler_config.json"),
              "w") as f:
        json.dump({"prediction_type": "epsilon",
                   "beta_schedule": "scaled_linear"}, f)

    print("writing dataset ...")
    ds = os.path.join(ROOT, "data")
    os.makedirs(ds, exist_ok=True)
    for i in range(N_IMAGES):
        arr = (nrng.random((RES, RES, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(ds, f"img{i}.jpg"),
                                  quality=90)
        with open(os.path.join(ds, f"img{i}.txt"), "w") as f:
            f.write(f"a synthetic calibration image number {i}, noise")

    from onetrainer_tpu.config.concept_config import ConceptConfig
    from onetrainer_tpu.config.train_config import TrainConfig
    from onetrainer_tpu.util.enums import DataType, EMAMode, TimeUnit

    config = TrainConfig.default_values()
    config.model_type = ModelType.STABLE_DIFFUSION_XL_10_BASE
    from onetrainer_tpu.util.enums import TrainingMethod
    config.training_method = TrainingMethod.LORA
    config.base_model_name = base
    config.workspace_dir = os.path.join(ROOT, "ws")
    config.cache_dir = os.path.join(ROOT, "cache")
    config.epochs = EPOCHS
    config.batch_size = BS
    config.resolution = str(RES)
    config.aspect_ratio_bucketing = False
    config.lora_rank = 16
    config.lora_alpha = 16.0
    config.learning_rate = 1e-4
    config.learning_rate_warmup_steps = 0.0
    config.tensorboard = True           # part of the measured overhead
    config.sample_after_unit = TimeUnit.NEVER
    config.backup_after_unit = TimeUnit.NEVER
    config.save_every_unit = TimeUnit.NEVER
    config.ema = EMAMode.OFF
    config.optimizer.stochastic_rounding = False
    config.unet.train = True
    config.unet.weight_dtype = DataType.FLOAT_8   # bench headline config
    config.text_encoder.train = False
    config.text_encoder_2.train = False
    config.latent_caching = True
    config.samples = []
    concept = ConceptConfig.default_values()
    concept.path = ds
    concept.seed = 42
    config.concepts = [concept]
    config.output_model_destination = os.path.join(ROOT, "out_lora.safetensors")
    config.backup_before_save = False
    with open(os.path.join(ROOT, "config.json"), "w") as f:
        json.dump(config.to_dict(), f)
    print("prep done:", os.path.join(ROOT, "config.json"))


def parse():
    """Steady-state throughput from the TB event wall-times."""
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )
    tb_dir = None
    ws = os.path.join(ROOT, "ws")
    for cand in ("tensorboard", "tb", "logs"):
        p = os.path.join(ws, cand)
        if os.path.isdir(p):
            tb_dir = p
            break
    if tb_dir is None:
        tb_dir = ws
    acc = EventAccumulator(tb_dir)
    acc.Reload()
    events = acc.Scalars("loss/train_step")
    times = [e.wall_time for e in events]
    if len(times) < 20:
        print(json.dumps({"error": f"only {len(times)} steps logged"}))
        return
    import numpy as np
    gaps = np.diff(times)
    # drop epoch boundaries / stragglers: keep the fastest 95%
    keep = gaps[gaps <= np.quantile(gaps, 0.95)]
    sec_per_step = float(np.median(keep))
    print(json.dumps({
        "steps_logged": len(times),
        "median_sec_per_step": round(sec_per_step, 4),
        "mean_kept_sec_per_step": round(float(keep.mean()), 4),
        "imgs_per_sec": round(BS / sec_per_step, 3),
        "imgs_per_sec_mean": round(BS / float(keep.mean()), 3),
        "p95_tail_overhead_pct": round(
            100 * (gaps.sum() - keep.sum()) / gaps.sum(), 1),
    }))


if __name__ == "__main__":
    {"prep": prep, "parse": parse}[sys.argv[1]]()
