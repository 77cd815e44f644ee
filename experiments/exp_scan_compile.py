"""Compile-time win of scan-over-layers on a mid-size FLUX DiT.

Runs the same LoRA train step with the per-layer loop and with
scan_layers=True (fresh process per mode: pass loop|scan) and reports
trace+compile wall seconds plus step throughput. Persistent compile
cache is disabled so the measurement is honest."""

from __future__ import annotations

import json
import sys
import time


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "scan"

    import jax
    import jax.numpy as jnp
    import optax

    from onetrainer_tpu.io.torch_flax import stack_scanned_blocks
    from onetrainer_tpu.math.losses import LossConfig
    from onetrainer_tpu.math.timesteps import TimestepConfig
    from onetrainer_tpu.models.flux import FluxConfig, FluxTransformer2D
    from onetrainer_tpu.models.flux import prepare_latent_image_ids
    from onetrainer_tpu.peft.lora import PeftConfig, init_peft_params
    from onetrainer_tpu.train.flux_train_step import make_flux_train_step
    from onetrainer_tpu.train.sd_train_step import SDStepConfig
    from onetrainer_tpu.train.train_state import create_train_state
    from onetrainer_tpu.util.enums import TrainingMethod

    cfg_kwargs = dict(
        num_layers=8, num_single_layers=16, hidden_size=1536,
        num_heads=12, head_dim=128, joint_attention_dim=2048,
        pooled_projection_dim=768, gradient_checkpointing=True,
        dtype=jnp.bfloat16)
    scan = mode == "scan"
    cfgm = FluxConfig(scan_layers=scan, **cfg_kwargs)

    class _Model:
        pass

    model = _Model()
    model.transformer = FluxTransformer2D(cfgm)

    h = w = 128   # 1024px latents
    bs = 2
    ids = prepare_latent_image_ids(h, w)
    rng = jax.random.PRNGKey(0)
    init_model = FluxTransformer2D(FluxConfig(scan_layers=False, **cfg_kwargs))
    t0 = time.perf_counter()
    params = jax.jit(lambda r: init_model.init(
        r, jnp.zeros((1, 16, 64), jnp.bfloat16), jnp.asarray([0.4]),
        jnp.zeros((1, 768), jnp.bfloat16), jnp.zeros((1, 6, 2048), jnp.bfloat16),
        prepare_latent_image_ids(8, 8)))(rng)["params"]
    init_s = time.perf_counter() - t0
    if scan:
        params = dict(jax.device_get(params))
        stack_scanned_blocks(params, "transformer_blocks")
        stack_scanned_blocks(params, "single_transformer_blocks")
        params = jax.tree.map(jnp.asarray, params)

    peft_cfg = PeftConfig(rank=16, alpha=16.0)
    adapters = init_peft_params(jax.random.PRNGKey(1), params, peft_cfg)
    cfg = SDStepConfig(
        training_method=TrainingMethod.LORA, timestep=TimestepConfig(),
        loss=LossConfig(vb_loss_strength=0.0, batch_size=bs),
        stochastic_rounding=False)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-4))
    state = create_train_state({"transformer_lora": adapters}, tx)
    step = make_flux_train_step(model, cfg, tx, peft_cfg)
    frozen = {"transformer": params}
    batch = {
        "latent_image": jax.random.normal(
            jax.random.PRNGKey(2), (bs, h, w, 16), jnp.bfloat16),
        "loss_weight": jnp.ones((bs,)),
        "t5_hidden_state": jax.random.normal(
            jax.random.PRNGKey(3), (bs, 77, 2048), jnp.bfloat16),
        "clip_pooled_state": jax.random.normal(
            jax.random.PRNGKey(4), (bs, 768), jnp.bfloat16),
    }
    t0 = time.perf_counter()
    lowered = step.lower(state, frozen, batch, jax.random.PRNGKey(6))
    trace_s = time.perf_counter() - t0
    hlo_chars = len(lowered.as_text())
    t0 = time.perf_counter()
    compiled = lowered.compile()
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    state, metrics = compiled(state, frozen, batch, jax.random.PRNGKey(6))
    float(metrics["loss"])
    first_step_s = time.perf_counter() - t0
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = compiled(state, frozen, batch, jax.random.PRNGKey(6))
    float(metrics["loss"])
    ips = bs * n / (time.perf_counter() - t0)
    print(json.dumps({
        "mode": mode, "trace_s": round(trace_s, 1),
        "compile_s": round(compile_s, 1), "hlo_mb": round(hlo_chars / 1e6, 1),
        "first_step_s": round(first_step_s, 2),
        "imgs_per_sec": round(ips, 3), "init_s": round(init_s, 1)}))


if __name__ == "__main__":
    main()
