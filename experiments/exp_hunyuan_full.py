"""HunyuanVideo FULL-SCALE single-chip LoRA throughput.

Real HunyuanVideo dimensions (20 double + 40 single blocks, hidden 3072,
24 heads x d128 ~= 12.7B transformer params; reference config:
modules/model/HunyuanVideoModel.py + diffusers transformer defaults)
with a quantized frozen base + scan-over-layers + flash attention —
the same recipe that fits FLUX-dev 12B on one 16 GB v5e
(experiments/exp_flux_dev.py). bf16 weights alone (~25 GB) exceed HBM,
so the base is built DIRECTLY in quantized form: one double + one
single block initialized in bf16, quantized per tensor, replicated
along the leading layer axis into the scan-stacked layout.

Usage: python experiments/exp_hunyuan_full.py [nf4|int8|fp8] [frames] [res]
Prints one JSON line; on OOM prints the error instead.
"""
from __future__ import annotations

import json
import sys
import time


def main():
    quant = sys.argv[1] if len(sys.argv) > 1 else "nf4"
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 9   # latent frames
    res = int(sys.argv[3]) if len(sys.argv) > 3 else 512

    import os
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax

    from onetrainer_tpu.math.losses import LossConfig
    from onetrainer_tpu.math.timesteps import TimestepConfig
    from onetrainer_tpu.models.hunyuan_video import (
        HunyuanVideoConfig, HunyuanVideoTransformer3D,
    )
    from onetrainer_tpu.ops.quant import quantize_tree
    from onetrainer_tpu.peft.lora import PeftConfig, init_peft_params
    from onetrainer_tpu.train.hunyuan_train_step import make_hunyuan_train_step
    from onetrainer_tpu.train.sd_train_step import SDStepConfig
    from onetrainer_tpu.train.train_state import create_train_state
    from onetrainer_tpu.util.enums import TrainingMethod

    bs = 1
    lat = res // 8
    L_DOUBLE, L_SINGLE = 20, 40
    base_kwargs = dict(
        num_refiner_layers=2, hidden_size=3072, num_heads=24, head_dim=128,
        text_embed_dim=4096, pooled_projection_dim=768,
        gradient_checkpointing=True, remat_policy="full", dtype=jnp.bfloat16)

    # one layer of each kind -> quantize -> replicate along the layer axis
    small = HunyuanVideoTransformer3D(HunyuanVideoConfig(
        num_layers=1, num_single_layers=1, **base_kwargs))
    rng = jax.random.PRNGKey(0)
    params1 = jax.jit(lambda r: small.init(
        r, jnp.zeros((1, 1, 8, 8, 16), jnp.bfloat16), jnp.asarray([500.0]),
        jnp.zeros((1, 8, 4096), jnp.bfloat16), jnp.ones((1, 8), jnp.int32),
        jnp.zeros((1, 768), jnp.bfloat16)))(rng)["params"]
    params1 = dict(params1)
    double_tpl = params1.pop("transformer_blocks_0")
    single_tpl = params1.pop("single_transformer_blocks_0")

    qdtype = {"fp8": jnp.float8_e4m3fn, "int8": jnp.int8, "nf4": "nf4"}[quant]

    def stack_quantized(tpl, n):
        q = quantize_tree(tpl, qdtype)
        return jax.tree.map(
            lambda x: jnp.repeat(jnp.asarray(x)[None], n, axis=0), q)

    def stack_shapes(tpl, n):
        return jax.tree.map(
            lambda x: jax.ShapeDtypeStruct((n,) + jnp.shape(x), x.dtype), tpl)

    params = dict(quantize_tree(params1, qdtype))
    params["transformer_blocks"] = {
        "block": stack_quantized(double_tpl, L_DOUBLE)}
    params["single_transformer_blocks"] = {
        "block": stack_quantized(single_tpl, L_SINGLE)}

    shape_tree = dict(jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), x.dtype), params1))
    shape_tree["transformer_blocks"] = {
        "block": stack_shapes(double_tpl, L_DOUBLE)}
    shape_tree["single_transformer_blocks"] = {
        "block": stack_shapes(single_tpl, L_SINGLE)}
    peft_cfg = PeftConfig(rank=16, alpha=16.0)
    adapters = init_peft_params(jax.random.PRNGKey(1), shape_tree, peft_cfg)

    class _Model:
        pass

    model = _Model()
    model.transformer = HunyuanVideoTransformer3D(HunyuanVideoConfig(
        num_layers=L_DOUBLE, num_single_layers=L_SINGLE, scan_layers=True,
        **base_kwargs))

    cfg = SDStepConfig(
        training_method=TrainingMethod.LORA, timestep=TimestepConfig(),
        loss=LossConfig(vb_loss_strength=0.0, batch_size=bs),
        stochastic_rounding=False)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-4))
    state = create_train_state({"transformer_lora": adapters}, tx)
    step = make_hunyuan_train_step(model, cfg, tx, peft_cfg)
    frozen = {"transformer": params}
    batch = {
        "latent_image": jax.random.normal(
            jax.random.PRNGKey(2), (bs, frames, lat, lat, 16), jnp.bfloat16),
        "loss_weight": jnp.ones((bs,)),
        "text_encoder_1_hidden_state": jax.random.normal(
            jax.random.PRNGKey(3), (bs, 77, 4096), jnp.bfloat16),
        "tokens_mask_1": jnp.ones((bs, 77), jnp.int32),
        "text_encoder_2_pooled_state": jax.random.normal(
            jax.random.PRNGKey(4), (bs, 768), jnp.bfloat16),
    }
    try:
        stats = jax.devices()[0].memory_stats()
        print(json.dumps({"pre_step_hbm_gb": round(
            stats.get("bytes_in_use", 0) / 1e9, 2)}), flush=True)
    except Exception:
        pass
    flops = hbm_bytes = None
    t0 = time.perf_counter()
    try:
        # util/roofline context (VERDICT r3 weak #6); XLA cost analysis
        # excludes Pallas custom calls (flash, NF4 dequant) -> understated
        try:
            analysis = step.lower(state, frozen, batch,
                                  jax.random.PRNGKey(6)).compile() \
                .cost_analysis()
            if isinstance(analysis, list):
                analysis = analysis[0]
            flops = float(analysis.get("flops", 0)) or None
            hbm_bytes = float(analysis.get("bytes accessed", 0)) or None
        except Exception:
            pass
        state, metrics = step(state, frozen, batch, jax.random.PRNGKey(6))
        float(metrics["loss"])
    except Exception as e:
        import traceback
        traceback.print_exc()
        print(json.dumps({
            "workload": f"hunyuan_full_lora_{res}px_f{frames}_bs{bs}_{quant}",
            "oom_or_error": str(e)[:500]}))
        return
    compile_s = time.perf_counter() - t0
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = step(state, frozen, batch, jax.random.PRNGKey(6))
    float(metrics["loss"])
    elapsed = time.perf_counter() - t0
    tokens = frames * (lat // 2) * (lat // 2)
    out = {
        "workload": f"hunyuan_full_lora_{res}px_f{frames}_bs{bs}_{quant}",
        "video_tokens": tokens,
        "samples_per_sec": round(bs * n / elapsed, 3),
        "sec_per_step": round(elapsed / n, 3),
        "compile_s": round(compile_s, 1),
    }
    # analytic FLOPs (xla cost_analysis counts a lax.scan body once and
    # skips Pallas custom calls): fwd 2PT + bwd-dX 2PT + remat
    # re-forward 2PT = 6PT over the joint video+text stream.
    p_active = 12.7e9
    seq = tokens + 77
    analytic_flops = 6 * p_active * seq
    out["analytic_tflops_per_sample"] = round(analytic_flops / 1e12, 1)
    out["analytic_hw_flop_util_v5e"] = round(
        analytic_flops * (bs * n / elapsed) / 197e12, 3)
    if flops:
        out["xla_tflops_per_sample_scanbody_once"] = round(
            flops / bs / 1e12, 1)
    if hbm_bytes:
        out["xla_bytes_per_step_gb"] = round(hbm_bytes / 1e9, 1)
        out["hbm_roofline_fraction"] = round(
            (hbm_bytes / 819e9) / (elapsed / n), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
