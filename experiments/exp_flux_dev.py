"""FLUX-dev-SCALE single-chip LoRA throughput (VERDICT r2 weak #3).

Full-dev dimensions (19 double + 38 single blocks, hidden 3072, 24 heads
x d128 ~= 12B params) with a quantized frozen base + scan-over-layers.
bf16 weights alone (24 GB) exceed the v5e's 15.75 GB HBM, so the base is
built DIRECTLY in quantized form: one double + one single block are
initialized in bf16, quantized per tensor, and replicated along the
leading layer axis into the scan-stacked layout (the same format
quantize_tree emits for stacked trees; values repeat across layers,
which is irrelevant for throughput).

Usage: python experiments/exp_flux_dev.py [int8|fp8|nf4] [bs] [t5_len]
Prints one JSON line; on OOM prints the memory analysis instead.
"""
from __future__ import annotations

import json
import sys
import time


def main():
    quant = sys.argv[1] if len(sys.argv) > 1 else "int8"
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    t5_len = int(sys.argv[3]) if len(sys.argv) > 3 else 512

    import os
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax

    from onetrainer_tpu.math.losses import LossConfig
    from onetrainer_tpu.math.timesteps import TimestepConfig
    from onetrainer_tpu.models.flux import (
        FluxConfig, FluxTransformer2D, prepare_latent_image_ids,
    )
    from onetrainer_tpu.ops.quant import quantize_tree
    from onetrainer_tpu.peft.lora import PeftConfig, init_peft_params
    from onetrainer_tpu.train.flux_train_step import make_flux_train_step
    from onetrainer_tpu.train.sd_train_step import SDStepConfig
    from onetrainer_tpu.train.train_state import create_train_state
    from onetrainer_tpu.util.enums import TrainingMethod

    # OT_EXP_LD/OT_EXP_LS override the block counts for the int8
    # compile-failure depth bisect (full scale: 19 double + 38 single).
    L_DOUBLE = int(os.environ.get("OT_EXP_LD", 19))
    L_SINGLE = int(os.environ.get("OT_EXP_LS", 38))
    base_kwargs = dict(gradient_checkpointing=True, dtype=jnp.bfloat16)

    # one layer of each kind -> quantize -> replicate along the layer axis
    small = FluxTransformer2D(FluxConfig(
        num_layers=1, num_single_layers=1, **base_kwargs))
    rng = jax.random.PRNGKey(0)
    params1 = jax.jit(lambda r: small.init(
        r, jnp.zeros((1, 16, 64), jnp.bfloat16), jnp.asarray([0.4]),
        jnp.zeros((1, 768), jnp.bfloat16),
        jnp.zeros((1, 6, 4096), jnp.bfloat16),
        prepare_latent_image_ids(8, 8)))(rng)["params"]
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

    # adapter shapes come from the UNquantized stacked template
    shape_tree = dict(jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), x.dtype), params1))
    shape_tree["transformer_blocks"] = {
        "block": stack_shapes(double_tpl, L_DOUBLE)}
    shape_tree["single_transformer_blocks"] = {
        "block": stack_shapes(single_tpl, L_SINGLE)}
    peft_cfg = PeftConfig(rank=16, alpha=16.0)
    adapters = init_peft_params(jax.random.PRNGKey(1), shape_tree, peft_cfg)

    cfgm = FluxConfig(scan_layers=True, num_layers=L_DOUBLE,
                      num_single_layers=L_SINGLE, **base_kwargs)

    class _Model:
        pass

    model = _Model()
    model.transformer = FluxTransformer2D(cfgm)

    h = w = 128   # 1024px latents -> 4096 packed tokens
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
            jax.random.PRNGKey(3), (bs, t5_len, 4096), jnp.bfloat16),
        "clip_pooled_state": jax.random.normal(
            jax.random.PRNGKey(4), (bs, 768), jnp.bfloat16),
    }
    flops = hbm_bytes = None
    t0 = time.perf_counter()
    try:
        # cost analysis BEFORE running: gives FLOPs/bytes for util +
        # roofline context (VERDICT r3 weak #6: the 0.263 imgs/sec row
        # was context-free). NOTE XLA does not count Pallas custom-call
        # FLOPs (flash attention, NF4 dequant), so util is understated.
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
        print(json.dumps({
            "workload": f"flux_dev_lora_1024px_bs{bs}_{quant}_t5{t5_len}",
            "oom_or_error": f"{type(e).__name__}: {e}"[:500]}))
        return
    compile_s = time.perf_counter() - t0
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = step(state, frozen, batch, jax.random.PRNGKey(6))
    float(metrics["loss"])
    elapsed = time.perf_counter() - t0
    out = {
        "workload": f"flux_dev_lora_1024px_bs{bs}_{quant}_t5{t5_len}",
        "imgs_per_sec": round(bs * n / elapsed, 3),
        "sec_per_step": round(elapsed / n, 3),
        "compile_s": round(compile_s, 1),
    }
    sec_per_step = elapsed / n
    # analytic FLOPs: xla cost_analysis counts a lax.scan BODY once (not
    # x n_layers) and skips Pallas custom calls, so under scan it
    # understates by ~50x. Standard training-step estimate instead:
    # fwd 2PT + bwd-dX 2PT (LoRA: no weight grads through the frozen
    # base) + remat re-forward 2PT = 6PT, P = 12B transformer params,
    # T = tokens/img (packed latents + t5).
    tokens = (128 // 2) * (128 // 2) + t5_len
    p_active = 12e9
    analytic_flops_img = 6 * p_active * tokens
    out["analytic_tflops_per_img"] = round(analytic_flops_img / 1e12, 1)
    out["analytic_hw_flop_util_v5e"] = round(
        analytic_flops_img * (bs * n / elapsed) / 197e12, 3)
    if flops:
        out["xla_tflops_per_img_scanbody_once"] = round(flops / bs / 1e12, 1)
    if hbm_bytes:
        out["xla_bytes_per_step_gb"] = round(hbm_bytes / 1e9, 1)
        out["hbm_roofline_fraction"] = round(
            (hbm_bytes / 819e9) / sec_per_step, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
