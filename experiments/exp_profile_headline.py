"""On-device jax.profiler trace of the SDXL headline step (VERDICT r4
next #1: the ~30% non-HBM residual is attributed to "dispatch/occupancy"
without evidence — capture a real trace and decompose it).

Runs bench.py's exact headline stage config, traces a few steady-state
steps, then parses the Perfetto trace.json.gz the profiler dumps:
per-TPU-track busy time vs wall span (inter-kernel gaps), and the top
ops by self time. Prints one JSON line; the raw trace stays under
/tmp/ot_profile for manual Perfetto inspection.

Usage: python experiments/exp_profile_headline.py [bs]
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

OUT = "/tmp/ot_profile"


def _run_and_trace(bs: int):
    sys.path.insert(0, "/root/repo")
    import bench

    jax, jnp, optax = bench._jax_modules()
    # inline _bench_sdxl's setup so the trace brackets ONLY steady steps
    from onetrainer_tpu.math.losses import LossConfig
    from onetrainer_tpu.math.timesteps import TimestepConfig
    from onetrainer_tpu.models.sdxl import create_sdxl_model
    from onetrainer_tpu.ops.quant import quantize_tree
    from onetrainer_tpu.peft.lora import PeftConfig, init_peft_params
    from onetrainer_tpu.train.sd_train_step import SDStepConfig
    from onetrainer_tpu.train.sdxl_train_step import make_sdxl_train_step
    from onetrainer_tpu.train.train_state import create_train_state
    from onetrainer_tpu.util.enums import ModelType, TrainingMethod

    res, lat = 1024, 128
    model = create_sdxl_model(ModelType.STABLE_DIFFUSION_XL_10_BASE,
                              dtype=jnp.bfloat16,
                              gradient_checkpointing=True,
                              remat_policy="tx_only")
    rng = jax.random.PRNGKey(0)
    unet_params = jax.jit(lambda r: model.unet.init(
        r, jnp.zeros((1, lat, lat, 4), jnp.bfloat16), jnp.asarray([1]),
        jnp.zeros((1, 77, 2048), jnp.bfloat16),
        jnp.zeros((1, 1280), jnp.bfloat16),
        jnp.zeros((1, 6), jnp.bfloat16)))(rng)["params"]
    peft_cfg = PeftConfig(rank=16, alpha=16.0)
    adapters = init_peft_params(jax.random.PRNGKey(1), unet_params, peft_cfg)
    cfg = SDStepConfig(
        training_method=TrainingMethod.LORA, timestep=TimestepConfig(),
        loss=LossConfig(vb_loss_strength=0.0, batch_size=bs),
        stochastic_rounding=False)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-4))
    state = create_train_state({"unet_lora": adapters}, tx)
    step = make_sdxl_train_step(model, cfg, tx, peft_cfg)
    unet_params = quantize_tree(unet_params, jnp.float8_e4m3fn)
    frozen = {"unet": unet_params}
    batch = {
        "latent_image": jax.random.normal(
            jax.random.PRNGKey(2), (bs, lat, lat, 4), jnp.bfloat16),
        "loss_weight": jnp.ones((bs,)),
        "text_encoder_hidden_state": jax.random.normal(
            jax.random.PRNGKey(3), (bs, 77, 768), jnp.bfloat16),
        "text_encoder_2_hidden_state": jax.random.normal(
            jax.random.PRNGKey(4), (bs, 77, 1280), jnp.bfloat16),
        "text_encoder_2_pooled_state": jax.random.normal(
            jax.random.PRNGKey(5), (bs, 1280), jnp.bfloat16),
        "original_resolution": jnp.full((bs, 2), res, jnp.int32),
        "crop_offset": jnp.zeros((bs, 2), jnp.int32),
        "crop_resolution": jnp.full((bs, 2), res, jnp.int32),
    }
    # warm up (compile + first exec)
    for _ in range(3):
        state, metrics = step(state, frozen, batch, jax.random.PRNGKey(6))
    float(metrics["loss"])
    jax.profiler.start_trace(OUT)
    for _ in range(4):
        state, metrics = step(state, frozen, batch, jax.random.PRNGKey(6))
    float(metrics["loss"])
    jax.profiler.stop_trace()


def _analyze():
    paths = glob.glob(os.path.join(
        OUT, "plugins/profile/*/*trace.json.gz"))
    if not paths:
        return {"error": f"no trace.json.gz under {OUT}"}
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # map process/thread ids to names to find the TPU device tracks
    pnames, tnames = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    device_pids = {pid for pid, n in pnames.items()
                   if "TPU" in n or "/device" in n.lower()}
    per_track = defaultdict(lambda: {"busy": 0.0, "t0": None, "t1": None,
                                     "n": 0})
    op_self = defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        tid = (e["pid"], e.get("tid"))
        tr = per_track[tnames.get(tid, str(tid))]
        ts, dur = e.get("ts", 0.0), e.get("dur", 0.0)
        tr["busy"] += dur
        tr["n"] += 1
        tr["t0"] = ts if tr["t0"] is None else min(tr["t0"], ts)
        tr["t1"] = (ts + dur if tr["t1"] is None
                    else max(tr["t1"], ts + dur))
        op_self[e.get("name", "?")] += dur
    tracks = {}
    for name, tr in per_track.items():
        span = (tr["t1"] - tr["t0"]) if tr["t0"] is not None else 0.0
        tracks[name] = {
            "busy_ms": round(tr["busy"] / 1e3, 2),
            "span_ms": round(span / 1e3, 2),
            "gap_ms": round((span - tr["busy"]) / 1e3, 2),
            "occupancy": round(tr["busy"] / span, 3) if span else None,
            "events": tr["n"],
        }
    top = sorted(op_self.items(), key=lambda kv: -kv[1])[:25]
    return {
        "trace": path,
        "tracks": tracks,
        "top_ops_ms": {k[:80]: round(v / 1e3, 2) for k, v in top},
    }


if __name__ == "__main__":
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    _run_and_trace(bs)
    print(json.dumps(_analyze()))
