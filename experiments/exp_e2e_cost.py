"""Cost-analysis + blocked-timing probe for the SHIPPED trainer's SDXL step.

The queue6 e2e row (11.0 imgs/sec from TB wall-time gaps, 0.363 s/step)
is ABOVE the measured roofline floors of the bench headline workload
(bench: 5.01 imgs/sec = 0.798 s/step; floor_bw 497 ms, floor_mxu 580 ms)
— so either the trainer compiles a lighter step than bench.py, or TB
wall-time gaps do not measure device completion. This builds the exact
trainer (GenericTrainer.start(), same factory path as scripts/train.py),
prints the compiled step's XLA cost analysis, and times steps with
block_until_ready for ground truth.

Usage: python experiments/exp_e2e_cost.py
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from onetrainer_tpu.util.platform import (  # noqa: E402
    enable_compile_cache, maybe_force_platform,
)
maybe_force_platform()
enable_compile_cache()


def main():
    import jax
    import jax.numpy as jnp

    from onetrainer_tpu.config.train_config import TrainConfig
    from onetrainer_tpu.trainer.generic_trainer import GenericTrainer

    config = TrainConfig.default_values().from_dict(
        json.load(open("/root/e2e_sdxl/config.json")))
    config.tensorboard = False
    trainer = GenericTrainer(config)
    trainer.start()

    loader, setup = trainer.data_loader, trainer.setup
    batches = loader.batches_for_epoch(0)
    loader.ensure_cached(batches[:1])
    batch = {k: jnp.asarray(v)
             for k, v in loader.materialize_batch(batches[0]).items()}
    rng = jax.random.PRNGKey(42)

    lowered = setup.train_step.lower(setup.state, setup.frozen, batch, rng)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    out = {
        "flops_T": round(float(ca.get("flops", 0)) / 1e12, 2),
        "bytes_GB": round(float(ca.get("bytes accessed", 0)) / 1e9, 1),
    }

    state = setup.state
    state, metrics = setup.train_step(state, setup.frozen, batch, rng)
    jax.block_until_ready(metrics["loss"])
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        state, metrics = setup.train_step(state, setup.frozen, batch, rng)
    jax.block_until_ready(metrics["loss"])
    dt = (time.perf_counter() - t0) / n
    out["sec_per_step_blocked"] = round(dt, 4)
    out["imgs_per_sec_blocked"] = round(config.batch_size / dt, 3)
    out["loss"] = round(float(metrics["loss"]), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
