"""Worker for the 2-process distributed test (tests/test_distributed.py).

Launched with OT_COORDINATOR / OT_NUM_PROCESSES / OT_PROCESS_ID set (or
none of them for the single-process control run) and a CPU device farm
via XLA_FLAGS. Runs one deterministic tiny-SD LoRA step over the global
("data","fsdp") mesh with per-process input slices and prints the loss.

This is the code path a real TPU pod hits: every host feeds only its
slice of the global batch (mesh.process_batch_slice), and
jax.make_array_from_process_local_data assembles the global array
(mesh.shard_batch's process_count > 1 branch).
"""
import json
import os
import sys

# persistent compile cache: on the 1-core CI box both workers compile the
# same program; cache hits keep their first-collective times within the
# gloo context-init deadline. Keyed by host CPU features like
# tests/conftest.py — a stale entry from a different CI host fails to
# load (cpu_aot_loader machine-feature mismatch) and flaked this test.
from tests.conftest import _cpu_feature_tag  # noqa: E402 (sets XLA_FLAGS too)

_cache = f"/tmp/ot_cpu_cache-{_cpu_feature_tag()}"
os.makedirs(_cache, exist_ok=True)
import jax
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from onetrainer_tpu.parallel.distributed import maybe_initialize_distributed

initialized = maybe_initialize_distributed()

import numpy as np  # noqa: E402
import optax  # noqa: E402

from onetrainer_tpu.parallel.mesh import (  # noqa: E402
    create_mesh, process_batch_slice, replicated, shard_batch, shard_params,
)
from onetrainer_tpu.peft.lora import PeftConfig, init_peft_params  # noqa: E402
from onetrainer_tpu.train.sd_train_step import make_sd_train_step  # noqa: E402
from onetrainer_tpu.train.train_state import create_train_state  # noqa: E402
from onetrainer_tpu.util.enums import TrainingMethod  # noqa: E402
from tests.test_train_step import (  # noqa: E402
    _step_cfg, init_model_params, make_batch, tiny_sd_model,
)


def main():
    assert jax.device_count() == 8, jax.device_count()

    model = tiny_sd_model()
    unet_params, te_params = init_model_params(model, jax.random.PRNGKey(0))
    peft = PeftConfig(rank=4, alpha=8.0)
    adapters = init_peft_params(jax.random.PRNGKey(1), unet_params, peft)
    cfg = _step_cfg(TrainingMethod.LORA)
    tx = optax.adamw(1e-3)
    state = create_train_state({"unet_lora": adapters}, tx)
    step = make_sd_train_step(model, cfg, tx, peft)

    mesh = create_mesh(jax.devices(), dp=4, fsdp=2)
    frozen = shard_params(
        {"unet": unet_params, "text_encoder": te_params}, mesh)
    state = jax.device_put(state, replicated(mesh))

    global_batch = {k: np.asarray(v)
                    for k, v in make_batch(0, batch_size=8).items()}
    sl = process_batch_slice(8)
    local = {k: v[sl] for k, v in global_batch.items()}
    batch = shard_batch(local, mesh)

    state, metrics = step(state, frozen, batch, jax.random.PRNGKey(2))
    print(json.dumps({
        "process": jax.process_index(),
        "processes": jax.process_count(),
        "initialized": initialized,
        "loss": float(metrics["loss"]),
        "grad_norm": float(metrics["grad_norm"]),
    }), flush=True)
    if initialized:
        # synchronized exit: without the shutdown barrier the faster
        # process's exit kills the other via the coordination service
        jax.distributed.shutdown()


if __name__ == "__main__":
    sys.exit(main())
