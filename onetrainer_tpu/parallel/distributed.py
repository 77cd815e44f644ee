"""Multi-host runtime bootstrap.

The reference has no communication backend at all (SURVEY.md §2.17 —
its multi-machine story is CloudTrainer shipping the whole job to one
remote GPU). Here multi-host scaling is the JAX runtime: every host
calls `jax.distributed.initialize`, after which `jax.devices()` spans
the slice/pod, the ("data","fsdp","sp") mesh covers all chips, and the
data pipeline feeds per-process batch slices
(`mesh.process_batch_slice` + `make_array_from_process_local_data`).

Configuration comes from the standard launcher env (TPU pods populate
everything automatically; explicit vars override for DCN/GPU-style
launches):

  OT_COORDINATOR       coordinator address host:port (optional on TPU)
  OT_NUM_PROCESSES     total process count (optional on TPU)
  OT_PROCESS_ID        this host's index (optional on TPU)

Call `maybe_initialize_distributed()` once, before any other jax API
touches the backend. Single-host runs (no env set, one process) are a
no-op — the common path stays zero-config.
"""

from __future__ import annotations

import os

_initialized = False


def distributed_env() -> dict | None:
    """The explicit multi-host settings, or None when unset.

    Returns kwargs for jax.distributed.initialize. On TPU pods the
    runtime discovers everything from the metadata server, so
    OT_MULTIHOST=1 alone requests a bare initialize()."""
    if os.environ.get("OT_COORDINATOR"):
        missing = [v for v in ("OT_NUM_PROCESSES", "OT_PROCESS_ID")
                   if v not in os.environ]
        if missing:
            raise ValueError(
                f"OT_COORDINATOR is set but {', '.join(missing)} "
                f"missing — explicit multi-host launches need all three; "
                f"on TPU pods use OT_MULTIHOST=1 instead (the runtime "
                f"discovers topology itself)")
        kwargs = {
            "coordinator_address": os.environ["OT_COORDINATOR"],
            "num_processes": int(os.environ["OT_NUM_PROCESSES"]),
            "process_id": int(os.environ["OT_PROCESS_ID"]),
        }
        # OT_INIT_TIMEOUT (seconds): the default coordination deadline can
        # be too short when peer processes are still compiling/importing
        # on loaded hosts
        if os.environ.get("OT_INIT_TIMEOUT"):
            kwargs["initialization_timeout"] = int(
                os.environ["OT_INIT_TIMEOUT"])
        return kwargs
    if os.environ.get("OT_MULTIHOST") == "1":
        return {}
    return None


def maybe_initialize_distributed() -> bool:
    """Initialize the JAX distributed runtime when configured.

    Must run before the first device access; jax raises otherwise.
    Returns True when the runtime was (already) initialized."""
    global _initialized
    if _initialized:
        return True
    kwargs = distributed_env()
    if kwargs is None:
        return False
    import jax
    jax.distributed.initialize(**kwargs)
    _initialized = True
    print(f"jax.distributed initialized: process {jax.process_index()}"
          f"/{jax.process_count()}, {jax.local_device_count()} local / "
          f"{jax.device_count()} global devices")
    return True
