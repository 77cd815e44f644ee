"""Platform selection helper.

The TPU container's sitecustomize force-registers the axon PJRT plugin
and prepends it to jax_platforms, so the JAX_PLATFORMS env var alone
cannot select the CPU backend. Scripts call maybe_force_platform() before
first backend use; OT_PLATFORM=cpu (or tpu) wins."""

from __future__ import annotations

import os


def maybe_force_platform():
    platform = os.environ.get("OT_PLATFORM")
    if platform:
        import jax
        jax.config.update("jax_platforms", platform)


def enable_compile_cache(default_dir: str | None = None):
    """Persistent XLA compile cache for the CLI entry points.

    A cold SDXL-class train-step compile costs 10-20 minutes through the
    remote-compile helper; without a persistent cache EVERY
    scripts/train.py invocation pays it again (the reference has no
    equivalent cost — torch eager — so this is a TPU-framework concern,
    not a ported behavior). Honors JAX_COMPILATION_CACHE_DIR if the user
    set one; OT_COMPILE_CACHE overrides; OT_COMPILE_CACHE=0 disables.
    """
    cache = os.environ.get("OT_COMPILE_CACHE")
    if cache == "0":
        return
    if not cache:
        cache = os.environ.get("JAX_COMPILATION_CACHE_DIR") or default_dir \
            or os.path.join(os.path.expanduser("~"), ".cache",
                            "onetrainer_tpu", "jax_cache")
    os.makedirs(cache, exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
