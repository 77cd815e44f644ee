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
