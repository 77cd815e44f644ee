import os

# Tests run on a virtual 8-device CPU mesh so sharding logic is exercised
# without TPU hardware. The container's sitecustomize force-registers the
# axon TPU plugin and prepends it to jax_platforms, so setting the env var
# is not enough — override the config before any backend initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
