import os

# Tests run on a virtual 8-device CPU mesh so sharding logic is exercised
# without TPU hardware. The container's sitecustomize force-registers the
# axon TPU plugin and prepends it to jax_platforms, so setting the env var
# is not enough — override the config before any backend initializes.
"""OT_TEST_TPU=1 escapes the CPU farm so the TPU-only tests (flash
attention exactness etc., skipif backend != tpu) run on real hardware."""
if os.environ.get("OT_TEST_TPU") == "1":
    import jax
else:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")

# persistent XLA compilation cache: tiny-model compiles dominate the suite
# runtime on the single-core CI box; cache them across tests and runs
import pathlib
_cache_dir = pathlib.Path(__file__).parent.parent / ".jax_cache_tests"
_cache_dir.mkdir(exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(_cache_dir))
jax.config.update("jax_compilation_cache_dir", str(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
