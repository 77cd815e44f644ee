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
# runtime on the single-core CI box; cache them across tests and runs.
# XLA:CPU AOT entries embed the compiling host's CPU feature set, and
# loading one on a different machine risks SIGILL (cpu_aot_loader:
# "Machine type used for XLA:CPU compilation doesn't match"; observed as
# a distributed-test failure when CI rotated hosts) — key the dir by the
# host's feature flags so each machine gets its own entries.
import hashlib
import pathlib


def _cpu_feature_tag():
    try:
        with open("/proc/cpuinfo") as f:
            flags = next(line for line in f if line.startswith("flags"))
    except (OSError, StopIteration):
        import platform
        flags = platform.processor()
    return hashlib.sha1(flags.encode()).hexdigest()[:8]


_cache_dir = (pathlib.Path(__file__).parent.parent
              / f".jax_cache_tests-{_cpu_feature_tag()}")
_cache_dir.mkdir(exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(_cache_dir))
jax.config.update("jax_compilation_cache_dir", str(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
