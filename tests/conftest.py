"""Test harness: force an 8-device virtual CPU mesh (no TPU needed in CI).

Must set env vars before jax is imported anywhere (SURVEY.md §4: multi-device tests
via xla_force_host_platform_device_count).
"""

import os

# FORCE CPU: the session env pre-sets JAX_PLATFORMS=axon (remote TPU tunnel) and a
# sitecustomize module imports jax at interpreter startup, freezing that choice —
# env edits here are too late; only jax.config.update can switch the platform.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# 8 virtual CPU devices for multi-chip sharding tests (works even though
# sitecustomize already imported jax, unlike XLA_FLAGS).
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: the suite compiles several full train steps;
# repeat runs hit the cache instead of re-lowering everything (~4x faster).
_cache_dir = os.environ.get("JAX_TEST_CACHE",
                            os.path.join("/tmp", "jax_test_cache"))
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
