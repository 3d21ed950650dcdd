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
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
