"""Test configuration: run on CPU with 8 virtual devices.

Multi-chip hardware isn't available in CI; sharding tests validate the
pjit/shard_map paths on a virtual 8-device CPU mesh instead.
Must set the flags before jax initializes its backends.
"""

import os

# Force CPU: the environment pre-sets JAX_PLATFORMS='axon' (TPU tunnel)
# and a sitecustomize registers that backend in every process, overriding
# the env var — so the config must be updated AFTER importing jax.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache makes repeated test runs much faster.
jax.config.update("jax_compilation_cache_dir", "/tmp/matry_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
