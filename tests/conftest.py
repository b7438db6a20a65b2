"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors the reference's test strategy (SURVEY §4): distributed behavior is
exercised on one box. Here an 8-device CPU platform stands in for a TPU
slice; sharding/pjit semantics are identical, only performance differs.

Note: the environment's axon TPU plugin force-selects the TPU backend via
``jax.config.update("jax_platforms", "axon,cpu")`` at interpreter start, so
setting the JAX_PLATFORMS env var is NOT enough — we must update the config
after importing jax (and before any backend initialization).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/sft_jax_test_cache"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
