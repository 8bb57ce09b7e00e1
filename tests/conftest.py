"""Test configuration: force CPU JAX with a virtual 8-device mesh so the
multi-chip sharding paths compile and execute without TPU hardware."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (after env setup)

# The axon TPU plugin in this image overrides the JAX_PLATFORMS env var; the
# config route still works and must run before backend initialization.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: test time is dominated by XLA compiles of the
# scan/label-prop kernels; cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
