"""Test configuration: force CPU JAX with a virtual 8-device mesh so the
multi-chip sharding paths compile and execute without TPU hardware."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "--xla_cpu_max_isa" not in _flags:
    # The XLA:CPU JIT segfaults intermittently on this VM when emitting for
    # the full host ISA (the VM migrates between hosts; cached AOT code also
    # warns about machine-feature mismatches). Pinning a conservative ISA
    # stabilizes compilation; scripts/run_tests.sh retries are the backstop.
    _flags = _flags + " --xla_cpu_max_isa=AVX2"
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402  (after env setup)

# The axon TPU plugin in this image overrides the JAX_PLATFORMS env var; the
# config route still works and must run before backend initialization.
# JAX_REAL_TPU=1 skips the CPU forcing so tests/test_tpu_kernels.py can run
# on hardware.
if not os.environ.get("JAX_REAL_TPU"):
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: broken on the rounds-1-3 image (zstandard
# cache writes segfaulted), WORKS on the round-4 image (2026-08-21, verified:
# 132 s cold -> 1.0 s warm on TPU; CPU writes clean). ISING_NO_CACHE=1
# restores cold compiles if the image regresses.
if os.environ.get("ISING_NO_CACHE") == "1":
    jax.config.update("jax_enable_compilation_cache", False)
else:
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_ising_tests")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
