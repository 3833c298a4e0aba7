"""Test configuration.

Tests run on CPU with a single device: this box has one core, and XLA-CPU
compile times scale with the virtual device count, so forcing 8 devices
globally would multiply every compile by ~8x. Multi-chip sharding tests
(test_parallel.py) spawn a subprocess with
``--xla_force_host_platform_device_count=8`` instead; the driver's
``__graft_entry__.dryrun_multichip`` does the same for the full prover step.
"""

import os

import jax

# The site config pins jax.config.jax_platforms to "axon,cpu" at import,
# which SILENTLY OVERRIDES the JAX_PLATFORMS env var — `env
# JAX_PLATFORMS=cpu pytest` would still run on the TPU tunnel. Honor the
# env var explicitly so CPU-only test runs really are CPU-only (and safe
# to run alongside a TPU job).
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    # CPU runs: READ the persistent cache but never WRITE it. The former
    # full-suite "order-dependent segfault" (CLAUDE.md OPEN FLAKE) is a
    # crash inside jax's cache-write path — faulthandler stack: 
    # compilation_cache.put_executable_and_time -> zstd serialization,
    # reproduced at tests/test_field.py::test_pow_inv after ~100 tests.
    # CPU executables are cheap to recompile; only TPU runs write.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
else:
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running end-to-end tests")
    config.addinivalue_line("markers", "timeout: per-test timeout (no-op if pytest-timeout absent)")
