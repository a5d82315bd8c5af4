"""Test configuration: force JAX onto CPU with 8 virtual devices so sharding tests
emulate a multi-chip mesh without TPU hardware (must run before jax import)."""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'   # the image presets JAX_PLATFORMS=axon
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

# The axon PJRT plugin ignores the env var; the config API does force CPU.
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_default_matmul_precision', 'highest')
# Single-core CI box: persist compiled executables across test runs.
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
