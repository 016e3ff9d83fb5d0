"""Test config: force an 8-device virtual CPU mesh so every test runs without
TPU hardware and the multi-chip sharding paths are exercised."""
import os

os.environ['JAX_PLATFORMS'] = 'cpu'  # force override — the shell may carry a TPU platform
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402  (import after env is set)

jax.config.update('jax_enable_x64', False)
# numerics-parity tests verify algebra, not rounding: keep matmuls exact
jax.config.update('jax_default_matmul_precision', 'highest')
