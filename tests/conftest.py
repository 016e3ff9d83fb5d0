"""Test config: force an 8-device virtual CPU mesh so every test runs without
TPU hardware and the multi-chip sharding paths are exercised.

NOTE: this environment's TPU bootstrap (sitecustomize) registers a remote
backend and sets jax.config's platform itself, clobbering JAX_PLATFORMS /
XLA_FLAGS env vars — so the override must go through jax.config, not env.
"""
import os

os.environ['JAX_PLATFORMS'] = 'cpu'  # for any subprocess we spawn

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 8)
jax.config.update('jax_enable_x64', False)
# numerics-parity tests verify algebra, not rounding: keep matmuls exact
jax.config.update('jax_default_matmul_precision', 'highest')
