"""Test configuration: force an 8-device virtual CPU platform.

Tests exercise multi-chip sharding logic on a virtual mesh; real-TPU runs go
through bench.py / the drivers instead.

The environment's sitecustomize registers the remote `axon` TPU backend in
every python process and forces jax_platforms='axon,cpu'; routing test
compiles through the TPU tunnel is ~100x slower than local CPU, so we flip
the config back to cpu before any backend initializes.
"""

import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
  os.environ['XLA_FLAGS'] = (
      flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
