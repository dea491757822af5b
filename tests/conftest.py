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
import pytest  # noqa: E402

jax.config.update('jax_platforms', 'cpu')


def pytest_addoption(parser):
  parser.addoption(
      '--runslow', action='store_true', default=False,
      help='run tests marked slow (heavy equivalence/learning suites); '
           'the full sweep `pytest tests/ --runslow` is the pre-commit bar')


def pytest_configure(config):
  config.addinivalue_line(
      'markers', 'slow: heavy suite (parallelism equivalence, trajectory '
      'goldens, RL learning runs) — skipped unless --runslow')


def pytest_collection_modifyitems(config, items):
  if config.getoption('--runslow'):
    return
  skip = pytest.mark.skip(reason='slow suite: run with --runslow')
  for item in items:
    if 'slow' in item.keywords:
      item.add_marker(skip)
