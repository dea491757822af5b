"""Tests for sparsity distributions — behavioral contract from the reference's
rigl/sparse_utils_test.py:74-146 (sparsity dicts for uniform/ERK incl. custom
maps, error cases, ERK budget preservation)."""

import numpy as np
import pytest

from rigl_tpu.sparsity import distributions


SHAPES = {
    'layer1': (784, 300),
    'layer2': (300, 100),
    'layer3': (100, 10),
}


def test_get_n_zeros_floor():
  assert distributions.get_n_zeros(10, 0.25) == 2
  assert distributions.get_n_zeros(10, 0.29) == 2
  assert distributions.get_n_zeros(10, 0.0) == 0
  assert distributions.get_n_zeros(10, 1.0) == 10


def test_uniform_default():
  s = distributions.sparsities_uniform(SHAPES, 0.7)
  assert s == {'layer1': 0.7, 'layer2': 0.7, 'layer3': 0.7}


def test_uniform_custom_map():
  s = distributions.sparsities_uniform(SHAPES, 0.7, {'layer3': 0.0})
  assert s['layer3'] == 0.0
  assert s['layer1'] == 0.7


def test_custom_map_unknown_key_raises():
  with pytest.raises(ValueError, match='nope'):
    distributions.sparsities_uniform(SHAPES, 0.7, {'nope': 0.5})
  with pytest.raises(ValueError, match='nope'):
    distributions.sparsities_erdos_renyi(SHAPES, 0.7, {'nope': 0.5})


@pytest.mark.parametrize('include_kernel', [True, False])
@pytest.mark.parametrize('default_sparsity', [0.5, 0.8, 0.9, 0.95])
def test_erk_preserves_budget(default_sparsity, include_kernel):
  """ERK scales per-layer but total surviving params match uniform."""
  s = distributions.sparsities_erdos_renyi(
      SHAPES, default_sparsity, include_kernel=include_kernel)
  target_ones = sum(
      n - distributions.get_n_zeros(n, default_sparsity)
      for n in (int(np.prod(sh)) for sh in SHAPES.values()))
  actual_ones = sum(
      int(np.prod(sh)) -
      distributions.get_n_zeros(int(np.prod(sh)), s[name])
      for name, sh in SHAPES.items())
  total = sum(int(np.prod(sh)) for sh in SHAPES.values())
  # floor() rounding introduces at most one param per layer of slack.
  assert abs(actual_ones - target_ones) <= len(SHAPES)
  # Smaller layers must be denser (lower sparsity).
  assert s['layer3'] < s['layer1']
  assert all(0.0 <= v <= 1.0 for v in s.values())
  del total


def test_erk_forces_small_layers_dense():
  """A tiny layer whose scaled density would exceed 1 becomes fully dense."""
  shapes = {'big': (1024, 1024), 'tiny': (4, 4)}
  s = distributions.sparsities_erdos_renyi(shapes, 0.9)
  assert s['tiny'] == 0.0
  # Budget still preserved overall.
  density = distributions.total_density(shapes, s)
  assert density == pytest.approx(0.1, abs=2e-3)


def test_erk_conv_kernels():
  shapes = {
      'conv1': (3, 3, 3, 64),
      'conv2': (3, 3, 64, 128),
      'fc': (2048, 1000),
  }
  s = distributions.sparsities_erdos_renyi(shapes, 0.8, include_kernel=True)
  density = distributions.total_density(shapes, s)
  assert density == pytest.approx(0.2, abs=2e-3)
  # ERK: layers with more params relative to their dims are sparser.
  assert s['conv1'] < s['fc']


def test_erk_custom_map_excluded_from_scaling():
  s = distributions.sparsities_erdos_renyi(SHAPES, 0.8, {'layer3': 0.0})
  assert s['layer3'] == 0.0
  s_no_custom = distributions.sparsities_erdos_renyi(
      {k: SHAPES[k] for k in ('layer1', 'layer2')}, 0.8)
  assert s['layer1'] == pytest.approx(s_no_custom['layer1'])


def test_erk_power_scale_softens():
  s_hard = distributions.sparsities_erdos_renyi(SHAPES, 0.9, erk_power_scale=1.0)
  s_soft = distributions.sparsities_erdos_renyi(SHAPES, 0.9, erk_power_scale=0.5)
  spread_hard = s_hard['layer1'] - s_hard['layer3']
  spread_soft = s_soft['layer1'] - s_soft['layer3']
  assert spread_soft < spread_hard


def test_dispatch_methods():
  for method in ('random', 'uniform', 'erdos_renyi', 'erdos_renyi_kernel'):
    s = distributions.get_sparsities(SHAPES, method, 0.8, {})
    assert set(s) == set(SHAPES)
  with pytest.raises(ValueError, match='not a valid'):
    distributions.get_sparsities(SHAPES, 'bogus', 0.8, {})


def test_str_tables():
  from rigl_tpu.sparsity import str_sparsities
  tables = str_sparsities.read_all()
  assert len(tables) == 16
  # 54 ResNet-50 layers per operating point.
  for sp, table in tables.items():
    assert len(table) == 54
    assert all(0.0 <= v <= 1.0 for v in table.values())
  # The ~90.23% point exists and its fc layer is ~64.5% sparse.
  key = 0.9023
  assert key in tables
  assert tables[key]['fc'] == pytest.approx(0.645)
  # name_map rewrites keys.
  mapped = str_sparsities.read_all(name_map=lambda k: 'x/' + k)
  assert 'x/fc' in mapped[key]


def test_str_dispatch():
  shapes = {'fc': (2048, 1000), 'conv1': (7, 7, 3, 64)}
  s = distributions.get_sparsities(shapes, 'str', 0.9023, {})
  assert s['fc'] == pytest.approx(0.645)
  with pytest.raises(ValueError, match='not defined'):
    distributions.get_sparsities(shapes, 'str', 0.1234, {})
