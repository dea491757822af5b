"""Tests for sparse-aware initializers (init_utils/init.py parity) and
module-level masked layers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rigl_tpu.models import init as init_lib
from rigl_tpu.layers import MaskedConv, MaskedDense, dict_to_masks, masks_to_dict


def _mask(shape=(64, 32), sparsity=0.75, seed=0):
  rs = np.random.RandomState(seed)
  m = np.ones(int(np.prod(shape)), np.float32)
  m[:int(sparsity * m.size)] = 0
  rs.shuffle(m)
  return jnp.asarray(m.reshape(shape))


def test_sparse_variance_scaling_scales_up():
  """Sparser layers get larger init variance (2/(fan_in * density))."""
  dense_init = init_lib.sparse_variance_scaling(0.0)
  sparse_init = init_lib.sparse_variance_scaling(0.9)
  k = jax.random.key(0)
  wd = dense_init(k, (256, 256))
  ws = sparse_init(k, (256, 256))
  ratio = float(jnp.std(ws) / jnp.std(wd))
  assert ratio == pytest.approx(np.sqrt(10), rel=0.05)


def test_random_sparse_init_zero_count():
  init = init_lib.random_sparse_init(0.6)
  w = init(jax.random.key(0), (50, 40))
  assert int(jnp.sum(w == 0)) >= int(0.6 * 2000)


def test_unit_scaled_init_masked_and_scaled():
  m = _mask()
  w = init_lib.unit_scaled_init(jax.random.key(0), m, 'fanin_uniform')
  w = np.asarray(w)
  assert np.all(w[np.asarray(m) == 0] == 0)
  assert np.abs(w).max() > 0


def test_unit_scaled_init_variance_tracks_fan_in():
  """A column with fewer surviving inputs gets larger weights."""
  m = np.ones((400, 2), np.float32)
  m[:396, 0] = 0  # column 0: fan_in 4; column 1: fan_in 400
  w = np.asarray(init_lib.unit_scaled_init(
      jax.random.key(1), jnp.asarray(m), 'fanin_normal'))
  std0 = w[m[:, 0] == 1, 0].std()
  std1 = w[:, 1].std()
  assert std0 / std1 == pytest.approx(10.0, rel=0.5)  # sqrt(400/4)


def test_layer_scaled_init():
  m = _mask(sparsity=0.75)
  w_sparse = init_lib.layer_scaled_init(jax.random.key(0), m)
  w_dense = init_lib.layer_scaled_init(jax.random.key(0), jnp.ones_like(m))
  assert float(jnp.std(w_sparse) / jnp.std(w_dense)) == pytest.approx(
      2.0, rel=0.05)  # 1/sqrt(0.25)


def test_sparse_init_per_neuron():
  m = _mask()
  w = np.asarray(init_lib.sparse_init(jax.random.key(0), m))
  assert np.all(w[np.asarray(m) == 0] == 0)


def test_reinit_masked_params():
  masks = {'a': _mask(), 'b': _mask((32, 16), 0.5, 1)}
  out = init_lib.reinit_masked_params(jax.random.key(0), None, masks,
                                      'unit_scaled')
  assert set(out) == {'a', 'b'}
  with pytest.raises(ValueError, match='Unknown sparse re-init'):
    init_lib.reinit_masked_params(jax.random.key(0), None, masks, 'nope')


def test_masked_dense_forward():
  layer = MaskedDense(4, use_bias=False)
  x = jnp.ones((2, 8))
  variables = layer.init(jax.random.key(0), x)
  assert variables['masks']['kernel'].shape == (8, 4)
  y_dense = layer.apply(variables, x)
  # Zero the mask -> output zero.
  variables2 = {**variables,
                'masks': {'kernel': jnp.zeros((8, 4))}}
  y_masked = layer.apply(variables2, x)
  assert float(jnp.sum(jnp.abs(y_masked))) == 0.0
  assert float(jnp.sum(jnp.abs(y_dense))) > 0.0


def test_masked_conv_forward():
  layer = MaskedConv(6, (3, 3))
  x = jnp.ones((2, 8, 8, 3))
  variables = layer.init(jax.random.key(0), x)
  y = layer.apply(variables, x)
  assert y.shape == (2, 8, 8, 6)
  variables2 = {**variables, 'masks': {'kernel': jnp.zeros((3, 3, 3, 6))}}
  y0 = layer.apply(variables2, x)
  # Bias remains.
  assert float(jnp.std(y0)) == pytest.approx(0.0, abs=1e-6)


def test_masks_dict_roundtrip():
  import flax.linen as nn

  class Net(nn.Module):
    @nn.compact
    def __call__(self, x):
      x = MaskedDense(8, name='d1')(x)
      return MaskedDense(2, name='d2')(x)

  net = Net()
  variables = net.init(jax.random.key(0), jnp.ones((1, 4)))
  md = masks_to_dict(variables)
  assert set(md) == {'d1/kernel', 'd2/kernel'}
  md['d1/kernel'] = jnp.zeros((4, 8))
  v2 = dict_to_masks(variables, md)
  assert float(jnp.sum(v2['masks']['d1']['kernel'])) == 0.0
