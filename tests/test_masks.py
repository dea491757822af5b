"""Tests for mask pytrees — contract from rigl/sparse_utils_test.py:38-73
(deterministic counts, exact ones-count, dtype) plus the functional overlay."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rigl_tpu.sparsity import masks as masks_lib


def test_random_mask_exact_count():
  key = jax.random.key(0)
  m = masks_lib.random_mask(key, (20, 30), 0.75)
  assert m.shape == (20, 30)
  assert int(jnp.sum(m)) == 600 - int(np.floor(0.75 * 600))
  assert set(np.unique(np.asarray(m))) <= {0.0, 1.0}


@pytest.mark.parametrize('sparsity', [0.0, 0.3, 0.33333, 0.999, 1.0])
def test_random_mask_counts_across_sparsities(sparsity):
  m = masks_lib.random_mask(jax.random.key(1), (17, 13), sparsity)
  expected_zeros = int(np.floor(sparsity * 17 * 13))
  assert int(jnp.sum(1 - m)) == expected_zeros


def test_random_mask_deterministic_given_key():
  a = masks_lib.random_mask(jax.random.key(7), (10, 10), 0.5)
  b = masks_lib.random_mask(jax.random.key(7), (10, 10), 0.5)
  assert np.array_equal(np.asarray(a), np.asarray(b))
  c = masks_lib.random_mask(jax.random.key(8), (10, 10), 0.5)
  assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_random_mask_dtype():
  m = masks_lib.random_mask(jax.random.key(0), (8, 8), 0.5, dtype=jnp.bfloat16)
  assert m.dtype == jnp.bfloat16


def test_random_mask_numpy_matches_reference_procedure():
  rs = np.random.RandomState(42)
  m = masks_lib.random_mask_numpy((10, 10), 0.37, rs)
  assert int(m.sum()) == 100 - 37


def _mlp_params():
  return {
      'params': {
          'Dense_0': {'kernel': jnp.ones((784, 300)), 'bias': jnp.zeros(300)},
          'Dense_1': {'kernel': jnp.ones((300, 100)), 'bias': jnp.zeros(100)},
          'BatchNorm_0': {'scale': jnp.ones(300), 'bias': jnp.zeros(300)},
      }
  }


def test_mask_shapes_default_rule():
  shapes = masks_lib.mask_shapes(_mlp_params())
  assert shapes == {
      'Dense_0/kernel': (784, 300),
      'Dense_1/kernel': (300, 100),
  }


def test_make_mask_dict_erk():
  params = _mlp_params()
  md = masks_lib.make_mask_dict(
      jax.random.key(0), params, method='erdos_renyi_kernel',
      default_sparsity=0.8)
  assert set(md) == {'Dense_0/kernel', 'Dense_1/kernel'}
  total = sum(m.size for m in md.values())
  ones = sum(float(jnp.sum(m)) for m in md.values())
  assert ones / total == pytest.approx(0.2, abs=2e-3)


def test_apply_masks_and_grads():
  params = _mlp_params()
  md = {'Dense_0/kernel': jnp.zeros((784, 300)),
        'Dense_1/kernel': jnp.ones((300, 100))}
  eff = masks_lib.apply_masks(params, md)
  assert float(jnp.sum(eff['params']['Dense_0']['kernel'])) == 0.0
  assert float(jnp.sum(eff['params']['Dense_1']['kernel'])) == 300 * 100
  # Unmasked leaves untouched.
  assert float(jnp.sum(eff['params']['BatchNorm_0']['scale'])) == 300


def test_select_and_update_masked():
  params = _mlp_params()
  md = masks_lib.make_mask_dict(jax.random.key(0), params,
                                default_sparsity=0.5)
  sel = masks_lib.select_masked(params, md)
  assert set(sel) == set(md)
  assert sel['Dense_0/kernel'].shape == (784, 300)
  new = {k: v * 2.0 for k, v in sel.items()}
  updated = masks_lib.update_masked(params, new)
  assert float(updated['params']['Dense_0']['kernel'][0, 0]) == 2.0
  assert float(updated['params']['BatchNorm_0']['scale'][0]) == 1.0


def test_calculate_sparsity():
  md = {'a': jnp.ones((10, 10)), 'b': jnp.zeros((10, 10))}
  assert float(masks_lib.calculate_sparsity(md)) == pytest.approx(0.5)
  per = masks_lib.per_layer_sparsity(md)
  assert float(per['a']) == 0.0
  assert float(per['b']) == 1.0


def test_apply_masks_under_jit():
  params = _mlp_params()
  md = masks_lib.make_mask_dict(jax.random.key(0), params,
                                default_sparsity=0.9)

  @jax.jit
  def f(p, m):
    return masks_lib.apply_masks(p, m)

  eff = f(params, md)
  total = float(jnp.sum(jnp.abs(eff['params']['Dense_0']['kernel'])))
  expected = float(jnp.sum(md['Dense_0/kernel']))
  assert total == pytest.approx(expected)
