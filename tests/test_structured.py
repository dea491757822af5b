"""N:M structured sparsity (sparsity/structured.py — beyond-reference
research hook; mask-structure ablation axis alongside block masks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rigl_tpu.sparsity import generators
from rigl_tpu.sparsity.structured import (n_m_mask_dict, parse_n_m,
                                          project_n_m)


def test_project_exact_counts():
  scores = jax.random.normal(jax.random.key(0), (8, 16, 32))
  for n, m in [(2, 4), (1, 4), (4, 8)]:
    mask = project_n_m(scores, n, m)
    g = np.asarray(mask).reshape(-1, m, 32)
    np.testing.assert_array_equal(g.sum(axis=1), n)


def test_project_keeps_largest():
  scores = jnp.asarray([[3., -1., 0.5, -2.]]).T.reshape(4, 1)
  mask = project_n_m(scores, 2, 4)
  np.testing.assert_array_equal(np.asarray(mask).ravel(), [1, 0, 0, 1])


def test_project_tie_exactness():
  mask = project_n_m(jnp.zeros((16, 8)), 2, 4)
  np.testing.assert_array_equal(
      np.asarray(mask).reshape(-1, 4, 8).sum(axis=1), 2)


def test_project_indivisible_raises():
  with pytest.raises(ValueError, match='not divisible'):
    project_n_m(jnp.zeros((6, 8)), 2, 4)


def test_generator_registry_dispatch():
  assert parse_n_m('nm_2_4') == (2, 4)
  assert parse_n_m('shuffled') is None
  shapes = {'layer1/kernel': (8, 16), 'layer2/kernel': (16, 4)}
  masks = generators.generate_mask('nm_2_4', jax.random.key(1), shapes, 0.5)
  for path, shape in shapes.items():
    assert masks[path].shape == shape
    assert float(masks[path].mean()) == pytest.approx(0.5)
  with pytest.raises(ValueError, match='implies sparsity'):
    generators.generate_mask('nm_2_4', jax.random.key(1), shapes, 0.8)


def test_conv_kernel_group_axis():
  """Groups run along the flattened (kh*kw*cin) contraction axis."""
  masks = n_m_mask_dict(jax.random.key(0), {'c/kernel': (3, 3, 8, 16)}, 2, 4)
  g = np.asarray(masks['c/kernel']).reshape(-1, 4, 16)
  np.testing.assert_array_equal(g.sum(axis=1), 2)


def test_n_m_with_sparse_training_static():
  """nm masks flow through the Static algorithm end-to-end."""
  import optax
  from rigl_tpu.transforms import algorithms
  from rigl_tpu.transforms.sparse_training import SparseTraining
  import flax.linen as nn

  class Tiny(nn.Module):
    @nn.compact
    def __call__(self, x):
      x = nn.Dense(16, name='d0')(x)
      return nn.Dense(4, name='d1')(nn.relu(x))

  model = Tiny()
  x = jnp.ones((2, 8))
  params = model.init(jax.random.key(0), x)['params']
  # N:M pins every layer at 1 - n/m, so the distribution must be uniform
  # (ERK redistribution would contradict the structure; the generator's
  # consistency guard catches that).
  st = SparseTraining(optax.sgd(0.1), algorithms.Static(),
                      default_sparsity=0.5, distribution='uniform',
                      mask_generator='nm_2_4')
  _, sparse_state = st.init(jax.random.key(1), params)
  for mask in jax.tree.leaves(sparse_state.masks):
    g = np.asarray(mask).reshape(-1, 4, mask.shape[-1])
    np.testing.assert_array_equal(g.sum(axis=1), 2)
