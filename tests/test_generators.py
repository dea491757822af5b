"""Tests for structured mask generators + propagate_masks — contract from
experimental/jax/pruning/masked_test.py (exact sparsity at 0/0.5/1, per-neuron
guarantees, propagation across dense/conv stacks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rigl_tpu.sparsity import generators

SHAPES = {'d1': (12, 8), 'd2': (8, 6)}
CONV_SHAPES = {'c1': (3, 3, 4, 8), 'c2': (3, 3, 8, 6)}


@pytest.mark.parametrize('sparsity', [0.0, 0.5, 1.0])
def test_shuffled_mask_exact_sparsity(sparsity):
  md = generators.shuffled_mask(jax.random.key(0), SHAPES, sparsity)
  for path, shape in SHAPES.items():
    n = int(np.prod(shape))
    expected_ones = n - int(np.ceil(sparsity * n)) if sparsity else n
    assert int(md[path].sum()) == expected_ones


def test_bernoulli_mask_mean():
  shapes = {'big': (100, 100)}
  md = generators.bernoulli_mask(jax.random.key(0), shapes, 0.7)
  assert float(md['big'].mean()) == pytest.approx(0.3, abs=0.03)


def test_simple_mask():
  md = generators.simple_mask(SHAPES, np.ones)
  assert all(float(m.mean()) == 1.0 for m in md.values())
  md = generators.simple_mask(SHAPES, np.zeros)
  assert all(float(m.mean()) == 0.0 for m in md.values())


def test_symmetric_mask_structure():
  md = generators.symmetric_mask(jax.random.key(0), SHAPES, 0.5)
  m = np.asarray(md['d1'])
  # Every output column identical.
  assert all(np.array_equal(m[:, 0], m[:, j]) for j in range(m.shape[1]))


def test_per_neuron_mask_uniform_fan_in():
  md = generators.per_neuron_mask(jax.random.key(0), SHAPES, 0.5)
  m = np.asarray(md['d1'])
  fan_ins = m.sum(axis=0)
  assert len(set(fan_ins.tolist())) == 1  # identical count per neuron
  assert fan_ins[0] == 6  # 12 inputs, 50% sparsity
  # Columns are not all identical (independent shuffles).
  assert not all(np.array_equal(m[:, 0], m[:, j]) for j in range(1, 8))


def test_no_input_ablation_guarantee():
  # Tall layer at high sparsity: without the diagonal many inputs would die.
  shapes = {'tall': (64, 4)}
  md = generators.per_neuron_no_input_ablation_mask(
      jax.random.key(0), shapes, 0.9)
  m = np.asarray(md['tall'])
  assert np.all(m.sum(axis=1) >= 1)  # every input keeps an edge


def test_generate_mask_registry():
  for t in generators.MASK_GENERATORS:
    md = generators.generate_mask(t, jax.random.key(0), SHAPES, 0.5)
    assert set(md) == set(SHAPES)
  with pytest.raises(ValueError, match='Unknown mask type'):
    generators.generate_mask('nope', jax.random.key(0), SHAPES, 0.5)


def test_generators_validate_sparsity():
  with pytest.raises(ValueError, match='not in range'):
    generators.shuffled_mask(jax.random.key(0), SHAPES, 1.5)


def test_propagate_masks_dense_chain():
  # Layer d1 ablates output unit 0 entirely; d2's input row 0 must die.
  m1 = np.ones((12, 8), np.float32)
  m1[:, 0] = 0
  m2 = np.ones((8, 6), np.float32)
  out = generators.propagate_masks(
      {'d1': jnp.asarray(m1), 'd2': jnp.asarray(m2)})
  assert np.all(np.asarray(out['d2'])[0, :] == 0)
  assert np.all(np.asarray(out['d2'])[1:, :] == 1)


def test_propagate_masks_conv_chain():
  m1 = np.ones(CONV_SHAPES['c1'], np.float32)
  m1[..., 2] = 0  # kill output channel 2
  m2 = np.ones(CONV_SHAPES['c2'], np.float32)
  out = generators.propagate_masks(
      {'c1': jnp.asarray(m1), 'c2': jnp.asarray(m2)})
  assert np.all(np.asarray(out['c2'])[:, :, 2, :] == 0)
  assert np.asarray(out['c2'])[:, :, 0, :].mean() == 1.0


def test_propagate_masks_dense_after_conv_raises():
  with pytest.raises(ValueError, match='spatial'):
    generators.propagate_masks({
        'c1': jnp.ones((3, 3, 4, 8)),
        'd1': jnp.ones((8, 6)),
    })


def test_symmetry_stats():
  from rigl_tpu.utils import symmetry
  m = jnp.asarray([[1.0, 1.0, 0.0, 0.0],
                   [0.0, 0.0, 0.0, 0.0],
                   [1.0, 1.0, 1.0, 0.0]])
  s = symmetry.count_permutations_mask_layer(m)
  # Columns: (1,0,1) x2, (0,0,1), (0,0,0) -> 3 unique, 2! perms, 1 zeroed.
  assert s['unique_neurons'] == 3
  assert s['permutations'] == 2
  assert s['zeroed_neurons'] == 1
  assert s['total_neurons'] == 4
  agg = symmetry.get_mask_stats({'a': m, 'b': m})
  assert agg['total_permutations'] == 4
  assert agg['total_zeroed_neurons'] == 2
