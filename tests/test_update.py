"""Tests for the drop/grow kernel — the behavioral contract from
rigl/sparse_optimizers_test.py: exact drop counts, mask-sum preservation,
disjointness, zero-init of grown weights, reinit_when_same semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rigl_tpu.sparsity import update


def _rand_state(seed=0):
  return np.random.RandomState(seed)


def _setup(shape=(8, 16), sparsity=0.5, seed=0):
  rs = _rand_state(seed)
  size = int(np.prod(shape))
  n_zeros = int(np.floor(sparsity * size))
  flat = np.ones(size, np.float32)
  flat[:n_zeros] = 0
  rs.shuffle(flat)
  mask = jnp.asarray(flat.reshape(shape))
  weights = jnp.asarray(rs.randn(*shape).astype(np.float32))
  return mask, weights


def test_topk_mask_from_scores():
  scores = jnp.asarray([3.0, 1.0, 4.0, 1.5, 5.0])
  m = update.topk_mask_from_scores(scores, jnp.int32(2))
  assert np.array_equal(np.asarray(m), [0, 0, 1, 0, 1])


def test_topk_mask_tie_break_lower_index_first():
  scores = jnp.asarray([2.0, 2.0, 2.0, 1.0])
  m = update.topk_mask_from_scores(scores, jnp.int32(2))
  assert np.array_equal(np.asarray(m), [1, 1, 0, 0])


@pytest.mark.parametrize('drop_fraction', [0.0, 0.1, 0.3, 0.5, 1.0])
def test_mask_sum_preserved(drop_fraction):
  mask, weights = _setup()
  key = jax.random.key(0)
  score_drop = jnp.abs(mask * weights)
  score_grow = jax.random.uniform(key, mask.shape)
  res = update.drop_grow_update(mask, weights, score_drop, score_grow,
                                drop_fraction)
  assert float(jnp.sum(res.mask)) == float(jnp.sum(mask))
  assert set(np.unique(np.asarray(res.mask))) <= {0.0, 1.0}


def test_exact_drop_count():
  mask, weights = _setup(sparsity=0.5)
  n_ones = int(jnp.sum(mask))
  drop_fraction = 0.3
  score_drop = jnp.abs(mask * weights)
  # Give every originally-inactive position a higher grow score than any
  # just-dropped position, so the counts are exact.  (With random grow scores
  # a just-dropped position may legitimately re-grow — only the *kept* set is
  # lifted out of the competition, matching sparse_optimizers_base.py:304-310.)
  score_grow = jnp.where(mask == 0, 1.0, 0.0)
  res = update.drop_grow_update(mask, weights, score_drop, score_grow,
                                drop_fraction)
  expected_pruned = int(n_ones * drop_fraction)
  surviving = int(jnp.sum(res.mask * mask))
  assert n_ones - surviving == expected_pruned
  grown = int(jnp.sum(res.mask * (1 - mask)))
  assert grown == expected_pruned


def test_smallest_magnitudes_dropped():
  mask = jnp.ones((1, 8))
  weights = jnp.asarray([[8.0, -7.0, 6.0, -5.0, 4.0, -3.0, 2.0, -1.0]])
  score_drop = jnp.abs(mask * weights)  # no noise for exactness
  score_grow = jnp.zeros_like(weights)
  res = update.drop_grow_update(mask, weights, score_drop, score_grow, 0.25)
  # 8 ones * 0.25 = 2 pruned: the two smallest |w| = positions 6, 7.  With a
  # full mask the grow step re-grows exactly those 2 positions (they are the
  # only non-lifted candidates), so the mask returns to all-ones — and since
  # they were active before, they are NOT counted as new connections and
  # keep their weights (sparse_optimizers_base.py:330-334).
  assert np.array_equal(np.asarray(res.mask), np.ones((1, 8)))
  assert np.asarray(res.new_connections).sum() == 0
  assert np.array_equal(np.asarray(res.weights), np.asarray(weights))


def test_highest_grow_scores_win():
  mask = jnp.asarray([[1.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0]])
  weights = jnp.asarray([[4.0, 3.0, 2.0, 1.0, 0.0, 0.0, 0.0, 0.0]])
  score_drop = jnp.abs(mask * weights)
  # Dropped: positions 2, 3 (smallest |w| of the 4 active, drop 0.5 -> 2).
  score_grow = jnp.asarray([[9.0, 9.0, 0.0, 0.0, 0.1, 0.9, 0.5, 0.2]])
  res = update.drop_grow_update(mask, weights, score_drop, score_grow, 0.5)
  m = np.asarray(res.mask)
  # Grown: 5, 6 (highest grow among candidates; the kept set {0, 1} is
  # lifted to min-1 so its score-9 entries cannot win).
  assert np.array_equal(m, [[1, 1, 0, 0, 0, 1, 1, 0]])


def test_just_dropped_positions_may_regrow():
  """Only the kept set is lifted: a just-dropped position with a winning grow
  score re-grows and keeps its weight (it is not a 'new' connection)."""
  mask = jnp.asarray([[1.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0]])
  weights = jnp.asarray([[4.0, 3.0, 2.0, 1.0, 0.0, 0.0, 0.0, 0.0]])
  score_drop = jnp.abs(mask * weights)
  score_grow = jnp.asarray([[9.0, 9.0, 9.0, 9.0, 0.1, 0.9, 0.5, 0.2]])
  res = update.drop_grow_update(mask, weights, score_drop, score_grow, 0.5)
  assert np.array_equal(np.asarray(res.mask), np.asarray(mask))
  assert np.asarray(res.new_connections).sum() == 0
  assert np.array_equal(np.asarray(res.weights), np.asarray(weights))


def test_grown_weights_zero_init():
  mask, weights = _setup()
  score_drop = jnp.abs(mask * weights)
  score_grow = jax.random.uniform(jax.random.key(2), mask.shape)
  res = update.drop_grow_update(mask, weights, score_drop, score_grow, 0.4)
  new_conn = np.asarray(res.new_connections)
  assert new_conn.sum() > 0
  assert np.all(np.asarray(res.weights)[new_conn] == 0.0)
  # Surviving weights untouched.
  kept = np.asarray(res.mask * mask).astype(bool)
  assert np.array_equal(np.asarray(res.weights)[kept],
                        np.asarray(weights)[kept])


def test_disjoint_masks():
  """Keep-set and grow-set never overlap, across many random draws."""
  for seed in range(5):
    mask, weights = _setup(seed=seed, sparsity=0.7)
    score_drop = jnp.abs(mask * weights)
    score_grow = jax.random.uniform(jax.random.key(seed), mask.shape)
    res = update.drop_grow_update(mask, weights, score_drop, score_grow, 0.5)
    grown = np.asarray(res.new_connections)
    kept_before = np.asarray(mask).astype(bool)
    # new connections only at previously-inactive positions
    assert not np.any(grown & kept_before)


def test_reinit_when_same_static_algorithm():
  """Static: grow score = mask itself, so the same positions re-grow and the
  mask is unchanged; with reinit_when_same=True they are re-initialized."""
  mask, weights = _setup(sparsity=0.5)
  score_drop = jnp.abs(mask * weights)
  res = update.drop_grow_update(
      mask, weights, score_drop, score_grow=mask, drop_fraction=0.3,
      reinit_when_same=True)
  assert np.array_equal(np.asarray(res.mask), np.asarray(mask))
  n_ones = int(jnp.sum(mask))
  n_prune = int(n_ones * 0.3)
  assert int(np.asarray(res.new_connections).sum()) == n_prune
  # Those connections are re-initialized (zeros by default).
  assert np.all(np.asarray(res.weights)[np.asarray(res.new_connections)] == 0)


def test_zero_drop_fraction_noop_mask():
  mask, weights = _setup()
  score_drop = jnp.abs(mask * weights)
  score_grow = jax.random.uniform(jax.random.key(3), mask.shape)
  res = update.drop_grow_update(mask, weights, score_drop, score_grow, 0.0)
  assert np.array_equal(np.asarray(res.mask), np.asarray(mask))
  assert np.array_equal(np.asarray(res.weights), np.asarray(weights))


def test_custom_grow_tensor():
  mask, weights = _setup()
  score_drop = jnp.abs(mask * weights)
  score_grow = jax.random.uniform(jax.random.key(4), mask.shape)
  grow_tensor = jnp.full_like(weights, 7.0)
  res = update.drop_grow_update(mask, weights, score_drop, score_grow, 0.4,
                                grow_tensor=grow_tensor)
  grown = np.asarray(res.new_connections)
  assert np.all(np.asarray(res.weights)[grown] == 7.0)


def test_prune_to_sparsity():
  score = jnp.asarray(np.arange(100, dtype=np.float32).reshape(10, 10))
  m = update.prune_to_sparsity(score, 0.8)
  assert int(jnp.sum(m)) == 20
  # Top-20 scores survive: values >= 80.
  assert np.all(np.asarray(m).reshape(-1)[80:] == 1)


def test_grow_init_tensor_methods():
  key = jax.random.key(0)
  w = jnp.asarray(_rand_state(5).randn(8, 8).astype(np.float32))
  g = jnp.asarray(_rand_state(6).randn(8, 8).astype(np.float32))
  w0 = jnp.asarray(_rand_state(7).randn(8, 8).astype(np.float32))

  assert float(jnp.sum(jnp.abs(update.grow_init_tensor('zeros', key, w)))) == 0

  t = update.grow_init_tensor('random_normal_2', key, w)
  assert t.shape == w.shape

  t = update.grow_init_tensor('random_uniform', key, w)
  mean_abs = float(jnp.mean(jnp.abs(w)))
  assert float(jnp.max(jnp.abs(t))) <= mean_abs

  t = update.grow_init_tensor('initial_dist_2', key, w, initial_weights=w0)
  assert sorted(np.asarray(t).flatten().tolist()) == pytest.approx(
      sorted((np.asarray(w0) / 2).flatten().tolist()))

  t = update.grow_init_tensor('grad_scale_4', key, w, masked_grad=g)
  assert np.allclose(np.asarray(t), np.asarray(g) / 4)

  t = update.grow_init_tensor('grad_sign', key, w, masked_grad=g)
  assert set(np.unique(np.asarray(t))) <= {-1.0, 0.0, 1.0}

  with pytest.raises(ValueError, match='not a valid'):
    update.grow_init_tensor('bogus', key, w)
  with pytest.raises(ValueError, match='initial_weights'):
    update.grow_init_tensor('initial_dist', key, w)


def test_update_under_jit_with_traced_fraction():
  mask, weights = _setup()
  score_grow = jax.random.uniform(jax.random.key(8), mask.shape)

  @jax.jit
  def f(mask, weights, frac):
    return update.drop_grow_update(mask, weights, jnp.abs(mask * weights),
                                   score_grow, frac)

  res = f(mask, weights, jnp.float32(0.3))
  assert float(jnp.sum(res.mask)) == float(jnp.sum(mask))
