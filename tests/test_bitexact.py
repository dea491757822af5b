"""Bit-exactness of the drop/grow kernel against an independent numpy oracle
implementing the reference algorithm's arithmetic (BASELINE.md: mask
evolution parity): floor counts, descending sort with lower-index tie-break
(TF top_k semantics = jax.lax.top_k semantics), keep-set lifting to
min(score)-1, new_connections = grown AND previously-inactive."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rigl_tpu.sparsity import update


def numpy_oracle(mask, weights, score_drop, score_grow, drop_fraction,
                 reinit_when_same=False):
  """Direct numpy transcription of the reference's update arithmetic."""
  mask = np.asarray(mask, np.float32)
  weights = np.asarray(weights, np.float32)
  shape = mask.shape
  flat_drop = np.asarray(score_drop, np.float32).reshape(-1)
  flat_grow = np.asarray(score_grow, np.float32).reshape(-1)
  n_total = flat_drop.size
  n_ones = int(mask.sum())
  n_prune = int(n_ones * drop_fraction)
  n_keep = n_ones - n_prune

  # Descending stable sort = top_k with lower-index-first tie-break.
  order = np.argsort(-flat_drop, kind='stable')
  mask1 = np.zeros(n_total, np.float32)
  mask1[order[:n_keep]] = 1.0

  lifted = np.where(mask1 == 1.0, flat_grow.min() - 1.0, flat_grow)
  order2 = np.argsort(-lifted, kind='stable')
  mask2 = np.zeros(n_total, np.float32)
  mask2[order2[:n_prune]] = 1.0

  mask2_r = mask2.reshape(shape)
  if reinit_when_same:
    new_conn = mask2_r == 1.0
  else:
    new_conn = (mask2_r == 1.0) & (mask == 0.0)
  new_weights = np.where(new_conn, 0.0, weights)
  new_mask = (mask1 + mask2).reshape(shape)
  return new_mask, new_weights, new_conn


@pytest.mark.parametrize('seed', range(8))
@pytest.mark.parametrize('drop_fraction', [0.1, 0.3, 0.5])
def test_drop_grow_bit_exact_vs_oracle(seed, drop_fraction):
  rs = np.random.RandomState(seed)
  shape = (13, 17)
  mask = (rs.rand(*shape) > 0.6).astype(np.float32)
  weights = rs.randn(*shape).astype(np.float32)
  score_drop = np.abs(mask * weights) + rs.randn(*shape).astype(
      np.float32) * 1e-5
  score_grow = rs.rand(*shape).astype(np.float32)

  res = update.drop_grow_update(
      jnp.asarray(mask), jnp.asarray(weights), jnp.asarray(score_drop),
      jnp.asarray(score_grow), drop_fraction)
  om, ow, oc = numpy_oracle(mask, weights, score_drop, score_grow,
                            drop_fraction)
  np.testing.assert_array_equal(np.asarray(res.mask), om)
  np.testing.assert_array_equal(np.asarray(res.weights), ow)
  np.testing.assert_array_equal(np.asarray(res.new_connections), oc)


def test_bit_exact_with_ties():
  """Degenerate scores (many ties) must break identically."""
  mask = jnp.ones((4, 4))
  weights = jnp.ones((4, 4))
  score_drop = jnp.ones((4, 4))       # all tied
  score_grow = jnp.zeros((4, 4))      # all tied
  res = update.drop_grow_update(mask, weights, score_drop, score_grow, 0.5)
  om, _, _ = numpy_oracle(np.ones((4, 4)), np.ones((4, 4)),
                          np.ones((4, 4)), np.zeros((4, 4)), 0.5)
  np.testing.assert_array_equal(np.asarray(res.mask), om)


def test_n_prune_floor_semantics():
  """n_prune = int(n_ones * frac) truncates (7 ones * 0.3 -> 2)."""
  mask = jnp.asarray(np.concatenate([np.ones(7), np.zeros(9)]).reshape(4, 4),
                     jnp.float32)
  weights = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4) + 1)
  res = update.drop_grow_update(mask, weights, jnp.abs(mask * weights),
                                jnp.where(mask == 0, 1.0, 0.0), 0.3)
  surviving = int(jnp.sum(res.mask * mask))
  assert 7 - surviving == int(7 * 0.3) == 2
