"""Tests for compression analysis, one-shot prune, SNR, per-class metrics."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rigl_tpu.utils.compression import (
    compressed_fc_from_mask_dict,
    get_compressed_fc,
    live_input_indices,
)
from rigl_tpu.utils.metrics import per_class_metrics, snr_summaries


def test_live_input_indices():
  m = np.zeros((4, 3))
  m[1, 0] = 1
  m[3, 2] = 1
  assert live_input_indices(m).tolist() == [1, 3]


def test_get_compressed_fc():
  # 4 inputs (input 0 dead), 3 hidden (unit 2 has no incoming; unit 1 has
  # no outgoing), 2 outputs.
  m1 = np.array([[0, 0, 0],
                 [1, 0, 0],
                 [0, 1, 0],
                 [1, 0, 0]], np.float32)
  m2 = np.array([[1, 0],
                 [0, 0],
                 [0, 1]], np.float32)
  sparsities, sizes = get_compressed_fc([m1, m2])
  # Kept: inputs {1,2,3}; hidden {0} (unit 1 dead outgoing, unit 2 dead
  # incoming); outputs: both have incoming? output 1's only source was
  # hidden 2 (dead) -> column all-zero after compaction -> dropped.
  assert sizes == [3, 1, 1]
  assert sparsities[0] == pytest.approx(1.0 / 3.0)


def test_compressed_fc_from_mask_dict():
  md = {'l1': jnp.ones((4, 3)), 'l2': jnp.ones((3, 2))}
  sparsities, sizes = compressed_fc_from_mask_dict(md)
  assert sizes == [4, 3, 2]
  assert sparsities == [0.0, 0.0]


def test_one_shot_prune():
  from rigl_tpu.transforms import SNIP, SparseTraining
  st = SparseTraining(optax.sgd(0.1), SNIP(), distribution='uniform',
                      default_sparsity=0.75)
  params = {'params': {'d': {'kernel': jnp.asarray(
      np.random.RandomState(0).randn(8, 8), jnp.float32)}}}
  opt_state, sstate = st.init(jax.random.key(0), params)
  pruned = st.one_shot_prune(params, sstate)
  assert float(jnp.sum(pruned.masks['d/kernel'])) == 16  # 25% of 64
  # Largest-|w| kept.
  w = np.abs(np.asarray(params['params']['d']['kernel']))
  kept = np.asarray(pruned.masks['d/kernel']) == 1
  assert w[kept].min() >= np.sort(w.flatten())[-16]
  # Dict rate override.
  pruned2 = st.one_shot_prune(params, sstate, {'d/kernel': 0.5})
  assert float(jnp.sum(pruned2.masks['d/kernel'])) == 32


def test_per_class_metrics():
  logits = jnp.asarray([[5.0, 0.0], [5.0, 0.0], [0.0, 5.0], [5.0, 0.0]])
  labels = jnp.asarray([0, 1, 1, 0])
  m = per_class_metrics(logits, labels, 2)
  assert m['precision/class_0'] == pytest.approx(2.0 / 3.0)
  assert m['recall/class_0'] == 1.0
  assert m['precision/class_1'] == 1.0
  assert m['recall/class_1'] == 0.5


def test_snr_summaries():
  def loss_fn(p, batch):
    return jnp.mean((batch['x'] @ p['w'] - batch['y']) ** 2)

  rs = np.random.RandomState(0)
  params = {'w': jnp.asarray(rs.randn(4, 2), jnp.float32)}
  batch = {'x': jnp.asarray(rs.randn(16, 4), jnp.float32),
           'y': jnp.asarray(rs.randn(16, 2), jnp.float32)}
  out = snr_summaries(loss_fn, params, batch)
  assert np.isfinite(out['snr_mean'])
  assert out['snr_mean'] > 0
