"""Bit-for-bit mask-evolution parity against REFERENCE-GENERATED traces.

tests/golden/drop_grow_traces.npz was produced by executing the reference's
own kernel (rigl/rigl_tf2/mask_updaters.py:99-154 generic_mask_update) via
tests/golden/generate_golden_traces.py — not by a re-transcription.  These
tests replay identical inputs through rigl_tpu.sparsity.update and require
exact agreement on masks, weights, and optimizer-slot resets
(BASELINE.md "mask evolution bit-for-bit")."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from rigl_tpu.sparsity import update as update_lib

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          'golden')
NPZ = os.path.join(GOLDEN_DIR, 'drop_grow_traces.npz')
META = os.path.join(GOLDEN_DIR, 'drop_grow_traces_meta.json')

pytestmark = pytest.mark.skipif(
    not os.path.exists(NPZ), reason='golden traces not generated '
    '(tests/golden/generate_golden_traces.py needs TF + /root/reference)')


def _load():
  data = np.load(NPZ)
  meta = json.load(open(META))['cases']
  return data, meta


def _case_names():
  if not os.path.exists(META):
    return []
  return [c['name'] for c in json.load(open(META))['cases']]


@pytest.mark.parametrize('name', _case_names())
def test_drop_grow_matches_reference(name):
  data, meta = _load()
  case = next(c for c in meta if c['name'] == name)
  g = lambda k: data[f'{name}/{k}']  # noqa: E731

  mask0 = jnp.asarray(g('mask0'))
  w0 = jnp.asarray(g('w0'))
  drop = jnp.asarray(g('drop_score'))
  frac = float(g('drop_fraction'))

  if case['has_grow']:
    res = update_lib.drop_grow_update(
        mask0, w0, drop, jnp.asarray(g('grow_score')), frac,
        reinit_when_same=case['reinit_when_same'])
    np.testing.assert_array_equal(np.asarray(res.mask), g('mask1'), name)
    np.testing.assert_array_equal(np.asarray(res.weights), g('w1'), name)
    # Slot reset: reference zeroes slots at new connections
    # (mask_updaters.py:156-162); ours reports them via new_connections.
    slot = np.where(np.asarray(res.new_connections), 0.0, g('slot0'))
    np.testing.assert_array_equal(slot, g('slot1'), name)
  else:
    # Prune-only path (score_grow=None): mask = top n_keep of drop score,
    # weights and slots untouched.
    n_ones = int(np.sum(g('mask0')))
    n_keep = n_ones - int(n_ones * frac)
    mask = update_lib.topk_mask_from_scores(
        drop, n_keep).reshape(mask0.shape)
    np.testing.assert_array_equal(np.asarray(mask), g('mask1'), name)
    np.testing.assert_array_equal(g('w0'), g('w1'), name)
    np.testing.assert_array_equal(g('slot0'), g('slot1'), name)


def test_evolution_matches_reference():
  """Six rounds of fake-SGD + drop/grow track the reference exactly —
  errors would compound across rounds, so this is the strongest check."""
  data = np.load(NPZ)
  mask = jnp.asarray(data['evolution/mask0'])
  w = jnp.asarray(data['evolution/w0'])
  grads = data['evolution/grads']
  frac = float(data['evolution/drop_fraction'])
  lr = float(data['evolution/lr'])

  for t in range(grads.shape[0]):
    g = jnp.asarray(grads[t])
    w = w - lr * g * mask
    res = update_lib.drop_grow_update(
        mask, w, jnp.abs(mask * w), jnp.abs(g), frac)
    mask, w = res.mask, res.weights
    np.testing.assert_array_equal(
        np.asarray(mask), data['evolution/masks'][t], f'round {t} mask')
    np.testing.assert_array_equal(
        np.asarray(w), data['evolution/weights'][t], f'round {t} weights')
