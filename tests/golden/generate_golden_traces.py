"""Generates golden drop/grow traces by EXECUTING the reference's own
mask-update kernel (rigl/rigl_tf2/mask_updaters.py:99-154
``MaskUpdater.generic_mask_update``) on tiny tensors.

The fixtures (drop_grow_traces.npz) are reference-GENERATED data, not a
transcription: tests/test_golden_traces.py replays the identical inputs
through rigl_tpu.sparsity.update.drop_grow_update and demands bit-for-bit
mask/weight/slot agreement (BASELINE.md "mask evolution bit-for-bit" row).

Requirements: TensorFlow 2.x and read access to /root/reference.  The
reference module imports `gin` and `rigl.rigl_tf2.utils` (which pulls
tensorflow_model_optimization); neither is needed by the kernel itself, so
both are stubbed before import.  Run from the repo root:

  python tests/golden/generate_golden_traces.py [--reference=/root/reference]
"""

import argparse
import json
import os
import sys
import types

import numpy as np


def import_reference_mask_updaters(reference_root):
  """Imports rigl.rigl_tf2.mask_updaters with gin/tfmot stubbed out."""
  sys.path.insert(0, reference_root)

  gin_stub = types.ModuleType('gin')

  def configurable(*args, **kwargs):
    if args and callable(args[0]):
      return args[0]
    return lambda f: f

  gin_stub.configurable = configurable
  gin_stub.REQUIRED = object()
  sys.modules.setdefault('gin', gin_stub)

  utils_stub = types.ModuleType('rigl.rigl_tf2.utils')

  class _NeverWrapper:  # layer discovery is unused by generic_mask_update
    pass

  utils_stub.PRUNING_WRAPPER = _NeverWrapper
  sys.modules['rigl.rigl_tf2.utils'] = utils_stub

  from rigl.rigl_tf2 import mask_updaters  # noqa: E402
  return mask_updaters


class FakeSlotOptimizer:
  """Duck-typed optimizer exposing one 'momentum' slot per variable so the
  reference's reset_momentum path executes (mask_updaters.py:156-162)."""

  def __init__(self):
    self.slots = {}

  def add(self, var, values):
    import tensorflow as tf
    self.slots[id(var)] = tf.Variable(values, dtype=var.dtype)

  def get_slot_names(self):
    return ['momentum']

  def get_slot(self, var, name):
    del name
    return self.slots[id(var)]


def build_cases(rng):
  """(name, shape, sparsity, drop_fraction, reinit, ties, has_grow)."""
  cases = []
  for shape in [(8, 8), (4, 5), (3, 3, 4, 8), (97,)]:
    for sparsity in (0.5, 0.8):
      for frac in (0.3, 0.29):
        cases.append((f's{sparsity}_f{frac}_{"x".join(map(str, shape))}',
                      shape, sparsity, frac, False, False, True))
  # Tie-breaking: integer-quantized scores force equal values.
  cases.append(('ties_8x8', (8, 8), 0.5, 0.5, False, True, True))
  cases.append(('ties_6x7', (6, 7), 0.75, 0.3, False, True, True))
  # Static semantics: grow score = the mask itself, reinit_when_same.
  cases.append(('static_reinit_8x8', (8, 8), 0.5, 0.3, True, False, True))
  # Prune-only path (score_grow=None): one-shot prune of actives.
  cases.append(('prune_only_8x8', (8, 8), 0.5, 0.4, False, False, False))
  cases.append(('prune_only_ties', (6, 6), 0.5, 0.33, False, True, False))
  # Degenerate fractions.
  cases.append(('frac0_8x8', (8, 8), 0.8, 0.0, False, False, True))
  cases.append(('frac1_4x4', (4, 4), 0.5, 1.0, False, False, True))
  return cases


def run_case(tf, mask_updaters, rng, name, shape, sparsity, frac,
             reinit, ties, has_grow):
  n = int(np.prod(shape))
  n_zeros = int(n * sparsity)  # floor, sparse_utils.get_n_zeros
  flat = np.ones(n, np.float32)
  flat[:n_zeros] = 0.0
  rng.shuffle(flat)
  mask0 = flat.reshape(shape)
  w0 = rng.normal(0, 1, shape).astype(np.float32)
  slot0 = rng.normal(0, 1, shape).astype(np.float32)
  if ties:
    drop0 = np.abs(np.round(rng.normal(0, 2, shape))).astype(np.float32)
    grow0 = np.round(rng.normal(0, 2, shape)).astype(np.float32)
  else:
    drop0 = np.abs(mask0 * w0).astype(np.float32)
    grow0 = rng.normal(0, 1, shape).astype(np.float32)
  if name.startswith('static'):
    grow0 = mask0.copy()

  mask_var = tf.Variable(mask0)
  w_var = tf.Variable(w0)
  opt = FakeSlotOptimizer()
  opt.add(w_var, slot0)
  updater = mask_updaters.MaskUpdater(model=None, optimizer=opt)
  updater.generic_mask_update(
      mask_var, w_var, tf.constant(drop0),
      tf.constant(grow0) if has_grow else None,
      tf.constant(frac, tf.float32), reinit_when_same=reinit)

  return {
      'mask0': mask0, 'w0': w0, 'slot0': slot0,
      'drop_score': drop0, 'grow_score': grow0 if has_grow else None,
      'drop_fraction': np.float32(frac),
      'reinit_when_same': reinit,
      'has_grow': has_grow,
      'mask1': mask_var.numpy(),
      'w1': w_var.numpy(),
      'slot1': opt.slots[id(w_var)].numpy(),
  }


def run_evolution(tf, mask_updaters, rng, rounds=6, shape=(8, 10),
                  sparsity=0.7, frac=0.3):
  """Multi-round mask evolution: between updates, a deterministic fake SGD
  step moves the weights and a fresh pseudo-gradient drives the grow score
  (RigL-style |g|), all recorded for replay."""
  n = int(np.prod(shape))
  n_zeros = int(n * sparsity)
  flat = np.ones(n, np.float32)
  flat[:n_zeros] = 0.0
  rng.shuffle(flat)
  mask0 = flat.reshape(shape)
  w0 = rng.normal(0, 1, shape).astype(np.float32)
  grads = rng.normal(0, 1, (rounds,) + shape).astype(np.float32)

  mask_var = tf.Variable(mask0)
  w_var = tf.Variable(w0)
  opt = FakeSlotOptimizer()
  opt.add(w_var, np.zeros(shape, np.float32))
  updater = mask_updaters.MaskUpdater(model=None, optimizer=opt)

  masks, weights = [], []
  for t in range(rounds):
    g = grads[t]
    # Fake SGD on active weights (both sides replay this identically).
    w_var.assign(w_var.numpy() - 0.1 * g * mask_var.numpy())
    drop = np.abs(mask_var.numpy() * w_var.numpy()).astype(np.float32)
    grow = np.abs(g).astype(np.float32)
    updater.generic_mask_update(mask_var, w_var, tf.constant(drop),
                                tf.constant(grow),
                                tf.constant(frac, tf.float32))
    masks.append(mask_var.numpy().copy())
    weights.append(w_var.numpy().copy())

  return {
      'mask0': mask0, 'w0': w0, 'grads': grads,
      'drop_fraction': np.float32(frac), 'lr': np.float32(0.1),
      'masks': np.stack(masks), 'weights': np.stack(weights),
  }


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--reference', default='/root/reference')
  parser.add_argument('--out', default=os.path.join(
      os.path.dirname(os.path.abspath(__file__)), 'drop_grow_traces.npz'))
  args = parser.parse_args()

  mask_updaters = import_reference_mask_updaters(args.reference)
  import tensorflow as tf

  rng = np.random.default_rng(20260817)
  arrays = {}
  meta = []
  for case in build_cases(rng):
    name = case[0]
    rec = run_case(tf, mask_updaters, rng, *case)
    meta.append({'name': name,
                 'reinit_when_same': bool(rec['reinit_when_same']),
                 'has_grow': bool(rec['has_grow']),
                 'drop_fraction': float(rec['drop_fraction'])})
    for key, val in rec.items():
      if isinstance(val, np.ndarray) or np.isscalar(val):
        if val is not None and not isinstance(val, bool):
          arrays[f'{name}/{key}'] = val
  evo = run_evolution(tf, mask_updaters, rng)
  for key, val in evo.items():
    arrays[f'evolution/{key}'] = val

  np.savez(args.out, **arrays)
  with open(args.out.replace('.npz', '_meta.json'), 'w') as f:
    json.dump({'cases': meta,
               'generator': 'tests/golden/generate_golden_traces.py',
               'reference_kernel':
                   'rigl/rigl_tf2/mask_updaters.py:99-154',
               'tf_version': tf.__version__}, f, indent=2)
  print(f'wrote {args.out}: {len(meta)} cases + evolution '
        f'({len(arrays)} arrays), tf {tf.__version__}')


if __name__ == '__main__':
  main()
