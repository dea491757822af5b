"""Method-dynamics comparison: does RigL behave like RigL?

The paper's core claim is that dynamic regrowth (RigL/SET) beats a fixed
random topology (scratch/static) at matched sparsity.  Real datasets are
unavailable in this environment, so this uses a teacher-student task hard
enough to separate methods: a random *sparse* teacher MLP generates labels;
students train at 95% sparsity where topology quality dominates.

  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/method_comparison.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rigl_tpu.models.mlp import MnistMLP
from rigl_tpu.sparsity import masks as masks_lib
from rigl_tpu.sparsity.schedules import UpdateSchedule
from rigl_tpu.train import steps
from rigl_tpu.transforms import algorithms
from rigl_tpu.transforms.sparse_training import SparseTraining

INPUT, CLASSES = 64, 10
N_TRAIN, N_TEST, BATCH = 8192, 2048, 128
STEPS = 1500
SPARSITY = 0.95
SEEDS = (0, 1, 2)


def make_teacher_data(seed):
  """Labels from a random 2-layer teacher with sparse weights."""
  rng = np.random.default_rng(seed)
  w1 = rng.normal(0, 1, (INPUT, 128)) * (rng.random((INPUT, 128)) < 0.2)
  w2 = rng.normal(0, 1, (128, CLASSES)) * (rng.random((128, CLASSES)) < 0.2)

  def label(x):
    return np.argmax(np.tanh(x @ w1) @ w2, axis=1).astype(np.int32)

  xtr = rng.normal(0, 1, (N_TRAIN, INPUT)).astype(np.float32)
  xte = rng.normal(0, 1, (N_TEST, INPUT)).astype(np.float32)
  return (xtr, label(xtr)), (xte, label(xte))


def run(method, seed, data):
  (xtr, ytr), (xte, yte) = data
  model = MnistMLP(features=(256, 128), num_classes=CLASSES)
  sched = UpdateSchedule(begin_step=0, end_step=int(STEPS * 0.75),
                         frequency=50, drop_fraction=0.3,
                         drop_fraction_anneal='cosine')
  algo = algorithms.get_algorithm(
      method, schedule=sched) if method not in ('scratch',) else \
      algorithms.SCRATCH
  st = SparseTraining(optax.sgd(0.1, momentum=0.9), algo,
                      distribution='uniform', default_sparsity=SPARSITY,
                      seed=seed)
  state = steps.init_train_state(jax.random.key(seed), model, st,
                                 (BATCH, INPUT), has_batch_stats=False)
  train_step = jax.jit(steps.make_train_step(model, st,
                                             has_batch_stats=False))
  rng = np.random.default_rng(seed + 100)
  from rigl_tpu.train.trainer import simulate_step_sequence
  n_batches = simulate_step_sequence(st.algo, STEPS)
  for i in range(n_batches):
    idx = rng.integers(0, N_TRAIN, BATCH)
    batch = {'image': xtr[idx], 'label': ytr[idx]}
    state, metrics = train_step(state, batch)

  eff = masks_lib.apply_masks(state.params, state.sparse.masks)
  logits = model.apply({'params': eff['params']}, jnp.asarray(xte))
  acc = float(jnp.mean((jnp.argmax(logits, -1) == jnp.asarray(yte))))
  return acc


def main():
  results = {}
  for method in ('rigl', 'set', 'static', 'scratch', 'none'):
    accs = []
    for seed in SEEDS:
      data = make_teacher_data(seed)
      accs.append(run(method, seed, data))
    results[method] = {
        'mean_acc': float(np.mean(accs)),
        'accs': [round(a, 4) for a in accs],
    }
    print(method, results[method], flush=True)
  print(json.dumps(results, indent=2))


if __name__ == '__main__':
  main()
