"""Packed block-sparse MLP driver: sparse training where the sparse layers'
weights, gradients, and optimizer slots all live as `(n_active, bk, bn)`
packed blocks (train/packed_loop.py) — O(density) memory end to end, with
RigL drop/grow running ON packed storage.

The reference has no equivalent: its sparse trainings keep full dense
latent variables at any sparsity (sparse_optimizers_base.py), realizing
size savings only at export.  Perf: on compute-bound shapes the packed
train step runs 2.3-2.9x faster than dense (PERF.md round-2 session 4).

  python -m rigl_tpu.drivers.packed_mlp --train_steps=2000 \
      --end_sparsity=0.9 --data_dir=/data/mnist
  # synthetic fallback when --data_dir is unset, like every other driver
"""

from __future__ import annotations

import json
import os

import numpy as np
from absl import app

from rigl_tpu.drivers import common
from rigl_tpu.drivers.common import safe_flags

FLAGS = common.flags.FLAGS
common.define_common_flags(default_method='rigl', default_sparsity=0.9,
                           default_steps=2000, default_batch=100,
                           default_frequency=100, default_end_step=1500,
                           default_anneal='cosine', default_lr=0.05)
safe_flags.DEFINE_string('widths', '512,256',
                         'comma-separated hidden widths (packed layers)')
safe_flags.DEFINE_string('packed_block', '16,16',
                         'block (bk,bn) of packed storage; TPU kernel '
                         'execution needs bn=128, bk%8==0')
safe_flags.DEFINE_string('packed_via', 'auto',
                         'kernel|dense_view|auto (packed_loop.resolve_via)')


def main(argv):
  del argv
  from rigl_tpu.data import datasets as datasets_lib
  from rigl_tpu.train.packed_loop import PackedMLPConfig, PackedMLPTrainer

  if FLAGS.training_method not in ('rigl', 'static'):
    # PackedMLPTrainer (train/packed_loop.py) implements the RigL update
    # only; for SET/SNFS on packed storage use drivers/packed_conv.py or
    # drivers/packed_lm.py (PackedClassifier/PackedLM trainers).
    raise ValueError('packed MLP driver supports rigl (drop/grow) or '
                     'static (frozen topology); for set/momentum on '
                     'packed storage use the packed_conv or packed_lm '
                     f'driver.  Got {FLAGS.training_method!r}')

  train_ds, eval_ds, info = datasets_lib.create_dataset(
      'mnist', FLAGS.batch_size, data_dir=FLAGS.data_dir, seed=FLAGS.seed)
  # The packed loop samples from arrays directly (its batch sampler is the
  # deterministic seed-replayable kind the bit-exactness tests rely on).
  xtr = train_ds.images.reshape(len(train_ds.images), -1)
  ytr = train_ds.labels
  xte = eval_ds.images.reshape(len(eval_ds.images), -1)
  yte = eval_ds.labels

  cfg = PackedMLPConfig(
      in_features=xtr.shape[-1],
      widths=tuple(int(w) for w in FLAGS.widths.split(',') if w),
      num_classes=info['num_classes'],
      sparsity=(FLAGS.end_sparsity
                if FLAGS.training_method in ('rigl', 'static') else 0.0),
      block=tuple(int(b) for b in FLAGS.packed_block.split(',')),
      via=FLAGS.packed_via,
      learning_rate=FLAGS.learning_rate,
      momentum=FLAGS.momentum,
      train_steps=int(FLAGS.train_steps * FLAGS.training_steps_multiplier),
      batch_size=FLAGS.batch_size,
      maskupdate_begin_step=FLAGS.maskupdate_begin_step,
      maskupdate_end_step=(0 if FLAGS.training_method == 'static'
                           else FLAGS.maskupdate_end_step),
      maskupdate_frequency=FLAGS.maskupdate_frequency,
      drop_fraction=FLAGS.drop_fraction,
      drop_fraction_anneal=(FLAGS.drop_fraction_anneal
                            if FLAGS.training_method == 'rigl' else
                            'constant'),
      seed=FLAGS.seed)

  trainer = PackedMLPTrainer(cfg)
  if FLAGS.output_dir and trainer.restore(FLAGS.output_dir):
    print(f'# resumed at step {trainer.step}')

  result = trainer.train(
      (xtr, ytr), eval_xy=(xte, yte),
      progress_fn=lambda m: print(m),
      log_every=FLAGS.log_every)
  result['data_source'] = info['source']
  result['n_params_packed'] = int(sum(
      np.prod(trainer.params[n].shape) for n in trainer.packings))
  result['n_params_dense_equiv'] = int(sum(
      kin * kout for kin, kout in cfg.layer_dims().values()))

  if FLAGS.output_dir:
    trainer.save(FLAGS.output_dir)
    with open(os.path.join(FLAGS.output_dir, 'result.json'), 'w') as f:
      json.dump(result, f, indent=2)
  print(json.dumps(result, indent=2))
  return result


if __name__ == '__main__':
  app.run(main)
