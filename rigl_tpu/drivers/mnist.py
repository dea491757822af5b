"""MNIST sparse-training driver — parity with rigl/mnist/mnist_train_eval.py:
300-100-10 MLP, per-layer custom sparsities {layer2: end*scale, layer3: 0},
staircase-decay momentum SGD, mask-record dumping.

  python -m rigl_tpu.drivers.mnist --training_method=rigl --end_sparsity=0.98
"""

from __future__ import annotations

import os

import numpy as np
from absl import app, flags

from rigl_tpu.drivers import common
from rigl_tpu.drivers.common import safe_flags
from rigl_tpu.models.mlp import MnistMLP

FLAGS = flags.FLAGS
common.define_common_flags(default_method='rigl', default_sparsity=0.98,
                           default_steps=40000, default_batch=100,
                           default_frequency=100, default_end_step=50000,
                           default_anneal='cosine', default_lr=0.2)
safe_flags.DEFINE_float('sparsity_scale', 0.9,
                   'layer2 sparsity = end_sparsity * scale '
                   '(mnist_train_eval.py:269-272)')
safe_flags.DEFINE_bool('record_masks', False,
                  'dump mask snapshots to .npy (mnist_train_eval.py:410-415)')


def main(argv):
  del argv
  cmap = MnistMLP().custom_sparsity_map(FLAGS.end_sparsity,
                                        FLAGS.sparsity_scale)
  cfg = common.config_from_flags(
      model='mnist_mlp', dataset='mnist',
      custom_sparsity_map=cmap,
      lr_schedule='mnist')
  from rigl_tpu.train.trainer import Trainer
  trainer = Trainer(cfg)

  mask_records = []
  if FLAGS.record_masks:
    orig_train = trainer.train

    def train_with_records(progress_fn=None, **kw):
      def record(m):
        if trainer.state is not None and trainer.state.sparse.masks:
          mask_records.append({
              k: np.asarray(v) for k, v in trainer.state.sparse.masks.items()
          })
        (progress_fn or print)(m)

      return orig_train(progress_fn=record, **kw)

    trainer.train = train_with_records

  result = common.run_and_report(trainer, FLAGS.output_dir)
  if FLAGS.record_masks and FLAGS.output_dir:
    np.save(os.path.join(FLAGS.output_dir, 'mask_records.npy'),
            mask_records, allow_pickle=True)
  return result


if __name__ == '__main__':
  app.run(main)
