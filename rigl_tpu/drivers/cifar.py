"""CIFAR-10 WideResNet driver — parity with
rigl/cifar_resnet/resnet_train_eval.py: WRN-22-2, momentum+nesterov, LR /5 at
30k/60k/90k, 250 epochs = 97656 steps (resnet_train_eval.py:62), weight decay
5e-4, all sparse methods.

  python -m rigl_tpu.drivers.cifar --training_method=rigl --end_sparsity=0.9
"""

from __future__ import annotations

from absl import app, flags

from rigl_tpu.drivers import common
from rigl_tpu.drivers.common import safe_flags

FLAGS = flags.FLAGS
common.define_common_flags(default_method='rigl', default_sparsity=0.9,
                           default_steps=97656, default_batch=128,
                           default_frequency=100, default_end_step=75000,
                           default_weight_decay=5e-4)
safe_flags.DEFINE_integer('resnet_depth', 22, 'WRN depth (6n+4)')
safe_flags.DEFINE_integer('resnet_width', 2, 'WRN width multiplier')


def main(argv):
  del argv
  cfg = common.config_from_flags(
      model='wide_resnet',
      model_kwargs=dict(depth=FLAGS.resnet_depth, width=FLAGS.resnet_width),
      dataset='cifar10',
      lr_schedule='cifar',
  )
  from rigl_tpu.train.trainer import Trainer
  return common.run_and_report(Trainer(cfg), FLAGS.output_dir)


if __name__ == '__main__':
  app.run(main)
