"""ImageNet driver — parity with rigl/imagenet_resnet/imagenet_train_eval.py:
ResNet-50/MobileNet/VGG, bfloat16, label smoothing 0.1, weight decay 1e-4,
batch 1024 over a data mesh, piecewise-warmup LR, 1x = 32000 steps/epoch table
(112,590 steps at batch 1024 ~ 90 epochs, imagenet_train_eval.py:132-134),
training_steps_multiplier for the 5x-100x runs.

  python -m rigl_tpu.drivers.imagenet --model_architecture=resnet \
      --training_method=rigl --end_sparsity=0.8
"""

from __future__ import annotations

from absl import app, flags

from rigl_tpu.drivers import common
from rigl_tpu.drivers.common import safe_flags

FLAGS = flags.FLAGS
common.define_common_flags(default_method='rigl', default_sparsity=0.8,
                           default_steps=112590, default_batch=1024,
                           default_frequency=100, default_end_step=25000,
                           default_weight_decay=1e-4,
                           default_label_smoothing=0.1)
safe_flags.DEFINE_string('model_architecture', 'resnet',
                    'resnet|mobilenet_v1|mobilenet_v2|vgg_16|vgg_19|vgg_a')
safe_flags.DEFINE_integer('resnet_depth', 50, '')
safe_flags.DEFINE_float('width', 1.0, 'width multiplier')
safe_flags.DEFINE_bool('prune_first_layer', False,
                  'mask the first conv (default dense, like the reference '
                  'first_layer_sparsity=0)')
safe_flags.DEFINE_bool('prune_last_layer', True, '')
safe_flags.DEFINE_float('first_layer_sparsity', -1.0, 'override; <0 disabled')
safe_flags.DEFINE_float('last_layer_sparsity', -1.0, '')
safe_flags.DEFINE_integer('n_model_shards', 1, "size of the mesh 'model' axis")


def main(argv):
  del argv
  arch = FLAGS.model_architecture
  if arch == 'resnet':
    model, mkw = 'resnet', dict(depth=FLAGS.resnet_depth, width=FLAGS.width)
  elif arch in ('mobilenet_v1', 'mobilenet_v2'):
    model, mkw = arch, dict(width=FLAGS.width)
  elif arch.startswith('vgg'):
    model, mkw = 'vgg', dict(variant=arch)
  else:
    raise ValueError(f'unknown architecture {arch}')

  custom_map = {}
  if arch == 'resnet':
    from rigl_tpu.models.resnet import ResNet
    custom_map.update(ResNet(depth=FLAGS.resnet_depth).first_last_layer_map(
        FLAGS.prune_first_layer, FLAGS.prune_last_layer))
    if FLAGS.first_layer_sparsity > 0:
      custom_map['initial_conv/conv/kernel'] = FLAGS.first_layer_sparsity
    if FLAGS.last_layer_sparsity > 0:
      custom_map['final_dense/kernel'] = FLAGS.last_layer_sparsity

  import jax.numpy as jnp
  mkw['dtype'] = jnp.bfloat16
  cfg = common.config_from_flags(
      model=model,
      model_kwargs=mkw,
      dataset='imagenet',
      lr_schedule='imagenet',
      custom_sparsity_map=custom_map,
      n_model_shards=FLAGS.n_model_shards,
  )
  from rigl_tpu.train.trainer import Trainer
  return common.run_and_report(Trainer(cfg), FLAGS.output_dir)


if __name__ == '__main__':
  app.run(main)
