"""Packed block-sparse CONV driver: image classification where every
pointwise (1x1) conv's weights, gradients, and optimizer slots live as
`(n_active, bk, bn)` packed blocks (models/packed_convnet.py +
train/packed_classifier.py), with RigL drop/grow running ON packed storage.

The sparsity structure mirrors the reference's MobileNet-v1
(mobilenetv1_model.py:43,156-221): depthwise convs stay dense, 1x1
contractions carry the sparsity — here in O(density) memory end to end.

  python -m rigl_tpu.drivers.packed_conv --dataset=mnist \
      --train_steps=2000 --end_sparsity=0.8 --data_dir=/data/mnist
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
common.define_common_flags(default_method='rigl', default_sparsity=0.8,
                           default_steps=1000, default_batch=100,
                           default_frequency=100, default_end_step=750,
                           default_anneal='cosine', default_lr=0.05)
safe_flags.DEFINE_string('dataset', 'mnist', 'mnist|cifar10')
safe_flags.DEFINE_string('arch', 'mobilenet',
                         "mobilenet (generic dense-depthwise + packed-1x1 "
                         "stack from --conv_stages) | mbv1 (the FULL "
                         "MobileNet-v1 schedule, reference "
                         "mobilenetv1_model.py:223-343 — "
                         "models/packed_convnet.PackedMobileNetV1) | "
                         "wrn (WideResNet, every 3x3 conv on packed "
                         "SPATIAL storage — layers/packed_conv.PackedConv)"
                         " | rn50 (full bottleneck ResNet, all eligible "
                         "convs packed — models/packed_convnet."
                         "PackedResNet)")
safe_flags.DEFINE_integer('wrn_depth', 22, 'WRN depth (6n+4)')
safe_flags.DEFINE_integer('wrn_width', 2, 'WRN width multiplier k')
safe_flags.DEFINE_integer('rn_depth', 50, 'bottleneck ResNet depth '
                          '(50|101|152|200)')
safe_flags.DEFINE_float('rn_width_mult', 1.0, 'bottleneck width '
                        'multiplier (reference width flag)')
safe_flags.DEFINE_float('mbv1_width', 1.0, 'MobileNet-v1 width multiplier '
                        '(published _make_divisible rounding)')
safe_flags.DEFINE_integer('stem_width', 32, 'dense 3x3 stem channels')
safe_flags.DEFINE_string('conv_stages', '64:2,128:2,128:1',
                         'comma-separated features:stride per packed '
                         'pointwise stage')
safe_flags.DEFINE_string('packed_block', '16,16',
                         'block (bk,bn) of packed storage; TPU kernel '
                         'execution needs bn=128, bk%8==0')
safe_flags.DEFINE_integer('packed_bm', 128, 'row-panel size of the packed '
                          'matmul (VMEM-clamped automatically)')
safe_flags.DEFINE_integer('conv_n_data', 1, 'data-parallel mesh shards')
safe_flags.DEFINE_integer('conv_n_model', 1, 'tensor-parallel column '
                          'groups (packed kernels shard over model axis)')
safe_flags.DEFINE_float('snfs_momentum', 0.9, 'EMA decay for '
                        '--training_method=momentum (SNFS) grow scores')
safe_flags.DEFINE_string('custom_sparsity_map', None,
                         'JSON {layer_path: sparsity} overrides excluded '
                         'from the ERK solve (the reference\'s '
                         'set_custom_sparsity_map, '
                         'imagenet_train_eval.py:308-316); paths per the '
                         'arch layer_shapes helper, e.g. '
                         '"{\\"stage0/pw/kernel\\": 0.0}"')


def main(argv):
  del argv
  from rigl_tpu.data import datasets as datasets_lib
  from rigl_tpu.models.packed_convnet import DenseConvNet, PackedConvNet
  from rigl_tpu.train.packed_classifier import (PackedClassifierConfig,
                                                PackedClassifierTrainer)

  if FLAGS.training_method not in ('rigl', 'static', 'set', 'momentum'):
    raise ValueError('packed conv driver supports rigl / set / momentum '
                     '(SNFS) drop/grow or static (frozen topology), got '
                     f'{FLAGS.training_method!r}')
  # Same mapping as drivers/packed_lm.py: 'momentum' is the reference's
  # name for SNFS (sparse_optimizers.py:126); static freezes topology via
  # end_step=0 and rides the rigl code path.
  algo = {'rigl': 'rigl', 'static': 'rigl', 'set': 'set',
          'momentum': 'snfs'}[FLAGS.training_method]

  train_ds, eval_ds, info = datasets_lib.create_dataset(
      FLAGS.dataset, FLAGS.batch_size, data_dir=FLAGS.data_dir,
      seed=FLAGS.seed)
  stages = tuple(
      (int(f), int(s)) for f, s in
      (part.split(':') for part in FLAGS.conv_stages.split(',')))
  static = FLAGS.training_method == 'static'
  cfg = PackedClassifierConfig(
      sparsity=FLAGS.end_sparsity,
      algo=algo,
      snfs_momentum=FLAGS.snfs_momentum,
      block=tuple(int(b) for b in FLAGS.packed_block.split(',')),
      learning_rate=FLAGS.learning_rate,
      train_steps=int(FLAGS.train_steps * FLAGS.training_steps_multiplier),
      batch_size=FLAGS.batch_size,
      maskupdate_begin_step=FLAGS.maskupdate_begin_step,
      maskupdate_end_step=0 if static else FLAGS.maskupdate_end_step,
      maskupdate_frequency=FLAGS.maskupdate_frequency,
      drop_fraction=FLAGS.drop_fraction,
      drop_fraction_anneal=('constant' if static
                            else FLAGS.drop_fraction_anneal),
      seed=FLAGS.seed,
      n_data=FLAGS.conv_n_data,
      n_model=FLAGS.conv_n_model)
  # --mask_init_method (common flag, default erdos_renyi_kernel like the
  # reference's imagenet trainer) reaches packed storage: per-layer ERK
  # static n_active via sparsity/layer_sparsity.spec_for_model over the
  # arch family's dense conv shapes.
  from rigl_tpu.sparsity.layer_sparsity import spec_for_model
  custom_map = (json.loads(FLAGS.custom_sparsity_map)
                if FLAGS.custom_sparsity_map else None)
  if FLAGS.arch == 'rn50':
    from rigl_tpu.models.packed_convnet import (DenseResNetTwin,
                                                PackedResNet,
                                                resnet_layer_shapes)
    if cfg.n_model > 1:
      raise ValueError('--arch=rn50 does not support tensor parallelism '
                       'yet')
    sparsity = spec_for_model(
        resnet_layer_shapes(FLAGS.rn_depth, FLAGS.rn_width_mult, cfg.block),
        FLAGS.mask_init_method, FLAGS.end_sparsity,
        custom_sparsity_map=custom_map,
        erk_power_scale=FLAGS.erk_power_scale)
    rn = dict(depth=FLAGS.rn_depth, width_mult=FLAGS.rn_width_mult,
              num_classes=info['num_classes'])
    model = PackedResNet(sparsity=sparsity, block=cfg.block,
                         bm=FLAGS.packed_bm, **rn)
    twin = DenseResNetTwin(block=cfg.block, **rn)
    model_sharded = None
  elif FLAGS.arch == 'mbv1':
    from rigl_tpu.models.packed_convnet import (DenseMobileNetV1Twin,
                                                PackedMobileNetV1,
                                                mbv1_layer_shapes)
    if cfg.n_model > 1:
      raise ValueError('--arch=mbv1 does not support tensor parallelism '
                       'yet')
    sparsity = spec_for_model(
        mbv1_layer_shapes(FLAGS.mbv1_width, cfg.block),
        FLAGS.mask_init_method, FLAGS.end_sparsity,
        custom_sparsity_map=custom_map,
        erk_power_scale=FLAGS.erk_power_scale)
    mb = dict(width_mult=FLAGS.mbv1_width, num_classes=info['num_classes'])
    model = PackedMobileNetV1(sparsity=sparsity, block=cfg.block,
                              bm=FLAGS.packed_bm, **mb)
    twin = DenseMobileNetV1Twin(block=cfg.block, **mb)
    model_sharded = None
  elif FLAGS.arch == 'wrn':
    from rigl_tpu.models.packed_convnet import (DenseWideResNetTwin,
                                                PackedWideResNet,
                                                wrn_layer_shapes)
    if cfg.n_model > 1:
      raise ValueError('--arch=wrn does not support tensor parallelism yet')
    sparsity = spec_for_model(
        wrn_layer_shapes(FLAGS.wrn_depth, FLAGS.wrn_width),
        FLAGS.mask_init_method, FLAGS.end_sparsity,
        custom_sparsity_map=custom_map,
        erk_power_scale=FLAGS.erk_power_scale)
    wrn = dict(depth=FLAGS.wrn_depth, width=FLAGS.wrn_width,
               num_classes=info['num_classes'])
    model = PackedWideResNet(sparsity=sparsity, block=cfg.block, **wrn)
    twin = DenseWideResNetTwin(**wrn)
    model_sharded = None
  else:
    from rigl_tpu.models.packed_convnet import convnet_layer_shapes
    sparsity = spec_for_model(
        convnet_layer_shapes(FLAGS.stem_width, stages),
        FLAGS.mask_init_method, FLAGS.end_sparsity,
        custom_sparsity_map=custom_map,
        erk_power_scale=FLAGS.erk_power_scale)
    net = dict(num_classes=info['num_classes'],
               stem_width=FLAGS.stem_width, stages=stages)
    packed = dict(sparsity=sparsity, block=cfg.block, bm=FLAGS.packed_bm,
                  tp_shards=cfg.n_model, **net)
    model = PackedConvNet(**packed)
    twin = DenseConvNet(**net)
    model_sharded = (PackedConvNet(tp_axis='model', **packed)
                     if cfg.n_model > 1 else None)
  trainer = PackedClassifierTrainer(model, twin, cfg,
                                    input_shape=info['shape'],
                                    model_sharded=model_sharded)
  if FLAGS.output_dir and trainer.restore(FLAGS.output_dir):
    print(f'# resumed at step {trainer.step}')

  result = trainer.train(
      (np.asarray(train_ds.images), np.asarray(train_ds.labels)),
      eval_xy=(np.asarray(eval_ds.images), np.asarray(eval_ds.labels)),
      progress_fn=lambda m: print(m), log_every=FLAGS.log_every)
  result['data_source'] = info.get('source', 'synthetic')
  result['dataset'] = FLAGS.dataset
  result['sparsity_distribution'] = FLAGS.mask_init_method
  result['algo'] = algo

  if FLAGS.output_dir:
    trainer.save(FLAGS.output_dir)
    with open(os.path.join(FLAGS.output_dir, 'result.json'), 'w') as f:
      json.dump(result, f, indent=2)
  print(json.dumps(result, indent=2))
  return result


if __name__ == '__main__':
  app.run(main)
