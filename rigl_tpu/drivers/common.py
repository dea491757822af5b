"""Shared absl flags for the trainer drivers — mirrors the reference's flag
surface (mnist_train_eval.py, resnet_train_eval.py, imagenet_train_eval.py)."""

from __future__ import annotations

import json

from absl import flags

from rigl_tpu.train.trainer import TrainConfig

FLAGS = flags.FLAGS


class _SafeDefines:
  """DuplicateFlagError-safe facade over absl.flags' DEFINE_* functions.

  Every real driver binary imports exactly one driver module, so its own
  defaults apply there.  Tests import several driver modules into one
  process, where absl's shared registry raises DuplicateFlagError on names
  the drivers share ('config', 'output_dir', 'training_method', ...).
  First definition wins under multi-import — harmless, because tests drive
  the drivers through their run()/load_* functions, never through FLAGS.
  """

  def __getattr__(self, attr):
    fn = getattr(flags, attr)
    if not attr.startswith('DEFINE'):
      return fn

    def wrapped(name, *args, **kwargs):
      if name in FLAGS:
        return None
      return fn(name, *args, **kwargs)

    return wrapped


safe_flags = _SafeDefines()


def define_common_flags(default_method='rigl', default_sparsity=0.9,
                        default_steps=1000, default_batch=128,
                        default_frequency=100, default_end_step=25000,
                        default_anneal='constant', default_lr=0.1,
                        default_weight_decay=0.0,
                        default_label_smoothing=0.0):
  safe_flags.DEFINE_string('training_method', default_method,
                      'rigl|set|static|momentum|snip|dnw|prune|scratch|none')
  safe_flags.DEFINE_float('end_sparsity', default_sparsity, 'target sparsity')
  safe_flags.DEFINE_string('mask_init_method', 'erdos_renyi_kernel',
                      'random|erdos_renyi|erdos_renyi_kernel|str')
  safe_flags.DEFINE_float('erk_power_scale', 1.0, 'ERK softening exponent')
  safe_flags.DEFINE_integer('maskupdate_begin_step', 0, '')
  safe_flags.DEFINE_integer('maskupdate_end_step', default_end_step,
                       'last mask-update step; must be > begin for '
                       'cosine/exponential anneals; -1 = forever '
                       '(constant anneal only)')
  safe_flags.DEFINE_integer('maskupdate_frequency', default_frequency, '')
  safe_flags.DEFINE_float('drop_fraction', 0.3, '')
  safe_flags.DEFINE_string('drop_fraction_anneal', default_anneal,
                      'constant|cosine|exponential_<p>')
  safe_flags.DEFINE_string('grow_init', 'zeros', '')
  safe_flags.DEFINE_float('initial_acc_scale', 0.0, '')
  safe_flags.DEFINE_integer('train_steps', default_steps, '')
  safe_flags.DEFINE_float('training_steps_multiplier', 1.0,
                     'extended training (5x-100x runs)')
  safe_flags.DEFINE_integer('batch_size', default_batch, '')
  safe_flags.DEFINE_float('learning_rate', default_lr, '')
  safe_flags.DEFINE_float('momentum', 0.9, '')
  safe_flags.DEFINE_float('weight_decay', default_weight_decay, '')
  safe_flags.DEFINE_float('label_smoothing', default_label_smoothing, '')
  safe_flags.DEFINE_integer('seed', 0, '')
  safe_flags.DEFINE_string('data_dir', None, 'raw dataset dir (synthetic if unset)')
  safe_flags.DEFINE_string('output_dir', None, 'checkpoints + metrics')
  safe_flags.DEFINE_integer('log_every', 100, '')
  safe_flags.DEFINE_integer('eval_every', 0, '')


def config_from_flags(**overrides) -> TrainConfig:
  cfg = TrainConfig(
      training_method=FLAGS.training_method,
      sparsity=FLAGS.end_sparsity,
      mask_init_method=FLAGS.mask_init_method,
      erk_power_scale=FLAGS.erk_power_scale,
      maskupdate_begin_step=FLAGS.maskupdate_begin_step,
      maskupdate_end_step=FLAGS.maskupdate_end_step,
      maskupdate_frequency=FLAGS.maskupdate_frequency,
      drop_fraction=FLAGS.drop_fraction,
      drop_fraction_anneal=FLAGS.drop_fraction_anneal,
      grow_init=FLAGS.grow_init,
      initial_acc_scale=FLAGS.initial_acc_scale,
      train_steps=FLAGS.train_steps,
      training_steps_multiplier=FLAGS.training_steps_multiplier,
      batch_size=FLAGS.batch_size,
      base_learning_rate=FLAGS.learning_rate,
      momentum=FLAGS.momentum,
      weight_decay=FLAGS.weight_decay,
      label_smoothing=FLAGS.label_smoothing,
      seed=FLAGS.seed,
      data_dir=FLAGS.data_dir,
      checkpoint_dir=FLAGS.output_dir,
      log_every=FLAGS.log_every,
      eval_every=FLAGS.eval_every,
  )
  for k, v in overrides.items():
    setattr(cfg, k, v)
  return cfg


def run_and_report(trainer, output_dir=None):
  """Trains, prints metrics, dumps resolved config + results (the reference
  dumps its operative gin config, rigl_tf2/train.py:495-499)."""
  import os
  result = trainer.train(progress_fn=lambda m: print(m))
  print(json.dumps(result, indent=2))
  if output_dir:
    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, 'config.json'), 'w') as f:
      f.write(trainer.config.to_json())
    with open(os.path.join(output_dir, 'results.json'), 'w') as f:
      json.dump(result, f, indent=2)
  return result


def define_block_flags():
  """Block-granular sparsity flags (the reference reserved these at
  imagenet_train_eval.py:271-272; realized here)."""
  safe_flags.DEFINE_integer('block_width', 0, 'mask block columns; 0=element')
  safe_flags.DEFINE_integer('block_height', 0, 'mask block rows; 0=element')
  safe_flags.DEFINE_string('mask_type', None,
                      'structured init: per_neuron|symmetric|'
                      'per_neuron_no_input_ablation|shuffled|random')
  safe_flags.DEFINE_bool('block_execution', False,
                    'execute eligible convs through the block-skipping '
                    'Pallas matmul (requires block_width/height)')
  safe_flags.DEFINE_bool('block_conv3x3', False,
                    'extend block execution to spatial convs via im2col')


def define_surgery_flags():
  """Cross-experiment checkpoint surgery flags (imagenet flags :256-261,
  rigl_tf2 mask shuffling)."""
  safe_flags.DEFINE_string('init_masks_from', None,
                      'checkpoint dir to load masks (topology) from')
  safe_flags.DEFINE_string('init_params_from', None,
                      'checkpoint dir to load params from (lottery-style)')
  safe_flags.DEFINE_bool('shuffle_loaded_masks', False,
                    'shuffle loaded masks per layer (control experiment)')
