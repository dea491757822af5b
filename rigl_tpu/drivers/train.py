"""Generic config-driven trainer — the reference's gin workflow as JSON.

  python -m rigl_tpu.drivers.train --config=configs/lenet_rigl.json \
      [--override train_steps=100] [--output_dir=/tmp/run]

Presets in configs/ mirror the reference's gin files (rigl_tf2/configs/*.gin,
the MNIST/CIFAR/ImageNet trainer defaults, README headline runs).  The
resolved config is dumped next to the results, like the reference's
operative-config dump (rigl_tf2/train.py:495-499).
"""

from __future__ import annotations

import ast
import json

from absl import app, flags

from rigl_tpu.drivers.common import safe_flags

from rigl_tpu.train.trainer import TrainConfig, Trainer

FLAGS = flags.FLAGS
safe_flags.DEFINE_string('config', None, 'path to a TrainConfig JSON preset')
safe_flags.DEFINE_multi_string('override', [],
                          'field=value overrides (value parsed as python '
                          'literal when possible)')
safe_flags.DEFINE_string('output_dir', None, '')
# NOTE: --config is required, but enforced inside main() rather than via
# flags.mark_flag_as_required: that installs a process-global validator on
# FLAGS at import time, which breaks any OTHER driver parsing its own argv
# in the same process (e.g. the test suite driving drivers.packed_mlp).


def load_config(path: str, overrides=()) -> TrainConfig:
  with open(path) as f:
    # Keys starting with '_' are documentation (_reference citation,
    # _usage notes), not TrainConfig fields.
    raw = {k: v for k, v in json.load(f).items() if not k.startswith('_')}
  for ov in overrides:
    key, _, value = ov.partition('=')
    try:
      raw[key] = ast.literal_eval(value)
    except (ValueError, SyntaxError):
      raw[key] = value
  return TrainConfig(**raw)


def main(argv):
  del argv
  if not FLAGS.config:
    raise app.UsageError('--config is required')
  cfg = load_config(FLAGS.config, FLAGS.override)
  if FLAGS.output_dir:
    cfg.checkpoint_dir = FLAGS.output_dir
  from rigl_tpu.drivers.common import run_and_report
  return run_and_report(Trainer(cfg), FLAGS.output_dir)


if __name__ == '__main__':
  app.run(main)
