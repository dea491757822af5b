"""Research-harness driver: Hessian spectrum / loss interpolation / MetaInit.

One-command reproductions of the reference's analysis modes:
  * hessian      — rigl_tf2/train.py:58-166 ('hessian' mode, hessian.gin):
                   spectrum of the loss Hessian restricted to active
                   (unmasked) coordinates, per checkpoint.
  * interpolate  — rigl_tf2/interpolate.py:80-96 (interpolate.gin): loss
                   along the linear path between two checkpoints, range
                   [i_start, i_end] (reference default -0.2..1.2, 29 pts).
  * metainit     — rigl_tf2/metainit.py:23-120: gradient-quotient meta-loss
                   minimized over per-tensor weight scales.

The run to analyze is a drivers/train.py output dir (auto-resume layout):
config.json + orbax checkpoints; pre/post-mask-update snapshot subdirs
(snapshot_mask_updates) are reachable by pointing --run_dir at them with
--config_from naming the parent run.

  python -m rigl_tpu.drivers.analysis --config=configs/lenet_hessian.json \
      --run_dir=/tmp/lenet_rigl_run
  python -m rigl_tpu.drivers.analysis --mode=interpolate \
      --run_dir=/tmp/run --step_a=100 --step_b=200
"""

from __future__ import annotations

import ast
import json
import os

import jax
import numpy as np
from absl import app, flags

from rigl_tpu.drivers.common import safe_flags

FLAGS = flags.FLAGS


def _define_flags():
  # Deferred to __main__: absl flags are process-global, and other
  # drivers (rl.py, train.py) define overlapping names ('config');
  # importing this module for its run_* functions must stay
  # side-effect-free.
  safe_flags.DEFINE_string('config', None,
                      'optional analysis preset JSON (configs/*_hessian.json '
                      'etc.); keys mirror these flags; "_" keys are docs')
  safe_flags.DEFINE_string('mode', None, 'hessian | interpolate | metainit')
  safe_flags.DEFINE_string('run_dir', None,
                      'training run output dir (config.json + checkpoints)')
  safe_flags.DEFINE_string('config_from', None,
                      'path to the run\'s config.json when run_dir points '
                      'elsewhere (e.g. a pre_update/ snapshot dir)')
  safe_flags.DEFINE_list('ckpt_steps', [],
                    'checkpoint steps to analyze (hessian); empty = all')
  safe_flags.DEFINE_integer('batch_size', 0,
                       'analysis batch size; 0 = the run\'s eval batch '
                       '(reference hessian.gin uses the full train set)')
  safe_flags.DEFINE_integer('lanczos_order', 0,
                       '0 = exact dense Hessian (small models); >0 = '
                       'stochastic Lanczos quadrature of this order')
  safe_flags.DEFINE_integer('step_a', -1, 'interpolate: first checkpoint step')
  safe_flags.DEFINE_integer('step_b', -1, 'interpolate: second checkpoint step')
  safe_flags.DEFINE_float('i_start', -0.2, 'interpolate.gin i_start')
  safe_flags.DEFINE_float('i_end', 1.2, 'interpolate.gin i_end')
  safe_flags.DEFINE_integer('n_points', 29, 'interpolate.gin n_interpolation')
  safe_flags.DEFINE_integer('metainit_steps', 100, 'metainit optimization steps')
  safe_flags.DEFINE_string('output', None, 'results JSON path; default stdout')




def _load_trainer(run_dir: str, config_from=None):
  from rigl_tpu.train.trainer import TrainConfig, Trainer
  cfg_path = config_from or os.path.join(run_dir, 'config.json')
  with open(cfg_path) as f:
    raw = json.load(f)
  known = set(TrainConfig.__dataclass_fields__)
  raw = {k: v for k, v in raw.items() if k in known}
  for key in ('model_kwargs', 'custom_sparsity_map', 'block_routing'):
    if isinstance(raw.get(key), str):
      raw[key] = ast.literal_eval(raw[key])
  raw['checkpoint_dir'] = run_dir
  raw['auto_resume'] = False
  cfg = TrainConfig(**raw)
  trainer = Trainer(cfg)
  trainer.init_state()
  return trainer


def _analysis_batch(trainer, batch_size: int):
  batch = next(iter(trainer.eval_ds.epoch()))
  if batch_size and batch['image'].shape[0] != batch_size:
    reps = -(-batch_size // batch['image'].shape[0])
    batch = {k: np.concatenate([v] * reps)[:batch_size]
             for k, v in batch.items()}
  return jax.device_put(batch)


def _loss_fn(trainer, batch):
  """loss(params_tree) over a fixed batch at the restored batch_stats."""
  from rigl_tpu.train import steps

  def loss(params, batch_stats):
    logits = trainer.model.apply(
        {'params': params['params'], 'batch_stats': batch_stats},
        batch['image'], train=False)
    return steps.cross_entropy_loss(logits, batch['label'])

  return loss


def run_hessian(trainer, ckpt_steps, batch_size, lanczos_order):
  from rigl_tpu.analysis import hessian as hessian_lib
  from rigl_tpu.train.checkpoint import CheckpointManager
  mgr = CheckpointManager(trainer.config.checkpoint_dir)
  steps_avail = sorted(mgr._mgr.all_steps() or [])
  steps_to_do = ([int(s) for s in ckpt_steps] if ckpt_steps else steps_avail)
  batch = _analysis_batch(trainer, batch_size)
  results = []
  for step in steps_to_do:
    state = mgr.restore(trainer.state, step=step)
    loss = _loss_fn(trainer, batch)
    fn = lambda p: loss(p, state.batch_stats)  # noqa: E731
    if lanczos_order > 0:
      eigs, _ = hessian_lib.lanczos_spectrum(
          fn, state.params, state.sparse.masks, order=lanczos_order)
    else:
      eigs = hessian_lib.sparse_hessian_spectrum(
          fn, state.params, state.sparse.masks)
    eigs = np.asarray(eigs, np.float64)
    results.append({
        'step': step,
        'max_eig': float(eigs.max()),
        'min_eig': float(eigs.min()),
        'trace': float(eigs.sum()),
        'n_active': int(eigs.size),
        'eigs_head': [float(v) for v in np.sort(eigs)[::-1][:16]],
    })
  mgr.close()
  return {'mode': 'hessian', 'results': results}


def run_interpolate(trainer, step_a, step_b, i_start, i_end, n_points,
                    batch_size):
  from rigl_tpu.analysis import interpolate as interp_lib
  from rigl_tpu.train.checkpoint import CheckpointManager
  mgr = CheckpointManager(trainer.config.checkpoint_dir)
  steps_avail = sorted(mgr._mgr.all_steps() or [])
  if step_a < 0:
    step_a = steps_avail[0]
  if step_b < 0:
    step_b = steps_avail[-1]
  state_a = mgr.restore(trainer.state, step=step_a)
  state_b = mgr.restore(trainer.state, step=step_b)
  mgr.close()
  batch = _analysis_batch(trainer, batch_size)
  loss = _loss_fn(trainer, batch)
  from rigl_tpu.sparsity import masks as masks_lib
  eff_a = masks_lib.apply_masks(state_a.params, state_a.sparse.masks)
  eff_b = masks_lib.apply_masks(state_b.params, state_b.sparse.masks)
  ts = np.linspace(i_start, i_end, n_points)
  pts = interp_lib.interpolate_losses(
      lambda p: loss(p, state_a.batch_stats), eff_a, eff_b, ts=ts)
  return {'mode': 'interpolate', 'step_a': step_a, 'step_b': step_b,
          'points': pts}


def run_metainit(trainer, batch_size, steps):
  from rigl_tpu.analysis import metainit as metainit_lib
  batch = _analysis_batch(trainer, batch_size)
  loss = _loss_fn(trainer, batch)
  state = trainer.state
  params, history = metainit_lib.meta_init(
      lambda p: loss(p, state.batch_stats), state.params, steps=steps)
  return {'mode': 'metainit',
          'gq_first': float(history[0]), 'gq_last': float(history[-1]),
          'n_steps': len(history)}


def main(argv):
  del argv
  if FLAGS.config:
    with open(FLAGS.config) as f:
      preset = {k: v for k, v in json.load(f).items()
                if not k.startswith('_')}
    for key, value in preset.items():
      if FLAGS[key].using_default_value:
        setattr(FLAGS, key, value)
  if not FLAGS.mode or not FLAGS.run_dir:
    raise app.UsageError('--mode and --run_dir are required (directly or '
                         'via --config)')

  trainer = _load_trainer(FLAGS.run_dir, FLAGS.config_from)
  if FLAGS.mode == 'hessian':
    result = run_hessian(trainer, FLAGS.ckpt_steps, FLAGS.batch_size,
                         FLAGS.lanczos_order)
  elif FLAGS.mode == 'interpolate':
    result = run_interpolate(trainer, FLAGS.step_a, FLAGS.step_b,
                             FLAGS.i_start, FLAGS.i_end, FLAGS.n_points,
                             FLAGS.batch_size)
  elif FLAGS.mode == 'metainit':
    result = run_metainit(trainer, FLAGS.batch_size, FLAGS.metainit_steps)
  else:
    raise app.UsageError(f'unknown mode {FLAGS.mode!r}')

  text = json.dumps(result, indent=2)
  print(text)
  if FLAGS.output:
    with open(FLAGS.output, 'w') as f:
      f.write(text)
  return result


if __name__ == '__main__':
  _define_flags()
  app.run(main)
