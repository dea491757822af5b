"""Research-harness preset tests — the rigl_tf2 configs/ + mlp_configs/
matrix (lottery / hessian / interpolate / dense / prune / rigl / set /
scratch / small_dense) each loads and runs end-to-end at smoke scale.

GraSP is deliberately absent: the reference's own mask_updaters.py:359-381
raises NotImplementedError for rigl_grasp."""

import glob
import json
import os

import numpy as np
import pytest

from rigl_tpu.drivers.train import load_config
from rigl_tpu.train.trainer import Trainer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = os.path.join(REPO, 'configs')

MLP_PRESETS = sorted(glob.glob(os.path.join(CONFIGS, 'mlp_*.json')))

SMOKE = ['train_steps=6', 'batch_size=16', 'n_synthetic=64', 'log_every=0',
         'maskupdate_frequency=2', 'maskupdate_begin_step=2',
         'maskupdate_end_step=4', 'eval_every=0']


def _strip_docs(path):
  raw = {k: v for k, v in json.load(open(path)).items()
         if not k.startswith('_')}
  return raw


def test_mlp_matrix_inventory():
  """7 presets mirroring rigl_tf2/mlp_configs/*.gin."""
  names = {os.path.basename(p) for p in MLP_PRESETS}
  assert names == {f'mlp_{m}.json' for m in (
      'dense', 'lottery', 'prune', 'rigl', 'set', 'scratch', 'small_dense')}


@pytest.mark.parametrize(
    'path', MLP_PRESETS, ids=[os.path.basename(p) for p in MLP_PRESETS])
def test_mlp_preset_runs(path, tmp_path):
  raw = _strip_docs(path)
  overrides = list(SMOKE)
  if 'lottery' in path:
    # Produce a donor sparse run for masks/params surgery.
    donor = Trainer(load_config(
        os.path.join(CONFIGS, 'mlp_set.json'),
        SMOKE + [f'checkpoint_dir={tmp_path / "donor"}']))
    donor.train()
    overrides += [f'init_masks_from={tmp_path / "donor"}',
                  f'init_params_from={tmp_path / "donor"}']
  tmp = tmp_path / 'preset.json'
  tmp.write_text(json.dumps(raw))
  cfg = load_config(str(tmp), overrides)
  t = Trainer(cfg)
  result = t.train()
  assert np.isfinite(result['eval_loss'])
  if raw['training_method'] in ('rigl', 'set', 'scratch'):
    assert result['global_sparsity'] == pytest.approx(0.98, abs=0.03)


def _make_run(tmp_path, n_ckpts=2):
  """Tiny checkpointed mnist_mlp run with a dumped config.json."""
  run_dir = str(tmp_path / 'run')
  cfg = load_config(
      os.path.join(CONFIGS, 'mlp_rigl.json'),
      SMOKE + ['sparsity=0.9', "model_kwargs={'features': (16, 16)}",
               f'checkpoint_dir={run_dir}', 'checkpoint_every=3',
               'static_update_steps=False', 'premask_params=False'])
  t = Trainer(cfg)
  t.train()
  with open(os.path.join(run_dir, 'config.json'), 'w') as f:
    f.write(cfg.to_json())
  return run_dir


def test_hessian_preset(tmp_path):
  from rigl_tpu.drivers import analysis
  run_dir = _make_run(tmp_path)
  preset = _strip_docs(os.path.join(CONFIGS, 'lenet_hessian.json'))
  assert preset['mode'] == 'hessian'
  trainer = analysis._load_trainer(run_dir)
  result = analysis.run_hessian(trainer, ckpt_steps=[], batch_size=32,
                                lanczos_order=6)
  assert result['results'], 'no checkpoints analyzed'
  for row in result['results']:
    assert np.isfinite(row['max_eig'])
    assert row['n_active'] > 0


def test_interpolate_preset(tmp_path):
  from rigl_tpu.drivers import analysis
  run_dir = _make_run(tmp_path)
  preset = _strip_docs(os.path.join(CONFIGS, 'lenet_interpolate.json'))
  trainer = analysis._load_trainer(run_dir)
  result = analysis.run_interpolate(
      trainer, step_a=-1, step_b=-1, i_start=preset['i_start'],
      i_end=preset['i_end'], n_points=5, batch_size=32)
  assert len(result['points']) == 5
  ts = [p['t'] for p in result['points']]
  assert ts[0] == pytest.approx(preset['i_start'])
  assert ts[-1] == pytest.approx(preset['i_end'])
  assert all(np.isfinite(p['loss']) for p in result['points'])


def test_metainit_runs(tmp_path):
  from rigl_tpu.drivers import analysis
  run_dir = _make_run(tmp_path)
  trainer = analysis._load_trainer(run_dir)
  result = analysis.run_metainit(trainer, batch_size=32, steps=5)
  assert np.isfinite(result['gq_last'])


def test_lenet_lottery_preset_loads(tmp_path):
  """The lenet lottery preset wires mask+param surgery (placeholder paths
  swapped for a real donor run)."""
  donor_dir = tmp_path / 'donor'
  donor = Trainer(load_config(
      os.path.join(CONFIGS, 'lenet_set.json'),
      SMOKE + [f'checkpoint_dir={donor_dir}']))
  donor.train()
  raw = _strip_docs(os.path.join(CONFIGS, 'lenet_lottery.json'))
  tmp = tmp_path / 'lottery.json'
  tmp.write_text(json.dumps(raw))
  cfg = load_config(str(tmp), SMOKE + [
      f'init_masks_from={donor_dir}', f'init_params_from={donor_dir}'])
  t = Trainer(cfg)
  result = t.train()
  assert np.isfinite(result['eval_loss'])
  # Topology matches the donor's final masks exactly.
  for p, m in t.state.sparse.masks.items():
    np.testing.assert_array_equal(
        np.asarray(m), np.asarray(donor.state.sparse.masks[p]), p)
