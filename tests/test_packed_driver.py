"""PackedMLPTrainer (train/packed_loop.py) + the packed_mlp driver:
end-to-end packed sparse training with RigL batch accounting, checkpoint
resume determinism, and the CLI surface."""

import json
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from rigl_tpu.train.packed_loop import PackedMLPConfig, PackedMLPTrainer


def _cfg(**kw):
  base = dict(in_features=64, widths=(64, 32), num_classes=10,
              sparsity=0.75, block=(16, 16), via='dense_view',
              learning_rate=0.1, train_steps=120, batch_size=32,
              maskupdate_begin_step=0, maskupdate_end_step=90,
              maskupdate_frequency=20, drop_fraction=0.3,
              drop_fraction_anneal='cosine', seed=0)
  base.update(kw)
  return PackedMLPConfig(**base)


def _data(n=256, d=64, classes=10, seed=0):
  rs = np.random.RandomState(seed)
  w = rs.randn(d, classes)
  x = rs.randn(n, d).astype(np.float32)
  y = np.argmax(x @ w + 0.1 * rs.randn(n, classes), -1).astype(np.int32)
  return x, y


def test_packed_loop_trains_and_accounts_batches():
  x, y = _data()
  tr = PackedMLPTrainer(_cfg())
  res = tr.train((x, y), eval_xy=(x, y))
  assert res['train_steps'] == 120
  # RigL batch accounting: update iters consume a batch without advancing
  # (updates at steps 0, 20, 40, 60, 80 — step-0 fires with begin=0).
  assert res['batches'] == 120 + res['mask_updates']
  assert res['mask_updates'] == 5
  assert res['eval_top_1'] > 0.5
  # Packed invariant: occupancy stayed at n_active per layer.
  for name, pk in tr.packings.items():
    from rigl_tpu.transforms.packed_training import occupancy_grid
    assert int(np.asarray(occupancy_grid(pk)).sum()) == tr.n_active[name]


def test_packed_loop_checkpoint_resume_is_deterministic(tmp_path):
  x, y = _data()
  # Uninterrupted run.
  tr_a = PackedMLPTrainer(_cfg())
  tr_a.train((x, y))
  # Interrupted at 50 + resumed.
  tr_b = PackedMLPTrainer(_cfg(train_steps=50))
  tr_b.train((x, y))
  tr_b.save(str(tmp_path))
  tr_c = PackedMLPTrainer(_cfg())
  assert tr_c.restore(str(tmp_path))
  assert tr_c.step == 50
  tr_c.train((x, y))
  for name in tr_a.params:
    np.testing.assert_allclose(np.asarray(tr_a.params[name]),
                               np.asarray(tr_c.params[name]), atol=1e-6,
                               err_msg=name)
  # Packings identical too.
  from rigl_tpu.transforms.packed_training import occupancy_grid
  for name in tr_a.packings:
    np.testing.assert_array_equal(
        np.asarray(occupancy_grid(tr_a.packings[name])),
        np.asarray(occupancy_grid(tr_c.packings[name])))


def test_packed_loop_static_never_updates():
  x, y = _data()
  tr = PackedMLPTrainer(_cfg(maskupdate_end_step=0,
                             drop_fraction_anneal='constant'))
  res = tr.train((x, y))
  assert res['mask_updates'] == 0
  assert res['batches'] == res['train_steps']


def test_packed_mlp_driver_cli(tmp_path, monkeypatch):
  """The CLI driver end-to-end on synthetic data (mnist fallback)."""
  from absl import flags
  from rigl_tpu.drivers import packed_mlp
  argv = ['packed_mlp', '--train_steps=12', '--batch_size=32',
          '--end_sparsity=0.75', '--widths=64',
          '--packed_block=16,16', '--packed_via=dense_view',
          '--maskupdate_frequency=5', '--maskupdate_end_step=10',
          '--log_every=0', f'--output_dir={tmp_path}']
  flags.FLAGS(argv)
  res = packed_mlp.main([])
  assert res['train_steps'] == 12
  assert res['data_source'] == 'synthetic'
  assert res['n_params_packed'] < res['n_params_dense_equiv'] * 0.3
  assert (tmp_path / 'result.json').exists()
  assert (tmp_path / 'packed_state.npz').exists()
