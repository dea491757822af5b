"""Checkpoint save/restore (incl. mask/param surgery) and metrics writing —
parity with imagenet_resnet/utils.py:93-125 and rigl_tf2/train.py:304-313."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rigl_tpu.train.checkpoint import (
    CheckpointManager,
    restore_masks_only,
    restore_params_only,
    shuffle_masks,
)
from rigl_tpu.train.trainer import TrainConfig, Trainer
from rigl_tpu.utils.metrics import (
    MetricsWriter,
    distance_to_init,
    norm_summaries,
    read_metrics,
    sparsity_summaries,
)


def _small_trainer(tmp_path, **kw):
  base = dict(model='mnist_mlp', dataset='mnist', batch_size=16,
              train_steps=4, log_every=2, maskupdate_frequency=2,
              training_method='set', sparsity=0.5, n_synthetic=64,
              checkpoint_dir=str(tmp_path / 'ckpt'), checkpoint_every=2)
  base.update(kw)
  return Trainer(TrainConfig(**base))


def test_checkpoint_roundtrip(tmp_path):
  t = _small_trainer(tmp_path)
  t.train()
  state = t.state
  mgr = CheckpointManager(str(tmp_path / 'ckpt'))
  assert mgr.latest_step() == 4
  # Restore into a freshly initialized state.
  t2 = _small_trainer(tmp_path)
  fresh = t2.init_state()
  restored = mgr.restore(fresh)
  np.testing.assert_array_equal(
      np.asarray(restored.sparse.masks['layer1/kernel']),
      np.asarray(state.sparse.masks['layer1/kernel']))
  np.testing.assert_allclose(
      np.asarray(restored.params['params']['layer1']['kernel']),
      np.asarray(state.params['params']['layer1']['kernel']))
  assert int(restored.sparse.step) == 4
  mgr.close()


def test_mask_and_param_surgery(tmp_path):
  t = _small_trainer(tmp_path, checkpoint_dir=None, checkpoint_every=0)
  t.train()
  trained = t.state
  t2 = _small_trainer(tmp_path, checkpoint_dir=None, checkpoint_every=0,
                      seed=1)
  fresh = t2.init_state()

  masks_only = restore_masks_only(fresh, trained)
  np.testing.assert_array_equal(
      np.asarray(masks_only.sparse.masks['layer1/kernel']),
      np.asarray(trained.sparse.masks['layer1/kernel']))
  assert np.array_equal(
      np.asarray(masks_only.params['params']['layer1']['kernel']),
      np.asarray(fresh.params['params']['layer1']['kernel']))

  params_only = restore_params_only(fresh, trained)
  assert np.array_equal(
      np.asarray(params_only.params['params']['layer1']['kernel']),
      np.asarray(trained.params['params']['layer1']['kernel']))
  assert np.array_equal(
      np.asarray(params_only.sparse.masks['layer1/kernel']),
      np.asarray(fresh.sparse.masks['layer1/kernel']))


def test_shuffle_masks_preserves_sparsity():
  masks = {'a': jnp.asarray(np.eye(8, dtype=np.float32))}
  shuffled = shuffle_masks(jax.random.key(0), masks)
  assert float(shuffled['a'].sum()) == 8.0
  assert not np.array_equal(np.asarray(shuffled['a']), np.eye(8))


def test_metrics_writer_roundtrip(tmp_path):
  w = MetricsWriter(str(tmp_path))
  w.write(1, {'loss': jnp.asarray(2.5), 'note': 'x'})
  w.write(2, {'loss': 1.5})
  w.close()
  recs = read_metrics(str(tmp_path))
  assert len(recs) == 2
  assert recs[0]['loss'] == 2.5
  assert recs[0]['note'] == 'x'


def test_trainer_writes_metrics_and_ckpt(tmp_path):
  t = _small_trainer(tmp_path)
  t.train()
  recs = read_metrics(str(tmp_path / 'ckpt'))
  assert any('loss' in r for r in recs)
  assert os.path.isdir(str(tmp_path / 'ckpt'))


def test_summaries_helpers():
  masks = {'a': jnp.ones((4, 4)), 'b': jnp.zeros((4, 4))}
  s = sparsity_summaries(masks)
  assert s['global_sparsity'] == 0.5
  assert s['sparsity/b'] == 1.0
  n = norm_summaries({'w': jnp.full((2, 2), 3.0)}, 'param')
  assert n['param_norm'] == pytest.approx(6.0)
  d = distance_to_init({'w': jnp.ones(4)}, {'w': jnp.zeros(4)})
  assert d['distance_to_init'] == pytest.approx(2.0)


def test_export_and_load_for_inference(tmp_path):
  from rigl_tpu.train.export import export_model, load_for_inference
  t = _small_trainer(tmp_path, checkpoint_dir=None, checkpoint_every=0)
  t.train()
  state = t.state
  d = export_model(str(tmp_path / 'export'), 'mnist_mlp', {},
                   state.params, state.sparse.masks, state.batch_stats)
  apply_fn, manifest = load_for_inference(d)
  assert manifest['global_sparsity'] == pytest.approx(0.5, abs=0.05)
  x = jnp.zeros((2, 28, 28, 1))
  logits = apply_fn(x)
  assert logits.shape == (2, 10)
  # Baked weights equal mask*w from the train state.
  from rigl_tpu.sparsity import masks as masks_lib
  eff = masks_lib.apply_masks(state.params, state.sparse.masks)
  ref = t.model.apply({'params': eff['params'],
                       'batch_stats': state.batch_stats}, x, train=False)
  np.testing.assert_allclose(np.asarray(logits), np.asarray(ref), rtol=1e-6)


def test_eval_loop_eval_once(tmp_path):
  from rigl_tpu.train.eval_loop import evaluate_checkpoints
  t = _small_trainer(tmp_path)
  t.train()
  t2 = _small_trainer(tmp_path)
  results = evaluate_checkpoints(t2, str(tmp_path / 'ckpt'), eval_once=True)
  assert len(results) == 1
  assert results[0]['step'] == 4
  assert 'top_1' in results[0]


def test_eval_loop_missing_dir_raises(tmp_path):
  from rigl_tpu.train.eval_loop import evaluate_checkpoints
  t = _small_trainer(tmp_path, checkpoint_dir=None, checkpoint_every=0)
  with pytest.raises(FileNotFoundError):
    evaluate_checkpoints(t, str(tmp_path / 'nope'), eval_once=True,
                         timeout_seconds=2.0)


def test_mask_images(tmp_path):
  """Mask image summaries (imagenet_resnet/utils.py:83-90 with_img parity)."""
  import numpy as np
  from rigl_tpu.utils.metrics import mask_images, write_mask_images
  masks = {'a/kernel': np.array([[1., 0.], [0., 1.]]),
           'b/kernel': np.ones((2, 3, 4, 8), np.float32)}
  imgs = mask_images(masks)
  assert imgs['a/kernel'].shape == (2, 2)
  assert imgs['a/kernel'].dtype == np.uint8
  assert set(np.unique(imgs['a/kernel'])) == {0, 255}
  assert imgs['b/kernel'].shape == (24, 8)

  path = write_mask_images(str(tmp_path), 7, masks)
  loaded = np.load(path)
  np.testing.assert_array_equal(loaded['a__kernel'], imgs['a/kernel'])


def test_trainer_mask_image_every(tmp_path):
  from rigl_tpu.train.trainer import TrainConfig, Trainer
  import glob as glob_mod
  cfg = TrainConfig(model='mnist_mlp', dataset='mnist', batch_size=32,
                    train_steps=4, training_method='set', sparsity=0.5,
                    maskupdate_frequency=2, n_synthetic=128, log_every=0,
                    checkpoint_dir=str(tmp_path / 'run'), mask_image_every=2)
  Trainer(cfg).train()
  files = glob_mod.glob(str(tmp_path / 'run' / 'mask_images' / '*.npz'))
  assert len(files) == 2, files
