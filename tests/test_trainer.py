"""End-to-end trainer tests — the reference's per-method 1-step smoke
contract (imagenet_resnet/train_test.py:49-89, cifar data_helper_test.py:78)
plus a learnability check on the synthetic task."""

import jax
import numpy as np
import pytest

from rigl_tpu.train.trainer import TrainConfig, Trainer, simulate_step_sequence
from rigl_tpu.transforms import algorithms
from rigl_tpu.sparsity.schedules import UpdateSchedule


def _cfg(**kw):
  base = dict(
      model='mnist_mlp',
      dataset='mnist',
      batch_size=32,
      train_steps=8,
      log_every=4,
      maskupdate_frequency=2,
      maskupdate_begin_step=0,
      maskupdate_end_step=-1,
      drop_fraction=0.3,
      drop_fraction_anneal='constant',
      base_learning_rate=0.1,
      lr_schedule='constant',
      n_synthetic=256,
      seed=0,
  )
  base.update(kw)
  return TrainConfig(**base)


@pytest.mark.parametrize('method', ['rigl', 'set', 'static', 'momentum',
                                    'snip', 'dnw', 'prune', 'scratch',
                                    'none'])
def test_all_methods_train_smoke(method):
  """Every training method wires up and takes a few steps."""
  t = Trainer(_cfg(training_method=method, sparsity=0.5))
  result = t.train(total_steps=4)
  assert np.isfinite(result['eval_loss'])
  if method in ('none',):
    assert 'global_sparsity' not in result or result['global_sparsity'] == 0
  elif method in ('snip', 'dnw', 'scratch', 'rigl', 'set', 'static',
                  'momentum'):
    assert result['global_sparsity'] == pytest.approx(0.5, abs=0.05)


def test_simulate_step_sequence_rigl():
  algo = algorithms.RigL(schedule=UpdateSchedule(
      begin_step=2, end_step=-1, frequency=3, drop_fraction=0.3))
  # steps 0..5: updates at 2, 5 -> 8 batches for 6 steps.
  assert simulate_step_sequence(algo, 6) == 8
  set_algo = algorithms.SET(schedule=UpdateSchedule(frequency=2))
  assert simulate_step_sequence(set_algo, 6) == 6
  snip = algorithms.SNIP()
  assert simulate_step_sequence(snip, 6) == 7


def test_trainer_reaches_exact_step_count():
  t = Trainer(_cfg(training_method='rigl', train_steps=7,
                   maskupdate_frequency=3))
  result = t.train()
  assert int(t.state.sparse.step) == 7
  assert result['batches'] == simulate_step_sequence(t.algo, 7)


def test_synthetic_task_learns_sparse():
  """90%-sparse MLP on the synthetic task: accuracy must clearly beat chance
  after a short training run (end-to-end learning signal)."""
  t = Trainer(_cfg(training_method='rigl', sparsity=0.9,
                   train_steps=150, maskupdate_frequency=25,
                   batch_size=64, n_synthetic=512,
                   base_learning_rate=0.2))
  result = t.train()
  assert result['eval_top_1'] > 0.5  # 10 classes, chance = 0.1
  assert result['global_sparsity'] == pytest.approx(0.9, abs=0.02)


def test_mask_sparsity_constant_through_training():
  t = Trainer(_cfg(training_method='set', sparsity=0.7, train_steps=10,
                   maskupdate_frequency=2))
  t.train()
  from rigl_tpu.sparsity import masks as masks_lib
  assert float(masks_lib.calculate_sparsity(t.state.sparse.masks)) == (
      pytest.approx(0.7, abs=0.02))


def test_custom_sparsity_map_mnist_convention():
  """The MNIST trainer convention: layer2 at end_sparsity*scale, output
  layer dense (mnist_train_eval.py:269-272)."""
  from rigl_tpu.models.mlp import MnistMLP
  model = MnistMLP()
  cmap = model.custom_sparsity_map(0.98, 0.9)
  t = Trainer(_cfg(training_method='set', sparsity=0.98,
                   custom_sparsity_map=cmap, train_steps=2,
                   mask_init_method='random'))
  t.init_state()
  masks = t.state.sparse.masks
  assert float(np.mean(np.asarray(masks['layer3/kernel']))) == 1.0  # dense
  s2 = 1.0 - float(np.mean(np.asarray(masks['layer2/kernel'])))
  assert s2 == pytest.approx(0.98 * 0.9, abs=0.01)


def test_eval_top5_geq_top1():
  t = Trainer(_cfg(training_method='set', train_steps=2))
  t.init_state()
  m = t.evaluate()
  assert m['top_5'] >= m['top_1']


def test_predict_update_batches():
  from rigl_tpu.train.trainer import predict_update_batches
  rigl = algorithms.RigL(schedule=UpdateSchedule(begin_step=2, end_step=-1,
                                                 frequency=3))
  # batches: step seq 0,1,2(upd),2,3,4,5(upd),5,...
  assert predict_update_batches(rigl, 8) == {2, 6}
  set_algo = algorithms.SET(schedule=UpdateSchedule(begin_step=1, end_step=4,
                                                    frequency=2))
  # post-increment steps 1..8; updates at 1 and 3 -> batches 0 and 2.
  assert predict_update_batches(set_algo, 8) == {0, 2}
  snip = algorithms.SNIP()
  assert predict_update_batches(snip, 5) == {0}


def test_snapshot_mask_updates(tmp_path):
  import os
  from rigl_tpu.utils.metrics import read_metrics
  cfg = _cfg(training_method='rigl', train_steps=6, maskupdate_frequency=3,
             maskupdate_begin_step=2, snapshot_mask_updates=True,
             checkpoint_dir=str(tmp_path / 'out'), log_every=0)
  t = Trainer(cfg)
  t.train()
  recs = read_metrics(str(tmp_path / 'out'))
  upd = [r for r in recs if 'mask_update_grad_norm_improvement' in r]
  assert len(upd) == 2  # updates at steps 2 and 5
  assert all(np.isfinite(r['mask_update_grad_norm_pre']) for r in upd)
  assert os.path.isdir(str(tmp_path / 'out' / 'pre_update'))
  assert os.path.isdir(str(tmp_path / 'out' / 'post_update'))


def test_tensor_parallel_sharding():
  """n_model_shards=2 on the 8-device test mesh: large kernels shard over
  'model', masks/slots co-shard, and training still works end to end."""
  t = Trainer(_cfg(training_method='rigl', train_steps=6,
                   maskupdate_frequency=2, n_model_shards=2,
                   batch_size=32))
  state = t.init_state()
  kernel = state.params['params']['layer1']['kernel']   # (784, 300)
  from jax.sharding import PartitionSpec as P
  assert kernel.sharding.spec == P(None, 'model')
  mask = state.sparse.masks['layer1/kernel']
  assert mask.sharding.spec == P(None, 'model')
  result = t.train()
  assert np.isfinite(result['eval_loss'])
  assert result['global_sparsity'] == pytest.approx(0.8, abs=0.05)


def test_auto_resume_continues_training(tmp_path):
  cfg = _cfg(training_method='set', train_steps=4, maskupdate_frequency=2,
             checkpoint_dir=str(tmp_path / 'run'), log_every=0)
  t1 = Trainer(cfg)
  t1.train()
  assert int(t1.state.sparse.step) == 4
  # Second trainer with a larger target resumes from step 4 and only runs
  # the remaining batches.
  cfg2 = _cfg(training_method='set', train_steps=10, maskupdate_frequency=2,
              checkpoint_dir=str(tmp_path / 'run'), log_every=0)
  t2 = Trainer(cfg2)
  result = t2.train()
  assert int(t2.state.sparse.step) == 10
  assert result['batches'] == 6  # only the remaining steps


def test_auto_resume_rigl_batch_accounting(tmp_path):
  from rigl_tpu.train.trainer import simulate_step_sequence
  # Resume mid-schedule: batch count accounts for restored last_update_step.
  rigl = algorithms.RigL(schedule=UpdateSchedule(begin_step=0, end_step=-1,
                                                 frequency=3))
  full = simulate_step_sequence(rigl, 9)
  first = simulate_step_sequence(rigl, 5)
  # Continuing from step 5 (last update at 3).
  rest = simulate_step_sequence(rigl, 9, start_step=5, start_last_update=3)
  assert first + rest == full


def test_block_flags_through_config():
  from rigl_tpu.ops.block_mask import pool_to_blocks
  t = Trainer(_cfg(training_method='rigl', block_width=4, block_height=4,
                   mask_init_method='random', sparsity=0.5, train_steps=3))
  t.init_state()
  m = t.state.sparse.masks['layer1/kernel']  # 784x300: 4x4 divides
  blocks = pool_to_blocks(m, (4, 4), 'mean')
  assert set(np.unique(np.asarray(blocks))) <= {0.0, 1.0}


def test_mask_type_through_config():
  t = Trainer(_cfg(training_method='scratch', mask_type='per_neuron',
                   sparsity=0.5, train_steps=2, mask_init_method='random'))
  t.init_state()
  m = np.asarray(t.state.sparse.masks['layer1/kernel'])
  fan_ins = m.sum(axis=0)
  assert len(set(fan_ins.tolist())) == 1


def test_init_masks_from_other_run(tmp_path):
  """Topology transfer: train run A, start run B with A's masks but fresh
  params (imagenet utils mask-suffix restore parity)."""
  cfg_a = _cfg(training_method='set', train_steps=4, maskupdate_frequency=2,
               checkpoint_dir=str(tmp_path / 'a'), log_every=0)
  ta = Trainer(cfg_a)
  ta.train()
  masks_a = np.asarray(ta.state.sparse.masks['layer1/kernel'])

  cfg_b = _cfg(training_method='static', train_steps=2, seed=5,
               init_masks_from=str(tmp_path / 'a'))
  tb = Trainer(cfg_b)
  state = tb.init_state()
  np.testing.assert_array_equal(
      np.asarray(state.sparse.masks['layer1/kernel']), masks_a)
  # Params are fresh (different seed, not A's).
  assert not np.array_equal(
      np.asarray(state.params['params']['layer1']['kernel']),
      np.asarray(ta.state.params['params']['layer1']['kernel']))

  # Shuffled-mask control: same sparsity, different layout.
  cfg_c = _cfg(training_method='static', train_steps=2, seed=5,
               init_masks_from=str(tmp_path / 'a'),
               shuffle_loaded_masks=True)
  tc = Trainer(cfg_c)
  sc = tc.init_state()
  mc = np.asarray(sc.sparse.masks['layer1/kernel'])
  assert mc.sum() == masks_a.sum()
  assert not np.array_equal(mc, masks_a)


@pytest.mark.parametrize('method', ['rigl', 'set'])
def test_static_update_steps_matches_default(method):
  """Host-gated program specialization follows the cond trajectory."""
  t0 = Trainer(_cfg(training_method=method))
  r0 = t0.train(total_steps=6)
  m0 = jax.tree.map(np.asarray, t0.state.sparse.masks)

  t1 = Trainer(_cfg(training_method=method, static_update_steps=True))
  r1 = t1.train(total_steps=6)
  assert int(t1.state.sparse.step) == int(t0.state.sparse.step)
  for p, m in m0.items():
    np.testing.assert_array_equal(np.asarray(t1.state.sparse.masks[p]), m, p)
  np.testing.assert_allclose(r1['final_loss'], r0['final_loss'], rtol=1e-4,
                             atol=1e-6)


def test_auto_resume_with_premask_and_hints(tmp_path):
  """Resume restores the pre-masked invariant and the host-side schedule
  counters stay consistent across the checkpoint boundary."""
  kw = dict(training_method='rigl', maskupdate_frequency=2,
            checkpoint_dir=str(tmp_path / 'run'), log_every=0,
            premask_params=True, static_update_steps=True)
  t1 = Trainer(_cfg(train_steps=3, **kw))
  t1.train()
  t2 = Trainer(_cfg(train_steps=8, **kw))
  t2.train()
  assert int(t2.state.sparse.step) == 8
  # Invariant survives resume: inactive weights exactly zero.
  for p, m in t2.state.sparse.masks.items():
    leaf = t2.state.params['params']
    for part in p.split('/'):
      leaf = leaf[part]
    np.testing.assert_array_equal(
        np.asarray(leaf) * (1 - np.asarray(m)), 0.0, err_msg=p)


def test_wrong_update_hint_fails_loudly(monkeypatch):
  """debug_checks: a deliberately-wrong host schedule prediction must raise
  instead of silently diverging (VERDICT r1 weak #5)."""
  from rigl_tpu.train import trainer as trainer_mod

  real = trainer_mod.predict_update_batches

  def wrong(algo, n_batches, **kw):
    return {b + 1 for b in real(algo, n_batches, **kw) if b + 1 < n_batches}

  monkeypatch.setattr(trainer_mod, 'predict_update_batches', wrong)
  t = Trainer(_cfg(training_method='rigl', static_update_steps=True,
                   log_every=4))
  with pytest.raises(RuntimeError, match='hint mismatch'):
    t.train(total_steps=6)


def test_premask_violation_fails_loudly():
  """debug_checks: params drifting off zero at inactive positions raise."""
  import jax.numpy as jnp
  t = Trainer(_cfg(training_method='rigl', premask_params=True,
                   maskupdate_begin_step=100, log_every=1))
  t.init_state()
  # Corrupt one inactive weight.
  path = next(iter(t.state.sparse.masks))
  leaf = t.state.params['params']
  parts = path.split('/')
  for part in parts[:-1]:
    leaf = leaf[part]
  w = np.asarray(leaf[parts[-1]])
  m = np.asarray(t.state.sparse.masks[path])
  idx = np.argwhere(m.reshape(-1) == 0)[0][0]
  w = w.reshape(-1).copy()
  w[idx] = 0.5
  leaf[parts[-1]] = jnp.asarray(w.reshape(m.shape))
  with pytest.raises(RuntimeError, match='premask invariant'):
    t.train(total_steps=2)


def test_latent_checkpoint_into_premask_run(tmp_path):
  """Restoring a latent-mode checkpoint into a premask run must zero
  optimizer slots at inactive positions too — latent mode keeps momentum
  at connections dropped by mask updates, and since masked grads are zero
  that stale momentum would walk 'premasked' weights off zero."""
  base = dict(training_method='rigl', maskupdate_frequency=2,
              checkpoint_dir=str(tmp_path / 'run'), log_every=0)
  t1 = Trainer(_cfg(train_steps=4, **base))   # latent mode
  t1.train()
  # Resume premasked, with no further mask updates in the window so
  # nothing re-heals the invariant.
  t2 = Trainer(_cfg(train_steps=7, premask_params=True,
                    maskupdate_end_step=2, **base))
  t2.train()
  for p, m in t2.state.sparse.masks.items():
    leaf = t2.state.params['params']
    for part in p.split('/'):
      leaf = leaf[part]
    np.testing.assert_array_equal(
        np.asarray(leaf) * (1 - np.asarray(m)), 0.0, err_msg=p)


def test_init_masks_from_with_premask_preserves_init_values(tmp_path):
  """Mask surgery + premask: the invariant is established under the FINAL
  masks, so weights at positions active in the transferred mask (but not
  the fresh-init mask) keep their init values instead of being zeroed."""
  cfg_a = _cfg(training_method='set', train_steps=4, maskupdate_frequency=2,
               checkpoint_dir=str(tmp_path / 'a'), log_every=0)
  Trainer(cfg_a).train()

  cfg_b = _cfg(training_method='static', train_steps=2, seed=5,
               init_masks_from=str(tmp_path / 'a'), premask_params=True)
  state = Trainer(cfg_b).init_state()
  # Reference: same seed, no surgery, no premask -> raw init params.
  raw = Trainer(_cfg(training_method='static', train_steps=2,
                     seed=5)).init_state()
  for p, m in state.sparse.masks.items():
    leaf, ref = state.params['params'], raw.params['params']
    for part in p.split('/'):
      leaf, ref = leaf[part], ref[part]
    m = np.asarray(m)
    np.testing.assert_array_equal(np.asarray(leaf) * (1 - m), 0.0, err_msg=p)
    np.testing.assert_array_equal(np.asarray(leaf) * m,
                                  np.asarray(ref) * m, err_msg=p)
