"""Tensor-parallel packed storage in the CONV family: PackedConv1x1 with
tp_shards stacked column groups, and the full PackedClassifierTrainer over
a (data, model) mesh (shard_map step == unsharded step on identical
stacked state, through a RigL drop/grow)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rigl_tpu.layers.packed_conv import PackedConv1x1
from rigl_tpu.models.packed_convnet import DenseConvNet, PackedConvNet
from rigl_tpu.parallel import packed_tp as tp
from rigl_tpu.train.packed_classifier import (PackedClassifierConfig,
                                              PackedClassifierTrainer)

NET = dict(num_classes=10, stem_width=16,
           stages=((32, 2), (32, 1)))
PACKED = dict(sparsity=0.5, block=(16, 16), bm=32, **NET)
CFG = dict(sparsity=0.5, block=(16, 16), learning_rate=0.05,
           train_steps=4, batch_size=8, maskupdate_begin_step=0,
           maskupdate_end_step=100, maskupdate_frequency=2,
           drop_fraction=0.5, seed=1)


def _data(n=64, seed=0):
  rs = np.random.RandomState(seed)
  x = rs.randn(n, 8, 8, 1).astype(np.float32)
  y = rs.randint(0, 10, size=n)
  return x, y


def test_tp_packed_conv_matches_dense_view():
  """tp_shards=2 PackedConv1x1 (global, no mesh) == per-pixel matmul with
  the unpacked kernel."""
  m = PackedConv1x1(32, sparsity=0.5, block=(16, 16), bm=32, tp_shards=2)
  x = jnp.asarray(np.random.RandomState(0).randn(2, 4, 4, 32), jnp.float32)
  variables = m.init(jax.random.key(0), x)
  kernel = variables['params']['kernel']
  pk = variables['packing']['kernel']
  assert kernel.ndim == 4 and kernel.shape[0] == 2
  assert tp.is_stacked(pk)
  y = m.apply(variables, x)
  wd = tp.unpack_dense_tp(kernel, pk, (16, 16))
  np.testing.assert_allclose(np.asarray(y), np.asarray(x @ wd),
                             rtol=1e-5, atol=1e-5)


def _trainers():
  cfg = PackedClassifierConfig(n_data=2, n_model=2, **CFG)
  model = PackedConvNet(tp_shards=2, **PACKED)
  twin = DenseConvNet(**NET)
  sharded = PackedConvNet(tp_shards=2, tp_axis='model', **PACKED)
  return PackedClassifierTrainer(model, twin, cfg, input_shape=(8, 8, 1),
                                 model_sharded=sharded)


def test_tp_conv_trainer_sharded_step_matches_unsharded():
  if len(jax.devices()) < 4:
    pytest.skip('needs 4 devices')
  tr = _trainers()
  tr.init_state()
  p_ref = jax.tree.map(jnp.copy, tr.params)
  os_ref = jax.tree.map(jnp.copy, tr.opt_state)
  pk_ref = jax.tree.map(jnp.copy, tr.packings)
  x, y = _data()

  @jax.jit
  def ref(params, packings, opt_state, xb, yb):
    loss, g = jax.value_and_grad(
        lambda p: tr._loss(p, packings, xb, yb))(params)
    updates, opt_state = tr.tx.update(g, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss

  for _ in range(2):
    xb, yb = tr.sample_batch(x, y)
    loss_sh = tr.train_step(xb, yb)
    p_ref, os_ref, loss_ref = ref(p_ref, pk_ref, os_ref, xb, yb)
    np.testing.assert_allclose(loss_sh, float(loss_ref), rtol=1e-5)
  for (pa, a), (pb, b) in zip(
      jax.tree_util.tree_leaves_with_path(tr.params),
      jax.tree_util.tree_leaves_with_path(p_ref)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-4, atol=1e-6, err_msg=str(pa))

  # Drop/grow on the sharded trainer preserves per-group counts and the
  # step keeps running on the new packings (static shard shapes).
  xb, yb = tr.sample_batch(x, y)
  tr.step = 2
  occ = tr.mask_update(xb, yb)
  assert occ
  import flax.traverse_util as tv
  for path, pk in tv.flatten_dict(tr.packings).items():
    assert tp.is_stacked(pk)
    grid = np.asarray(tp.tp_occupancy_grid(pk))
    nmod = tp.n_groups(pk)
    nn_local = grid.shape[1] // nmod
    counts = [grid[:, g * nn_local:(g + 1) * nn_local].sum()
              for g in range(nmod)]
    assert len(set(counts)) == 1, (path, counts)
  assert np.isfinite(tr.train_step(*tr.sample_batch(x, y)))


def test_tp_conv_trainer_trains_and_evaluates():
  if len(jax.devices()) < 4:
    pytest.skip('needs 4 devices')
  tr = _trainers()
  x, y = _data(128)
  res = tr.train((x, y), eval_xy=(x[:32], y[:32]))
  assert res['train_steps'] == CFG['train_steps']
  assert res['mask_updates'] >= 1
  assert np.isfinite(res['final_loss'])
  assert 0.0 <= res['eval_top_1'] <= 1.0
  # Dense-equiv accounting covers ALL groups of the stacked layout.
  assert res['n_params_dense_equiv'] > res['n_params_packed']
