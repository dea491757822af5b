"""Spatial (KxK) convs on PACKED block-sparse storage: dense-twin parity,
tap-engine parity, drop/grow equivalence with the block-mask dense path on
the conv's 2D view, and end-to-end WRN training through
PackedClassifierTrainer — VERDICT r2 item 4 (reference layer family:
resnet_model.py:306-501; WRN: rigl/cifar_resnet/resnet.py)."""

import flax.traverse_util as traverse
import jax
import jax.numpy as jnp
import numpy as np

from rigl_tpu.layers.packed_conv import DenseConvTwin, PackedConv
from rigl_tpu.models.packed_convnet import (DenseWideResNetTwin,
                                            PackedWideResNet)
from rigl_tpu.ops import block_mask as bm_lib
from rigl_tpu.ops.pallas import block_sparse_packed as bsp
from rigl_tpu.train.packed_classifier import (PackedClassifierConfig,
                                              PackedClassifierTrainer)
from rigl_tpu.train.packed_lm import dense_twin_params
from rigl_tpu.transforms import packed_training as pt

BLK = (16, 16)


def _layer(seed=0, cin=16, cout=32, sparsity=0.5, strides=(1, 1),
           engine='xla'):
  m = PackedConv(cout, (3, 3), sparsity=sparsity, block=BLK, bm=32,
                 strides=strides, engine=engine)
  x = jnp.asarray(np.random.RandomState(seed).randn(2, 8, 8, cin),
                  jnp.float32)
  variables = m.init(jax.random.key(seed), x)
  return m, x, variables


def test_packed_conv_matches_dense_twin():
  for strides in ((1, 1), (2, 2)):
    m, x, variables = _layer(strides=strides)
    y = m.apply(variables, x)
    twin = DenseConvTwin(32, (3, 3), strides=strides)
    tv = dense_twin_params(variables['params'], variables['packing'], BLK)
    y_twin = twin.apply({'params': tv}, x)
    # Identical math (same lax.conv on the same dense view): exact.
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y_twin))


def test_packed_conv_grads_are_packed_gather_of_dense():
  """d loss/d packed == the active blocks of the dense-view gradient (the
  unpack scatter's vjp): packed persistent grads, dense workspace only."""
  m, x, variables = _layer()

  def loss_packed(kernel):
    p = {**variables['params'], 'kernel': kernel}
    return jnp.sum(m.apply({'params': p,
                            'packing': variables['packing']}, x) ** 2)

  g_packed = jax.grad(loss_packed)(variables['params']['kernel'])

  twin = DenseConvTwin(32, (3, 3))
  tv = dense_twin_params(variables['params'], variables['packing'], BLK)

  def loss_dense(k2d):
    return jnp.sum(twin.apply({'params': {'d': {'kernel': k2d}}}, x) ** 2)

  g_dense = jax.grad(loss_dense)(tv['d']['kernel'])
  expect = bsp.pack_dense(g_dense, variables['packing']['kernel'], BLK)
  np.testing.assert_allclose(np.asarray(g_packed), np.asarray(expect),
                             rtol=1e-6, atol=1e-6)


def test_packed_conv_tap_engine_matches_xla():
  m_x, x, variables = _layer(engine='xla')
  m_t = PackedConv(32, (3, 3), sparsity=0.5, block=BLK, bm=32,
                   engine='tap')
  y_x = m_x.apply(variables, x)
  y_t = m_t.apply(variables, x)
  np.testing.assert_allclose(np.asarray(y_t), np.asarray(y_x),
                             rtol=1e-5, atol=1e-5)


def test_packed_conv_drop_grow_matches_blockwise_dense_path():
  """flax_packed_rigl_update on a PackedConv == blockwise_drop_grow on the
  conv's (kh*kw*cin, cout) dense view: same occupancy, same weights."""
  import optax
  m, x, variables = _layer(sparsity=0.5)
  params, packings = variables['params'], variables['packing']
  pk = packings['kernel']
  kernel = params['kernel']
  tx = optax.sgd(0.1, momentum=0.9)
  opt_state = tx.init(params)
  rs = np.random.RandomState(1)
  g2d = jnp.asarray(rs.randn(9 * 16, 32), jnp.float32)
  df = 0.3

  out = pt.flax_packed_rigl_update(
      params, packings, opt_state, tx, {('kernel',): g2d},
      jnp.float32(df), BLK)

  w2d = bsp.unpack_dense(kernel, pk, BLK)
  mask = bm_lib.expand_from_blocks(pt.occupancy_grid(pk), w2d.shape, BLK)
  res = bm_lib.blockwise_drop_grow(mask, w2d, jnp.abs(w2d), jnp.abs(g2d),
                                   jnp.float32(df), BLK)
  occ_dense = bm_lib.pool_to_blocks(res.mask, BLK, 'max')
  np.testing.assert_array_equal(np.asarray(out.occupancy[('kernel',)]),
                                np.asarray(occ_dense))
  w_new = bsp.unpack_dense(out.params['kernel'], out.packings['kernel'], BLK)
  np.testing.assert_array_equal(np.asarray(w_new),
                                np.asarray(res.weights * res.mask))


def test_packed_wrn_trains_and_updates():
  """WRN-10-1, every 3x3 conv packed: trains on synthetic data through
  PackedClassifierTrainer with RigL drop/grow on the packed spatial
  storage; skip-apply accounting holds and packed memory < dense."""
  rs = np.random.RandomState(0)
  # Separable synthetic task: class = quadrant of the image mean pattern.
  x = rs.randn(512, 8, 8, 3).astype(np.float32)
  w_true = rs.randn(8 * 8 * 3, 4).astype(np.float32)
  y = (x.reshape(512, -1) @ w_true).argmax(-1).astype(np.int32)

  cfg = PackedClassifierConfig(
      sparsity=0.6, block=BLK, learning_rate=0.05, train_steps=60,
      batch_size=64, maskupdate_begin_step=0, maskupdate_end_step=40,
      maskupdate_frequency=20, seed=0)
  model = PackedWideResNet(depth=10, width=1, num_classes=4,
                           sparsity=cfg.sparsity, block=cfg.block)
  twin = DenseWideResNetTwin(depth=10, width=1, num_classes=4)
  tr = PackedClassifierTrainer(model, twin, cfg, input_shape=(8, 8, 3))
  res = tr.train((x, y), eval_xy=(x[:128], y[:128]))
  assert res['mask_updates'] >= 2
  assert res['batches'] == res['train_steps'] + res['mask_updates']
  assert res['n_params_packed'] < 0.7 * res['n_params_dense_equiv']
  assert np.isfinite(res['final_loss'])
  assert res['eval_top_1'] > 0.5, res

  # Occupancy counts preserved across updates (static shapes) and the
  # dense-twin parity still holds after drop/grow.
  flat_p = traverse.flatten_dict(tr.params)
  flat_pk = traverse.flatten_dict(tr.packings)
  for path, pk in flat_pk.items():
    occ = pt.occupancy_grid(pk)
    assert int(np.asarray(occ).sum()) == flat_p[path].shape[0]
  xb = jnp.asarray(x[:8])
  y_packed = model.apply({'params': tr.params, 'packing': tr.packings}, xb)
  tv = dense_twin_params(tr.params, tr.packings, cfg.block)
  y_twin = twin.apply({'params': tv}, xb)
  np.testing.assert_array_equal(np.asarray(y_packed), np.asarray(y_twin))


def test_packed_bottleneck_group_parity_and_trains():
  """RN50-style bottleneck group, every conv packed (1x1 matmul engine +
  3x3 spatial storage): exact dense-twin parity and end-to-end training
  with drop/grow across BOTH packed layer kinds in one tree."""
  from rigl_tpu.models.packed_convnet import (DenseBottleneckGroupTwin,
                                              PackedBottleneckGroup)
  kw = dict(num_classes=4, features=16, blocks=2, block=BLK)
  model = PackedBottleneckGroup(sparsity=0.5, bm=32, **kw)
  twin = DenseBottleneckGroupTwin(**kw)
  x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 3), jnp.float32)
  variables = model.init(jax.random.key(0), x)
  y = model.apply(variables, x)
  tv = dense_twin_params(variables['params'], variables['packing'], BLK)
  y_twin = twin.apply({'params': tv}, x)
  # 1x1s run the packed Pallas matmul vs the twin's XLA matmul: float
  # reduction order differs, so allclose (the 3x3 parity is exact and
  # covered above).
  np.testing.assert_allclose(np.asarray(y), np.asarray(y_twin),
                             rtol=2e-5, atol=2e-5)

  rs = np.random.RandomState(0)
  xd = rs.randn(256, 8, 8, 3).astype(np.float32)
  w_true = rs.randn(8 * 8 * 3, 4).astype(np.float32)
  yd = (xd.reshape(256, -1) @ w_true).argmax(-1).astype(np.int32)
  cfg = PackedClassifierConfig(
      sparsity=0.5, block=BLK, learning_rate=0.05, train_steps=40,
      batch_size=64, maskupdate_begin_step=0, maskupdate_end_step=30,
      maskupdate_frequency=15, seed=0)
  tr = PackedClassifierTrainer(
      PackedBottleneckGroup(sparsity=cfg.sparsity, bm=32, **kw),
      twin, cfg, input_shape=(8, 8, 3))
  res = tr.train((xd, yd))
  assert res['mask_updates'] >= 2
  assert res['batches'] == res['train_steps'] + res['mask_updates']
  assert res['n_params_packed'] < 0.7 * res['n_params_dense_equiv']
  assert np.isfinite(res['final_loss'])
