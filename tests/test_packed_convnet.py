"""PackedConvNet: packed block-sparse pointwise convs at depth — dense-twin
forward parity, and end-to-end training with RigL updates on packed storage
through PackedClassifierTrainer."""

import jax
import jax.numpy as jnp
import numpy as np

from rigl_tpu.models.packed_convnet import DenseConvNet, PackedConvNet
from rigl_tpu.train.packed_classifier import (PackedClassifierConfig,
                                              PackedClassifierTrainer)
from rigl_tpu.train.packed_lm import dense_twin_params

KW = dict(num_classes=10, stem_width=16, stages=((16, 2), (32, 2)))


def _digits_8x8():
  from sklearn.datasets import load_digits
  x, y = load_digits(return_X_y=True)
  x = (x / 16.0).astype(np.float32).reshape(-1, 8, 8, 1)
  test = np.arange(len(x)) % 5 == 0
  return (x[~test], y[~test].astype(np.int32),
          x[test], y[test].astype(np.int32))


def test_packed_convnet_matches_dense_twin():
  model = PackedConvNet(sparsity=0.5, block=(16, 16), bm=32, **KW)
  x = jnp.asarray(np.random.RandomState(0).randn(4, 8, 8, 1), jnp.float32)
  variables = model.init(jax.random.key(0), x)
  y_packed = model.apply(variables, x)

  twin = DenseConvNet(**KW)
  tv = dense_twin_params(variables['params'], variables['packing'], (16, 16))
  y_twin = twin.apply({'params': tv}, x)
  assert y_packed.shape == (4, 10)
  np.testing.assert_allclose(np.asarray(y_packed), np.asarray(y_twin),
                             rtol=1e-4, atol=1e-4)


def test_packed_convnet_trains_on_digits():
  xtr, ytr, xte, yte = _digits_8x8()
  cfg = PackedClassifierConfig(
      sparsity=0.5, block=(16, 16), learning_rate=0.05, train_steps=150,
      batch_size=100, maskupdate_begin_step=0, maskupdate_end_step=100,
      maskupdate_frequency=40, seed=0)
  model = PackedConvNet(sparsity=cfg.sparsity, block=cfg.block, bm=32, **KW)
  twin = DenseConvNet(**KW)
  tr = PackedClassifierTrainer(model, twin, cfg, input_shape=(8, 8, 1))
  res = tr.train((xtr, ytr), eval_xy=(xte, yte))
  assert res['mask_updates'] >= 2
  assert res['batches'] == res['train_steps'] + res['mask_updates']
  # floor arithmetic per layer (get_n_zeros): 1x1 and 1x2 block grids at
  # s=0.5 keep 1 block each -> 2 of 3 blocks total.
  assert res['n_params_packed'] < res['n_params_dense_equiv']
  assert res['eval_top_1'] > 0.7, res
