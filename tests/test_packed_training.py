"""Packed-storage sparse training (transforms/packed_training.py +
layers/packed_dense.py): drop/grow on packed storage must match the
block-mask dense path EXACTLY — same pooled kernel, same floor arithmetic
(reference semantics via sparsity/update.py:drop_grow_update)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rigl_tpu.ops import block_mask as bm_lib
from rigl_tpu.ops.pallas import block_sparse_packed as bsp
from rigl_tpu.transforms import packed_training as pt

BLK = (128, 128)
K = N = 512


def _setup(sparsity=0.5, seed=0):
  rs = np.random.RandomState(seed)
  w = jnp.asarray(rs.randn(K, N) * 0.1, jnp.float32)
  occ = jnp.asarray(rs.permutation(
      np.repeat([1, 0], [8, 8]).astype(np.int32)).reshape(4, 4))
  mask = bm_lib.expand_from_blocks(occ, (K, N), BLK)
  wm = w * mask
  n_active = int(np.asarray(occ).sum())
  packing = bsp.make_packing(occ, n_active)
  packed = bsp.pack_dense(wm, packing, BLK)
  grads = jnp.asarray(rs.randn(K, N), jnp.float32)
  return wm, mask, occ, n_active, packing, packed, grads


def test_packed_drop_grow_matches_blockwise_dense_path():
  wm, mask, occ, n_active, packing, packed, grads = _setup()
  df = 0.3

  # Reference: the shipped block-mask dense path.
  res = bm_lib.blockwise_drop_grow(mask, wm, jnp.abs(wm), jnp.abs(grads),
                                   df, BLK)
  ref_occ = (bm_lib.pool_to_blocks(res.mask, BLK, 'max') > 0).astype(
      jnp.int32)

  # Packed path: same pooled grow scores.
  grow_grid = bm_lib.pool_to_blocks(jnp.abs(grads), BLK, 'sum')
  out = pt.packed_drop_grow(packed, packing, grow_grid, df, n_active)

  np.testing.assert_array_equal(np.asarray(out.occupancy),
                                np.asarray(ref_occ))
  # Weight values: survivors keep values, grown blocks are zero — the
  # dense path's new_weights with zeros grow_tensor, restricted to mask.
  np.testing.assert_array_equal(
      np.asarray(bsp.unpack_dense(out.packed, out.packing, BLK)),
      np.asarray(res.weights * res.mask))
  # Count invariance (static shapes across the run).
  assert int(out.occupancy.sum()) == n_active
  assert int(np.asarray(out.grown).sum()) > 0


def test_packed_drop_grow_jits():
  wm, mask, occ, n_active, packing, packed, grads = _setup()
  grow_grid = bm_lib.pool_to_blocks(jnp.abs(grads), BLK, 'sum')
  fn = jax.jit(lambda p, pk, g: pt.packed_drop_grow(p, pk, g, 0.3,
                                                    n_active))
  out = fn(packed, packing, grow_grid)
  assert out.packed.shape == packed.shape
  assert int(out.occupancy.sum()) == n_active


def test_permute_opt_state_resets_grown_and_carries_survivors():
  wm, mask, occ, n_active, packing, packed, grads = _setup()
  grow_grid = bm_lib.pool_to_blocks(jnp.abs(grads), BLK, 'sum')
  out = pt.packed_drop_grow(packed, packing, grow_grid, 0.3, n_active)

  tx = optax.sgd(0.1, momentum=0.9)
  opt = tx.init(packed)
  # Fake momentum: slot index stamped into every element.
  mom = jnp.broadcast_to(
      jnp.arange(1, n_active + 1, dtype=jnp.float32)[:, None, None],
      packed.shape)
  opt = jax.tree.map(
      lambda leaf: mom if getattr(leaf, 'shape', None) == packed.shape
      else leaf, opt)
  new_opt = pt.permute_opt_state(opt, packing, out.packing, out.grown)
  new_mom = jax.tree.leaves(new_opt)[0]
  grown = np.asarray(out.grown)
  # Grown slots zeroed.
  assert np.all(np.asarray(new_mom)[grown] == 0)
  # Survivors carry their ORIGINAL slot's stamp (a permutation of 1..n).
  survivors = np.asarray(new_mom)[~grown, 0, 0]
  assert set(survivors.astype(int)) <= set(range(1, n_active + 1))
  assert len(set(survivors.astype(int))) == len(survivors)


def test_packed_dense_layer():
  from rigl_tpu.layers import PackedDense
  model = PackedDense(features=256, sparsity=0.75, block=(128, 128), bm=128)
  x = jnp.asarray(np.random.RandomState(0).randn(64, 256), jnp.float32)
  variables = model.init(jax.random.key(0), x)
  # 2x2 grid, 75% sparse -> exactly 1 active block (floor arithmetic).
  assert variables['params']['kernel'].shape == (1, 128, 128)
  y = model.apply(variables, x)
  assert y.shape == (64, 256)
  # Equivalent dense: unpack and matmul.
  wd = bsp.unpack_dense(variables['params']['kernel'],
                        variables['packing']['kernel'], (128, 128))
  ref = x @ wd + variables['params']['bias']
  np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=2e-4)


def test_packed_dense_trains():
  """A few SGD steps reduce loss; gradients exist only on packed storage."""
  from rigl_tpu.layers import PackedDense

  class Net(nn.Module):
    @nn.compact
    def __call__(self, x):
      x = PackedDense(256, sparsity=0.5, block=(128, 128), bm=128,
                      name='p0')(x)
      return PackedDense(128, sparsity=0.5, block=(128, 128), bm=128,
                         name='p1')(nn.relu(x))

  rs = np.random.RandomState(0)
  x = jnp.asarray(rs.randn(64, 256), jnp.float32)
  t = jnp.asarray(rs.randn(64, 128), jnp.float32)
  model = Net()
  variables = model.init(jax.random.key(0), x)
  params, packing = variables['params'], variables['packing']
  tx = optax.sgd(0.05, momentum=0.9)
  opt = tx.init(params)

  def loss_fn(params):
    y = model.apply({'params': params, 'packing': packing}, x)
    return jnp.mean((y - t) ** 2)

  @jax.jit
  def step(params, opt):
    loss, g = jax.value_and_grad(loss_fn)(params)
    up, opt = tx.update(g, opt, params)
    return optax.apply_updates(params, up), opt, loss

  losses = []
  for _ in range(30):
    params, opt, loss = step(params, opt)
    losses.append(float(loss))
  assert losses[-1] < losses[0] * 0.8
