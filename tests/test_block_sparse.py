"""Tests for block masks and the Pallas block-sparse matmul (interpret mode
on CPU; numerics vs the dense-times-mask reference, fwd + both grads)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rigl_tpu.ops import block_mask as bm_lib
from rigl_tpu.ops.pallas import block_sparse


def test_pool_and_expand_roundtrip():
  m = jnp.asarray(np.random.RandomState(0).rand(64, 256) > 0.5,
                  jnp.float32)
  pooled = bm_lib.pool_to_blocks(m, (16, 64), 'max')
  assert pooled.shape == (4, 4)
  exp = bm_lib.expand_from_blocks(pooled, (64, 256), (16, 64))
  assert exp.shape == (64, 256)
  # Expansion of max-pooled covers the original mask.
  assert np.all(np.asarray(exp) >= np.asarray(m))


def test_pool_conv_kernel_2d_view():
  m = jnp.ones((3, 3, 16, 32))
  pooled = bm_lib.pool_to_blocks(m, (16, 8))
  assert pooled.shape == (9, 4)  # (3*3*16/16, 32/8)


def test_pool_indivisible_raises():
  with pytest.raises(ValueError, match='does not divide'):
    bm_lib.pool_to_blocks(jnp.ones((10, 10)), (3, 5))


def test_random_block_mask_sparsity():
  m = bm_lib.random_block_mask(jax.random.key(0), (64, 64), 0.75, (8, 8))
  assert float(jnp.mean(m)) == pytest.approx(0.25, abs=0.01)
  # Block structure: each 8x8 block constant.
  blocks = bm_lib.pool_to_blocks(m, (8, 8), 'mean')
  assert set(np.unique(np.asarray(blocks))) <= {0.0, 1.0}


def test_blockwise_drop_grow_preserves_block_structure():
  key = jax.random.key(0)
  mask = bm_lib.random_block_mask(key, (32, 32), 0.5, (8, 8))
  weights = jax.random.normal(jax.random.key(1), (32, 32))
  score_drop = jnp.abs(mask * weights)
  score_grow = jax.random.uniform(jax.random.key(2), (32, 32))
  res = bm_lib.blockwise_drop_grow(mask, weights, score_drop, score_grow,
                                   0.5, (8, 8))
  # Still block-structured, same block count.
  blocks = bm_lib.pool_to_blocks(res.mask, (8, 8), 'mean')
  assert set(np.unique(np.asarray(blocks))) <= {0.0, 1.0}
  assert float(jnp.sum(res.mask)) == float(jnp.sum(mask))
  # Grown blocks zero-initialized.
  assert np.all(np.asarray(res.weights)[np.asarray(res.new_connections)] == 0)


@pytest.mark.parametrize('m,k,n,block,bm_tile', [
    (32, 64, 128, (16, 64), 16),
    (48, 128, 128, (32, 32), 16),   # M not divisible by bm -> padding
])
def test_block_sparse_matmul_forward(m, k, n, block, bm_tile):
  rs = np.random.RandomState(0)
  x = jnp.asarray(rs.randn(m, k), jnp.float32)
  w = jnp.asarray(rs.randn(k, n), jnp.float32)
  bmask = jnp.asarray(rs.rand(k // block[0], n // block[1]) > 0.5,
                      jnp.int32)
  y = block_sparse.block_sparse_matmul(x, w, bmask, block, bm_tile)
  y_ref = block_sparse.dense_reference(x, w, bmask, block)
  np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-5,
                             atol=1e-4)


def test_block_sparse_matmul_gradients():
  rs = np.random.RandomState(1)
  m, k, n, block = 32, 64, 64, (16, 32)
  x = jnp.asarray(rs.randn(m, k), jnp.float32)
  w = jnp.asarray(rs.randn(k, n), jnp.float32)
  bmask = jnp.asarray(rs.rand(k // block[0], n // block[1]) > 0.4, jnp.int32)

  def f_sparse(x, w):
    return jnp.sum(
        block_sparse.block_sparse_matmul(x, w, bmask, block, 16) ** 2)

  def f_ref(x, w):
    return jnp.sum(block_sparse.dense_reference(x, w, bmask, block) ** 2)

  gx, gw = jax.grad(f_sparse, argnums=(0, 1))(x, w)
  gx_ref, gw_ref = jax.grad(f_ref, argnums=(0, 1))(x, w)
  np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=1e-4,
                             atol=1e-3)
  # dw: the pallas kernel only produces gradients at ACTIVE blocks (inactive
  # blocks' dense grads are handled by the trainer's dense path at update
  # steps); masked positions of the reference grad are masked too.
  from rigl_tpu.ops.block_mask import expand_from_blocks
  mask_el = expand_from_blocks(bmask.astype(jnp.float32), w.shape, block)
  np.testing.assert_allclose(np.asarray(gw),
                             np.asarray(gw_ref * mask_el), rtol=1e-4,
                             atol=1e-3)


def test_block_sparse_all_blocks_off():
  x = jnp.ones((16, 32), jnp.float32)
  w = jnp.ones((32, 64), jnp.float32)
  bmask = jnp.zeros((2, 2), jnp.int32)
  y = block_sparse.block_sparse_matmul(x, w, bmask, (16, 32), 16)
  assert float(jnp.sum(jnp.abs(y))) == 0.0


def test_block_sparse_dense_layer():
  """BlockSparseDense matches MaskedDense given a block-structured mask,
  forward and gradients (interpret mode on CPU)."""
  import jax
  from rigl_tpu.layers import BlockSparseDense, MaskedDense

  block, bm_tile = (16, 32), 16
  layer = BlockSparseDense(64, block=block, bm=bm_tile, use_bias=True)
  ref = MaskedDense(64, use_bias=True)
  x = jnp.asarray(np.random.RandomState(0).randn(8, 32), jnp.float32)
  variables = layer.init(jax.random.key(0), x)
  mask = bm_lib.random_block_mask(jax.random.key(1), (32, 64), 0.5, block)
  variables = {**variables, 'masks': {'kernel': mask}}

  y = layer.apply(variables, x)
  y_ref = ref.apply(variables, x)
  np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-5,
                             atol=1e-4)

  g = jax.grad(lambda v, x: jnp.sum(layer.apply(v, x) ** 2))(variables, x)
  g_ref = jax.grad(lambda v, x: jnp.sum(ref.apply(v, x) ** 2))(variables, x)
  np.testing.assert_allclose(
      np.asarray(g['params']['kernel']),
      np.asarray(g_ref['params']['kernel']), rtol=1e-4, atol=1e-3)


def test_block_sparse_dense_rejects_indivisible():
  from rigl_tpu.layers import BlockSparseDense
  import jax
  layer = BlockSparseDense(60, block=(16, 32))
  with pytest.raises(ValueError, match='divide block'):
    layer.init(jax.random.key(0), jnp.ones((4, 32)))


def test_block_sparse_conv1x1():
  import jax
  from rigl_tpu.ops.conv import block_sparse_conv1x1
  rs = np.random.RandomState(0)
  x = jnp.asarray(rs.randn(2, 8, 8, 32), jnp.float32)
  kernel = jnp.asarray(rs.randn(1, 1, 32, 64), jnp.float32)
  block = (16, 32)
  bmask = jnp.asarray(rs.rand(2, 2) > 0.3, jnp.int32)
  y = block_sparse_conv1x1(x, kernel, bmask, stride=1, block=block, bm=16)
  mask_el = bm_lib.expand_from_blocks(bmask.astype(jnp.float32),
                                      (32, 64), block)
  y_ref = jax.lax.conv_general_dilated(
      x, kernel * mask_el[None, None], (1, 1), 'VALID',
      dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
  np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-4,
                             atol=1e-4)
  # Stride 2 subsampling (exact for 1x1).
  y2 = block_sparse_conv1x1(x, kernel, bmask, stride=2, block=block, bm=16)
  y2_ref = jax.lax.conv_general_dilated(
      x, kernel * mask_el[None, None], (2, 2), 'VALID',
      dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
  np.testing.assert_allclose(np.asarray(y2), np.asarray(y2_ref), rtol=1e-4,
                             atol=1e-4)


def test_block_sparse_conv2d_3x3():
  """3x3 conv via patches + block-sparse matmul matches the dense conv.

  Note: the block mask here lives in the patch-feature ordering
  (Cin, kh, kw) emitted by conv_general_dilated_patches."""
  import jax
  from rigl_tpu.ops.conv import block_sparse_conv2d
  rs = np.random.RandomState(0)
  x = jnp.asarray(rs.randn(2, 8, 8, 8), jnp.float32)
  kernel = jnp.asarray(rs.randn(3, 3, 8, 32) * 0.1, jnp.float32)
  block, bm_tile = (24, 16), 16   # 72 patch rows / 24 = 3 blocks
  bmask = jnp.asarray(rs.rand(3, 2) > 0.3, jnp.int32)
  y = block_sparse_conv2d(x, kernel, bmask, stride=1, padding='SAME',
                          block=block, bm=bm_tile)
  # Reference: expand the block mask in patch order (Cin, kh, kw), apply to
  # the reordered kernel, dense conv.
  mask_el = bm_lib.expand_from_blocks(bmask.astype(jnp.float32),
                                      (72, 32), block)
  k2d = jnp.transpose(kernel, (2, 0, 1, 3)).reshape(72, 32) * mask_el
  k_masked = jnp.transpose(k2d.reshape(8, 3, 3, 32), (1, 2, 0, 3))
  y_ref = jax.lax.conv_general_dilated(
      x, k_masked, (1, 1), 'SAME',
      dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
  np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-4,
                             atol=1e-4)


def test_block_sparse_conv2d_stride2():
  import jax
  from rigl_tpu.ops.conv import block_sparse_conv2d
  rs = np.random.RandomState(1)
  x = jnp.asarray(rs.randn(1, 8, 8, 8), jnp.float32)
  kernel = jnp.asarray(rs.randn(3, 3, 8, 16) * 0.1, jnp.float32)
  bmask = jnp.ones((3, 1), jnp.int32)
  y = block_sparse_conv2d(x, kernel, bmask, stride=2, padding='SAME',
                          block=(24, 16), bm=16)
  y_ref = jax.lax.conv_general_dilated(
      x, kernel, (2, 2), 'SAME',
      dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
  assert y.shape == y_ref.shape == (1, 4, 4, 16)
  np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-4,
                             atol=1e-4)


def test_v4_flat_packed_matches_dense_reference():
  """v4 (flat-packed active blocks) fwd + dx + dw vs dense-times-mask,
  including empty output columns and both dw modes."""
  from rigl_tpu.ops.pallas.block_sparse_v4 import (block_sparse_matmul_v4,
                                                   pack_flat_active)
  from rigl_tpu.ops.block_mask import expand_from_blocks

  rs = np.random.RandomState(3)
  block, bm_tile = (16, 32), 16
  x = jnp.asarray(rs.randn(48, 64), jnp.float32)
  w = jnp.asarray(rs.randn(64, 96), jnp.float32)
  # occupancy with one fully-empty column block
  occ = np.array([[1, 0, 1],
                  [0, 0, 1],
                  [1, 0, 0],
                  [1, 0, 1]], np.int32)
  bmask = jnp.asarray(occ)
  n_active = int(occ.sum())
  cols, rows = pack_flat_active(bmask, n_active)
  mask_el = expand_from_blocks(bmask.astype(jnp.float32), (64, 96), block)

  for dw_mode in ('dense', 'gather'):
    y = block_sparse_matmul_v4(x, w, cols, rows, block, bm_tile, None,
                               dw_mode)
    y_ref = x @ (mask_el * w)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-4,
                               atol=1e-3)

    f = lambda x, w: jnp.sum(block_sparse_matmul_v4(
        x, w, cols, rows, block, bm_tile, None, dw_mode) ** 2)
    f_ref = lambda x, w: jnp.sum((x @ (mask_el * w)) ** 2)
    gx, gw = jax.grad(f, argnums=(0, 1))(x, w)
    gx_ref, gw_ref = jax.grad(f_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=1e-4,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw),
                               np.asarray(gw_ref * mask_el), rtol=1e-4,
                               atol=1e-3)


def test_v4_pack_flat_active_column_major():
  from rigl_tpu.ops.pallas.block_sparse_v4 import pack_flat_active
  occ = jnp.asarray([[0, 1], [1, 1]], jnp.int32)
  cols, rows = pack_flat_active(occ, 3)
  assert cols.shape == (4,) and rows.shape == (4,)
  np.testing.assert_array_equal(np.asarray(cols), [0, 1, 1, -1])
  np.testing.assert_array_equal(np.asarray(rows), [1, 0, 1, 0])


def test_static_block_counts_invariant():
  """SparseTraining reports static counts only where the invariant holds,
  and the reported count matches the realized mask through updates."""
  import optax
  from rigl_tpu.sparsity.schedules import UpdateSchedule
  from rigl_tpu.transforms import algorithms
  from rigl_tpu.transforms.sparse_training import SparseTraining
  from rigl_tpu.ops.block_mask import pool_to_blocks

  params = {'params': {'d': {'kernel': jnp.zeros((32, 64))}}}
  sched = UpdateSchedule(begin_step=0, end_step=100, frequency=1,
                         drop_fraction=0.5)
  st = SparseTraining(optax.sgd(0.1), algorithms.SET(schedule=sched),
                      distribution='uniform', default_sparsity=0.5,
                      block=(8, 8))
  _, sstate = st.init(jax.random.key(0), params)
  counts = st.static_block_counts()
  assert counts == {'d/kernel': 16}  # 32 blocks, floor(0.5*32)=16 zeros
  occ = pool_to_blocks(sstate.masks['d/kernel'], (8, 8), 'max')
  assert int(occ.sum()) == 16

  # run a few SET steps (mask updates every step) -> count invariant
  p, o, s = params, st.tx.init(params), sstate
  grads = jax.tree.map(jnp.ones_like, params)
  for _ in range(3):
    p, o, s, _ = st.step(p, o, s, grads)
  occ = pool_to_blocks(s.masks['d/kernel'], (8, 8), 'max')
  assert int(occ.sum()) == 16

  # gradual pruning changes counts -> no static counts
  st2 = SparseTraining(
      optax.sgd(0.1),
      algorithms.GradualPruning(schedule=UpdateSchedule(
          begin_step=0, end_step=10, frequency=2, drop_fraction=0.0)),
      distribution='uniform', default_sparsity=0.5, block=(8, 8))
  st2.init(jax.random.key(0), params)
  assert st2.static_block_counts() == {}


# ------------------------------------------------------ tap conv kernel --
def test_tap_pool_expand_roundtrip():
  """Tap pooling/expansion are inverses on block-constant masks."""
  rs = np.random.RandomState(3)
  shape = (3, 3, 16, 24)
  block = (8, 8)
  bm3 = jnp.asarray(rs.rand(9, 2, 3) > 0.5, jnp.float32)
  el = bm_lib.expand_from_tap_blocks(bm3, shape, block)
  assert el.shape == shape
  back = bm_lib.pool_to_tap_blocks(el, block, 'max')
  np.testing.assert_array_equal(np.asarray(back), np.asarray(bm3))
  # sum pooling counts elements per block
  np.testing.assert_array_equal(
      np.asarray(bm_lib.pool_to_tap_blocks(el, block, 'sum')),
      np.asarray(bm3) * 64)


def test_pack_tap_active_column_major_and_occupancy():
  import jax
  from rigl_tpu.ops.pallas.block_sparse_conv import (_occupancy3,
                                                     pack_tap_active)
  rs = np.random.RandomState(5)
  occ = jnp.asarray(rs.rand(9, 4, 3) > 0.6, jnp.int32)
  n = int(occ.sum())
  cols, rows, taps = pack_tap_active(occ, n)
  # Packing = actives + one dummy per column + sentinel.
  assert cols.shape == (n + 3 + 1,) and int(cols[-1]) == -1
  # Column-major: cols nondecreasing.
  c = np.asarray(cols[:-1])
  assert (np.diff(c) >= 0).all()
  # Each column's run starts with its dummy (tap -1).
  t = np.asarray(taps[:-1])
  for j in range(3):
    first = np.nonzero(c == j)[0][0]
    assert t[first] == -1, (j, first)
  # Round-trips to the same occupancy (dummies ignored).
  back = _occupancy3(cols, rows, taps, 9, 4, 3)
  np.testing.assert_array_equal(np.asarray(back), np.asarray(occ))


def test_tap_conv_matches_dense_5x5():
  """Generic (kh, kw): a 5x5 SAME conv through the tap kernel."""
  import jax
  from rigl_tpu.ops.pallas.block_sparse_conv import (block_sparse_conv_tap,
                                                     pack_tap_active)
  key = jax.random.key(2)
  block = (8, 8)
  x = jax.random.normal(jax.random.fold_in(key, 1), (2, 9, 6, 8))
  w = jax.random.normal(jax.random.fold_in(key, 2), (5, 5, 8, 16))
  mask = bm_lib.random_tap_block_mask(jax.random.fold_in(key, 3), w.shape,
                                      0.5, block)
  occ3 = (bm_lib.pool_to_tap_blocks(mask, block, 'max') > 0).astype(jnp.int32)
  packing = dict(zip(('cols', 'rows', 'taps'),
                     pack_tap_active(occ3, int(occ3.sum()))))
  y = block_sparse_conv_tap(x, w, packing, block, bm=16, interpret=True)
  y_ref = jax.lax.conv_general_dilated(
      x, w * mask, (1, 1), 'SAME',
      dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
  np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-4,
                             atol=1e-4)


def test_tap_conv_empty_mask_returns_zeros():
  import jax
  from rigl_tpu.ops.pallas.block_sparse_conv import (block_sparse_conv_tap,
                                                     pack_tap_active)
  occ3 = jnp.zeros((9, 1, 2), jnp.int32)
  packing = dict(zip(('cols', 'rows', 'taps'), pack_tap_active(occ3, 0)))
  x = jnp.ones((2, 4, 4, 8))
  w = jnp.ones((3, 3, 8, 16))
  y = block_sparse_conv_tap(x, w, packing, (8, 8), bm=16, interpret=True)
  np.testing.assert_array_equal(np.asarray(y), np.zeros((2, 4, 4, 16)))


def test_is_tap_layer_eligibility():
  assert bm_lib.is_tap_layer((3, 3, 128, 256), (128, 128))
  assert not bm_lib.is_tap_layer((1, 1, 128, 256), (128, 128))  # matmul path
  assert not bm_lib.is_tap_layer((3, 3, 64, 256), (128, 128))   # indivisible
  assert not bm_lib.is_tap_layer((128, 256), (128, 128))        # 2D kernel


@pytest.mark.parametrize('kshape', [(1, 1, 8, 16), (3, 3, 8, 16),
                                    (5, 5, 8, 16)])
def test_tap_dw_gather_matches_dense(kshape):
  """Block-sparse dw (active tap blocks only) equals the masked dense
  conv-backward-filter, including empty-mask columns and dummy entries."""
  import jax
  from rigl_tpu.ops.pallas.block_sparse_conv import (_dw_gather,
                                                     pack_tap_active)
  key = jax.random.key(5)
  block = (8, 8)
  kh, kw, cin, cout = kshape
  x = jax.random.normal(jax.random.fold_in(key, 1), (2, 6, 5, cin))
  gy = jax.random.normal(jax.random.fold_in(key, 2), (2, 6, 5, cout))
  mask = bm_lib.random_tap_block_mask(jax.random.fold_in(key, 3), kshape,
                                      0.5, block)
  occ3 = (bm_lib.pool_to_tap_blocks(mask, block, 'max') > 0).astype(jnp.int32)
  packing = dict(zip(('cols', 'rows', 'taps'),
                     pack_tap_active(occ3, int(occ3.sum()))))
  dw = _dw_gather(x, gy, kshape, packing, block, bm=16, interpret=True)

  ph, pw = kh // 2, kw // 2
  x_pad = jnp.pad(x, [(0, 0), (ph, ph), (pw, pw), (0, 0)])
  dw_ref = jnp.transpose(
      jax.lax.conv_general_dilated(
          x_pad, gy, (1, 1), 'VALID',
          dimension_numbers=('CHWN', 'IHWO', 'NHWC'),
          preferred_element_type=jnp.float32), (1, 2, 0, 3))
  dw_ref = dw_ref * bm_lib.expand_from_tap_blocks(
      occ3.astype(jnp.float32), kshape, block)
  np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref), rtol=1e-4,
                             atol=1e-4)


# --------------------------------------------------- v5 tap engine parity --
@pytest.mark.parametrize('kshape', [(1, 1, 8, 16), (3, 3, 8, 16),
                                    (5, 5, 8, 16)])
def test_tap_v5_engine_matches_dense_fwd_and_grads(kshape, monkeypatch):
  """RIGL_TAP_ENGINE=v5 (VMEM-panel engine): forward and both gradients
  match dense-times-mask, including the T=1 (1x1) fast path."""
  import jax
  from rigl_tpu.ops.pallas import block_sparse_conv as tap_lib
  monkeypatch.setenv('RIGL_TAP_ENGINE', 'v5')
  assert tap_lib.default_tap_engine() == 'v5'
  key = jax.random.key(7)
  block = (8, 8)
  kh, kw, cin, cout = kshape
  x = jax.random.normal(jax.random.fold_in(key, 1), (2, 7, 5, cin))
  w = jax.random.normal(jax.random.fold_in(key, 2), kshape)
  mask = bm_lib.random_tap_block_mask(jax.random.fold_in(key, 3), kshape,
                                      0.4, block)
  occ3 = (bm_lib.pool_to_tap_blocks(mask, block, 'max') > 0).astype(jnp.int32)
  packing = dict(zip(('cols', 'rows', 'taps'),
                     tap_lib.pack_tap_active(occ3, int(occ3.sum()))))

  def f(x, w):
    y = tap_lib.block_sparse_conv_tap(x, w, packing, block, bm=16,
                                      interpret=True)
    return jnp.sum(y ** 2), y

  (_, y), (dx, dw) = jax.value_and_grad(f, argnums=(0, 1), has_aux=True)(x, w)

  def f_ref(x, w):
    y = jax.lax.conv_general_dilated(
        x, w * mask, (1, 1), 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    return jnp.sum(y ** 2), y

  (_, y_ref), (dx_ref, dw_ref) = jax.value_and_grad(
      f_ref, argnums=(0, 1), has_aux=True)(x, w)
  np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-4,
                             atol=1e-4)
  np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref), rtol=1e-4,
                             atol=1e-4)
  np.testing.assert_allclose(np.asarray(dw),
                             np.asarray(dw_ref * mask), rtol=1e-4, atol=1e-4)


def test_tapcol_pack_csr_structure():
  """The v5 CSR packing: entries sorted by (tap, column), starts index the
  per-cell runs, dummies/sentinel dropped."""
  import jax
  from rigl_tpu.ops.pallas.block_sparse_conv import (_tapcol_pack,
                                                     pack_tap_active)
  occ = (jax.random.uniform(jax.random.key(0), (9, 4, 3)) < 0.3
         ).astype(jnp.int32)
  n = int(occ.sum())
  cols, rows, taps = pack_tap_active(occ, n)
  starts, ks = _tapcol_pack(cols, rows, taps, 9, 3)
  starts, ks = np.asarray(starts), np.asarray(ks)
  assert starts.shape == (9 * 3 + 1,) and starts[-1] == n
  assert (np.diff(starts) >= 0).all()
  occ_np = np.asarray(occ)
  for t in range(9):
    for j in range(3):
      cell = t * 3 + j
      got = sorted(ks[starts[cell]:starts[cell + 1]].tolist())
      want = sorted(np.nonzero(occ_np[t, :, j])[0].tolist())
      assert got == want, (t, j, got, want)


# ------------------------------------------------------------------- v6 --
@pytest.mark.parametrize('sparsity', [0.0, 0.5, 0.9])
def test_v6_matmul_forward_and_grads(sparsity):
  """v6 (auto-pipelined entry grid) matches dense-times-mask exactly,
  including an empty output column served by its dummy entry."""
  from rigl_tpu.ops.block_mask import expand_from_blocks, random_block_mask
  from rigl_tpu.ops.pallas.block_sparse_v6 import (block_sparse_matmul_v6,
                                                   make_packing)
  M, K, N, blk = 256, 512, 768, (128, 128)
  rs = np.random.RandomState(0)
  x = jnp.asarray(rs.randn(M, K), jnp.float32)
  w = jnp.asarray(rs.randn(K, N) * 0.1, jnp.float32)
  bmask = random_block_mask(jax.random.key(1), (K, N), sparsity, blk)
  occ = (bm_lib.pool_to_blocks(bmask, blk, 'max') > 0).astype(jnp.int32)
  occ = occ.at[:, 2].set(0)                     # force an empty column
  n_active = int(np.asarray(occ).sum())
  mask = expand_from_blocks(occ, (K, N), blk)
  wm = w * mask
  packing = make_packing(occ, n_active)

  y = block_sparse_matmul_v6(x, wm, packing, blk, 128)
  np.testing.assert_allclose(np.asarray(y), np.asarray(x @ wm), atol=2e-4)

  def loss(x, w):
    return jnp.sum(jnp.sin(block_sparse_matmul_v6(x, w, packing, blk, 128)))

  gx, gw = jax.grad(loss, (0, 1))(x, wm)
  gxr, gwr = jax.grad(
      lambda x, w: jnp.sum(jnp.sin(x @ (w * mask))), (0, 1))(x, wm)
  np.testing.assert_allclose(np.asarray(gx), np.asarray(gxr), atol=2e-4)
  np.testing.assert_allclose(np.asarray(gw), np.asarray(gwr), atol=2e-4)


def test_v6_packing_static_shape_across_mask_updates():
  """Entry count n_active + nn is invariant to WHICH blocks are active —
  the jit cache survives drop/grow mask evolution."""
  from rigl_tpu.ops.pallas.block_sparse_v6 import pack_columns
  occ1 = jnp.asarray([[1, 0, 0], [0, 0, 1]], jnp.int32)
  occ2 = jnp.asarray([[0, 1, 0], [1, 0, 0]], jnp.int32)  # same count
  p1, p2 = pack_columns(occ1, 2), pack_columns(occ2, 2)
  assert p1[0].shape == p2[0].shape == (5,)
  assert int(p1[2].sum()) == int(p2[2].sum()) == 2


# --------------------------------------------------------------- packed --
class TestPackedBlockSparse:
  """Packed block-sparse tensors (ops/pallas/block_sparse_packed.py):
  weights/grads/optimizer state in O(density) memory — beyond the
  reference's dense-latent storage (sparse_optimizers_base.py keeps full
  dense variables and multiplies masks)."""

  def _setup(self, sparsity=0.6, M=256, K=512, N=768, blk=(128, 128)):
    from rigl_tpu.ops.block_mask import (expand_from_blocks,
                                         random_block_mask)
    from rigl_tpu.ops.pallas import block_sparse_packed as bsp
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(M, K), jnp.float32)
    w = jnp.asarray(rs.randn(K, N) * 0.1, jnp.float32)
    bmask = random_block_mask(jax.random.key(1), (K, N), sparsity, blk)
    occ = (bm_lib.pool_to_blocks(bmask, blk, 'max') > 0).astype(jnp.int32)
    occ = occ.at[:, 2].set(0)                  # empty output column
    mask = expand_from_blocks(occ, (K, N), blk)
    packing = bsp.make_packing(occ, int(np.asarray(occ).sum()))
    return bsp, x, w * mask, mask, occ, packing, blk

  def test_pack_unpack_roundtrip(self):
    bsp, x, wm, mask, occ, packing, blk = self._setup()
    wp = bsp.pack_dense(wm, packing, blk)
    assert wp.shape == (int(np.asarray(occ).sum()), *blk)
    np.testing.assert_array_equal(
        np.asarray(bsp.unpack_dense(wp, packing, blk)), np.asarray(wm))

  def test_matmul_fwd_and_grads(self):
    bsp, x, wm, mask, occ, packing, blk = self._setup()
    wp = bsp.pack_dense(wm, packing, blk)
    y = bsp.packed_matmul(x, wp, packing, blk, 128)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x @ wm), atol=2e-4)

    def loss(x, wp):
      return jnp.sum(jnp.sin(bsp.packed_matmul(x, wp, packing, blk, 128)))

    gx, gwp = jax.grad(loss, (0, 1))(x, wp)
    gxr, gwr = jax.grad(
        lambda x, w: jnp.sum(jnp.sin(x @ (w * mask))), (0, 1))(x, wm)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gxr), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(bsp.unpack_dense(gwp, packing, blk)), np.asarray(gwr),
        atol=2e-4)

  def test_repack_after_mask_update(self):
    """Drop one block, grow another: surviving blocks keep their values
    through the permutation; grown slots are flagged -1."""
    from rigl_tpu.ops.block_mask import expand_from_blocks
    bsp, x, wm, mask, occ, packing, blk = self._setup()
    wp = bsp.pack_dense(wm, packing, blk)
    first_active = tuple(np.argwhere(np.asarray(occ))[0])
    occ2 = occ.at[0, 2].set(1).at[first_active].set(0)
    assert int(occ2.sum()) == int(occ.sum())
    p2 = bsp.make_packing(occ2, int(np.asarray(occ2).sum()))
    perm = bsp.repack_permutation(packing, p2)
    assert int((np.asarray(perm) < 0).sum()) == 1   # exactly the grown block
    wp2 = jnp.where((perm >= 0)[:, None, None],
                    wp[jnp.maximum(perm, 0)], 0.0)
    ref = wm * expand_from_blocks(occ2, wm.shape, blk)
    np.testing.assert_array_equal(
        np.asarray(bsp.unpack_dense(wp2, p2, blk)), np.asarray(ref))

  def test_packed_sgd_momentum_step_matches_masked_dense(self):
    """One SGD+momentum step on packed storage == the masked-dense update
    restricted to active weights (premask invariant by construction)."""
    import optax
    bsp, x, wm, mask, occ, packing, blk = self._setup()
    tx = optax.sgd(0.1, momentum=0.9)
    wp = bsp.pack_dense(wm, packing, blk)
    opt_p = tx.init(wp)

    def loss_p(wp):
      return jnp.mean(bsp.packed_matmul(x, wp, packing, blk, 128) ** 2)

    g = jax.grad(loss_p)(wp)
    up, opt_p = tx.update(g, opt_p, wp)
    wp1 = optax.apply_updates(wp, up)

    opt_d = tx.init(wm)
    gd = jax.grad(lambda w: jnp.mean((x @ (w * mask)) ** 2))(wm)
    ud, opt_d = tx.update(gd * mask, opt_d, wm)
    wd1 = (wm + ud[0] if isinstance(ud, tuple) else wm + ud) * mask
    np.testing.assert_allclose(
        np.asarray(bsp.unpack_dense(wp1, packing, blk)), np.asarray(wd1),
        atol=1e-5)
