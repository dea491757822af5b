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


def test_packed_rigl_loop_matches_dense_premask_path():
  """Full multi-update RigL training loop on packed storage vs the dense
  premask block-mask path, with SYNTHETIC per-step grads (identical for
  both arms, so the comparison isolates loop semantics — kernel float
  parity is covered elsewhere).  Asserts identical mask evolution AND
  identical weights/momentum at every step."""
  tx = optax.sgd(0.1, momentum=0.9)
  layers = ['a', 'b']
  rs = np.random.RandomState(1)

  dense_w, dense_mask = {}, {}
  packed_p, packings, n_active = {}, {}, {}
  for i, name in enumerate(layers):
    w = jnp.asarray(rs.randn(K, N) * 0.1, jnp.float32)
    occ = jnp.asarray(rs.permutation(
        np.repeat([1, 0], [8, 8]).astype(np.int32)).reshape(4, 4))
    mask = bm_lib.expand_from_blocks(occ, (K, N), BLK)
    dense_w[name] = w * mask
    dense_mask[name] = mask
    n_active[name] = int(np.asarray(occ).sum())
    packings[name] = bsp.make_packing(occ, n_active[name])
    packed_p[name] = bsp.pack_dense(w * mask, packings[name], BLK)

  opt_d = tx.init(dense_w)
  opt_p = tx.init(packed_p)
  update_steps = {3, 7}
  df = 0.3

  def synth_grads(step):
    r = np.random.RandomState(100 + step)
    return {name: jnp.asarray(r.randn(K, N), jnp.float32)
            for name in layers}

  for step in range(10):
    g = synth_grads(step)
    if step in update_steps:
      # Dense premask path: blockwise drop/grow, premask re-applied,
      # momentum masked (drop zeroes dropped slots; grown were zero).
      new_mask = {}
      for name in layers:
        res = bm_lib.blockwise_drop_grow(
            dense_mask[name], dense_w[name], jnp.abs(dense_w[name]),
            jnp.abs(g[name]), df, BLK)
        new_mask[name] = res.mask
        dense_w[name] = res.weights * res.mask
      dense_mask = new_mask
      opt_d = optax.tree_map_params(
          tx, lambda mom, m: mom * m, opt_d, dense_mask)

      # Packed path: pooled grow grids from the same dense grads.
      grids = pt.rigl_grow_grids(g, BLK)
      out = pt.packed_rigl_update(packed_p, packings, opt_p, tx, grids,
                                  df, n_active)
      packed_p, packings, opt_p = out.params, out.packings, out.opt_state
      for name in layers:
        occ_ref = (bm_lib.pool_to_blocks(dense_mask[name], BLK, 'max')
                   > 0).astype(jnp.int32)
        np.testing.assert_array_equal(np.asarray(out.occupancy[name]),
                                      np.asarray(occ_ref))
    else:
      gm = {name: g[name] * dense_mask[name] for name in layers}
      up, opt_d = tx.update(gm, opt_d, dense_w)
      dense_w = optax.apply_updates(dense_w, up)

      gp = {name: bsp.pack_dense(g[name], packings[name], BLK)
            for name in layers}
      up_p, opt_p = tx.update(gp, opt_p, packed_p)
      packed_p = optax.apply_updates(packed_p, up_p)

    for name in layers:
      np.testing.assert_allclose(
          np.asarray(bsp.unpack_dense(packed_p[name], packings[name], BLK)),
          np.asarray(dense_w[name]), atol=1e-6,
          err_msg=f'step {step} layer {name}')


def test_packed_rigl_update_jits():
  wm, mask, occ, n_active, packing, packed, grads = _setup()
  tx = optax.sgd(0.1, momentum=0.9)
  params = {'l': packed}
  packs = {'l': packing}
  opt = tx.init(params)
  grids = pt.rigl_grow_grids({'l': grads}, BLK)

  @jax.jit
  def upd(params, packs, opt, grids):
    return pt.packed_rigl_update(params, packs, opt, tx, grids, 0.3,
                                 {'l': n_active})

  out = upd(params, packs, opt, grids)
  assert out.params['l'].shape == packed.shape
  assert int(out.occupancy['l'].sum()) == n_active


def test_packed_matmul_data_parallel_shard_map():
  """Packed block-sparse training step under data parallelism: batch
  sharded over the 8-device mesh via shard_map (pallas calls need manual
  partitioning — GSPMD cannot split a custom call), packed weights
  replicated, packed grads psum'd.  Matches the single-device dense-view
  computation."""
  from jax.sharding import Mesh, PartitionSpec as P
  from jax import shard_map

  devs = np.array(jax.devices()[:8])
  assert devs.size == 8, 'conftest forces 8 virtual devices'
  mesh = Mesh(devs, ('data',))

  Kd = Nd = 256
  blk = (64, 64)
  rs = np.random.RandomState(3)
  occ = jnp.asarray(rs.permutation(
      np.repeat([1, 0], [8, 8]).astype(np.int32)).reshape(4, 4))
  n_active = 8
  packing = bsp.make_packing(occ, n_active)
  wd = jnp.asarray(rs.randn(Kd, Nd) * 0.1, jnp.float32)
  wm = wd * bm_lib.expand_from_blocks(occ, (Kd, Nd), blk)
  packed = bsp.pack_dense(wm, packing, blk)
  x = jnp.asarray(rs.randn(64, Kd), jnp.float32)

  def local_loss_and_grad(xl, w):
    def loss(w):
      y = bsp.packed_matmul(xl, w, packing, blk, 8, True)
      # Sum (not mean) locally; global mean = psum(sum) / global count.
      return jnp.sum(y.astype(jnp.float32) ** 2)

    l, g = jax.value_and_grad(loss)(w)
    return (jax.lax.psum(l, 'data') / (64 * Nd),
            jax.lax.psum(g, 'data') / (64 * Nd))

  fn = jax.jit(shard_map(local_loss_and_grad, mesh=mesh,
                         in_specs=(P('data'), P()), out_specs=(P(), P()),
                         check_vma=False))
  loss, grad = fn(x, packed)

  ref_l, ref_g = jax.value_and_grad(
      lambda w: jnp.sum((x @ bsp.unpack_dense(w, packing, blk)) ** 2)
      / (64 * Nd))(packed)
  np.testing.assert_allclose(float(loss), float(ref_l), rtol=1e-5)
  np.testing.assert_allclose(np.asarray(grad), np.asarray(ref_g),
                             rtol=1e-4, atol=1e-5)


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


def test_packed_conv1x1_matches_dense_conv():
  """PackedConv1x1 == dense 1x1 conv with the unpacked kernel, incl.
  stride-2 subsampling."""
  from rigl_tpu.layers import PackedConv1x1
  rs = np.random.RandomState(0)
  x = jnp.asarray(rs.randn(2, 8, 8, 256), jnp.float32)
  for strides in [(1, 1), (2, 2)]:
    model = PackedConv1x1(features=256, sparsity=0.75, block=(128, 128),
                          bm=32, strides=strides)
    variables = model.init(jax.random.key(0), x)
    assert variables['params']['kernel'].shape == (1, 128, 128)
    y = model.apply(variables, x)
    wd = bsp.unpack_dense(variables['params']['kernel'],
                          variables['packing']['kernel'], (128, 128))
    ref = jax.lax.conv_general_dilated(
        x, wd.reshape(1, 1, 256, 256), strides, 'SAME',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    assert y.shape == ref.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=2e-4)


def test_packed_rigl_update_with_adam():
  """packed_rigl_update permutes/resets BOTH Adam moments through
  tree_map_params."""
  wm, mask, occ, n_active, packing, packed, grads = _setup()
  tx = optax.adam(1e-3)
  params = {'l': packed}
  opt = tx.init(params)
  # One real update so mu/nu are nonzero.
  g = {'l': bsp.pack_dense(grads, packing, BLK)}
  up, opt = tx.update(g, opt, params)
  params = optax.apply_updates(params, up)

  mu_before = np.asarray(opt[0].mu['l'])
  nu_before = np.asarray(opt[0].nu['l'])

  grids = pt.rigl_grow_grids({'l': grads}, BLK)
  out = pt.packed_rigl_update(params, {'l': packing}, opt, tx, grids, 0.3,
                              {'l': n_active})
  mu = np.asarray(out.opt_state[0].mu['l'])
  nu = np.asarray(out.opt_state[0].nu['l'])
  perm = np.asarray(pt.repack_permutation(packing, out.packings['l']))
  grown = perm < 0
  assert grown.sum() > 0
  # Grown slots: both moments zeroed.
  assert np.all(mu[grown] == 0) and np.all(nu[grown] == 0)
  # Survivors: both moments carried from their source slot.
  np.testing.assert_array_equal(mu[~grown], mu_before[perm[~grown]])
  np.testing.assert_array_equal(nu[~grown], nu_before[perm[~grown]])


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


def test_flax_set_grow_grids_shapes_and_determinism():
  """SET grow grids: one uniform grid per packed kernel at the grid shape,
  deterministic in the caller's key (the step fold happens upstream)."""
  _, _, occ, n_active, packing, packed, _ = _setup()
  packings = {'blk': {'attn': {'kernel': packing}},
              'head': {'kernel': packing}}
  shapes = pt.grow_grid_shapes(packings)
  assert shapes[('blk', 'attn', 'kernel')] == tuple(packing.shape)
  key = jax.random.key(7)
  g1 = pt.flax_set_grow_grids(packings, key)
  g2 = pt.flax_set_grow_grids(packings, key)
  for p in shapes:
    assert g1[p].shape == shapes[p]
    np.testing.assert_array_equal(np.asarray(g1[p]), np.asarray(g2[p]))
  # Distinct layers draw distinct scores from the same key.
  assert not np.array_equal(np.asarray(g1[('blk', 'attn', 'kernel')]),
                            np.asarray(g1[('head', 'kernel')]))
  g3 = pt.flax_set_grow_grids(packings, jax.random.key(8))
  assert not np.array_equal(np.asarray(g1[('head', 'kernel')]),
                            np.asarray(g3[('head', 'kernel')]))


def test_packed_set_drop_grow_matches_dense_premask_path():
  """flax_packed_drop_grow with SET's random grids == the dense premask
  blockwise path fed the SAME scores (grid expanded so the dense arm's
  block-sum pool reproduces it exactly)."""
  import optax
  wm, mask, occ, n_active, packing, packed, _ = _setup()
  params = {'l': {'kernel': packed}}
  packings = {'l': {'kernel': packing}}
  tx = optax.sgd(0.1, momentum=0.9)
  opt = tx.init(params)
  grids = pt.flax_set_grow_grids(packings, jax.random.key(0))
  df = 0.3

  out = pt.flax_packed_drop_grow(params, packings, opt, tx, grids, df)

  dense_grow = bm_lib.expand_from_blocks(
      grids[('l', 'kernel')] / (BLK[0] * BLK[1]), (K, N), BLK)
  res = bm_lib.blockwise_drop_grow(mask, wm, jnp.abs(wm), dense_grow, df,
                                   BLK)
  ref_occ = (bm_lib.pool_to_blocks(res.mask, BLK, 'max') > 0).astype(
      jnp.int32)
  np.testing.assert_array_equal(
      np.asarray(out.occupancy[('l', 'kernel')]), np.asarray(ref_occ))
  np.testing.assert_array_equal(
      np.asarray(bsp.unpack_dense(out.params['l']['kernel'],
                                  out.packings['l']['kernel'], BLK)),
      np.asarray(res.weights * res.mask))


def test_snfs_ema_grids_math():
  """init zeros; ema <- m*ema + (1-m)*inst, closed form over two steps."""
  _, _, occ, n_active, packing, packed, _ = _setup()
  packings = {'l': {'kernel': packing}}
  ema = pt.init_snfs_ema_grids(packings)
  path = ('l', 'kernel')
  assert ema[path].shape == tuple(packing.shape)
  assert float(np.abs(np.asarray(ema[path])).sum()) == 0.0
  i1 = {path: jnp.full(packing.shape, 2.0, jnp.float32)}
  i2 = {path: jnp.full(packing.shape, 6.0, jnp.float32)}
  m = 0.5
  ema = pt.snfs_update_ema_grids(ema, i1, m)
  ema = pt.snfs_update_ema_grids(ema, i2, m)
  np.testing.assert_allclose(np.asarray(ema[path]),
                             np.full(packing.shape, 0.5 * 1.0 + 3.0),
                             rtol=1e-6)


@pytest.mark.parametrize('n_act,branch', [(12, 'panel'), (4, 'perblock')])
def test_packed_dw_matches_dense_oracle_both_branches(n_act, branch):
  """dw parity through both _dw_call paths: the column-panel variant
  (selected when columns average >1 active block, n_act > nn) and the
  per-block tile path.  Oracle: dense matmul grads packed post-hoc."""
  rs = np.random.RandomState(3)
  nk, nn, blk, m = 4, 8, (16, 16), 64
  occ = np.zeros(nk * nn, np.int32)
  occ[rs.choice(nk * nn, n_act, replace=False)] = 1
  occ = jnp.asarray(occ.reshape(nk, nn))
  assert (n_act > nn) == (branch == 'panel')
  packing = bsp.make_packing(occ, n_act)
  kdim, ndim = nk * blk[0], nn * blk[1]
  mask = bm_lib.expand_from_blocks(occ, (kdim, ndim), blk)
  w = jnp.asarray(rs.randn(kdim, ndim), jnp.float32) * mask
  packed = bsp.pack_dense(w, packing, blk)
  x = jnp.asarray(rs.randn(m, kdim), jnp.float32)

  def f(x, wp):
    return jnp.sum(jnp.sin(bsp.packed_matmul(x, wp, packing, blk, 16)))

  gx, gw = jax.grad(f, argnums=(0, 1))(x, packed)

  def f_dense(x, w):
    return jnp.sum(jnp.sin(x @ w))

  gx_d, gw_d = jax.grad(f_dense, argnums=(0, 1))(x, w)
  np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_d), atol=1e-4)
  np.testing.assert_allclose(np.asarray(gw),
                             np.asarray(bsp.pack_dense(gw_d, packing, blk)),
                             atol=1e-4)

@pytest.mark.parametrize('variant', ['panel', 'slice'])
@pytest.mark.parametrize('rowmode', ['dummy', 'act'])
def test_packed_mm_variants_match_dense_oracle(variant, rowmode,
                                               monkeypatch):
  """fwd/dx/dw parity through both _mm_call x-feed variants (panel: full
  row panel + in-kernel dynamic slice; slice: (bm, bk) x tile indexed by
  the prefetched row list) x both row modes (dummy: one dummy entry per
  block-column does the output write; act: actives-only grid + column-
  presence where-mask).  Mask includes an EMPTY LEADING COLUMN so the
  dummy-entry row forward-fill AND the actives-only unvisited-tile mask
  hit their edge cases.  Oracle: dense matmul on the expanded mask."""
  monkeypatch.setenv('RIGL_PACKED_MM_VARIANT', variant)
  monkeypatch.setenv('RIGL_PACKED_MM_ROWMODE', rowmode)
  rs = np.random.RandomState(7)
  nk, nn, blk, m = 4, 4, (16, 16), 64
  occ = np.zeros((nk, nn), np.int32)
  occ[[0, 2, 3, 1, 2], [1, 1, 2, 3, 3]] = 1   # column 0 empty
  occ = jnp.asarray(occ)
  n_act = 5
  packing = bsp.make_packing(occ, n_act)
  kdim, ndim = nk * blk[0], nn * blk[1]
  mask = bm_lib.expand_from_blocks(occ, (kdim, ndim), blk)
  w = jnp.asarray(rs.randn(kdim, ndim), jnp.float32) * mask
  packed = bsp.pack_dense(w, packing, blk)
  x = jnp.asarray(rs.randn(m, kdim), jnp.float32)

  def f(x, wp):
    return jnp.sum(jnp.sin(bsp.packed_matmul(x, wp, packing, blk, 16)))

  y = bsp.packed_matmul(x, packed, packing, blk, 16)
  gx, gw = jax.grad(f, argnums=(0, 1))(x, packed)
  np.testing.assert_allclose(np.asarray(y), np.asarray(x @ w), atol=1e-4)

  def f_dense(x, w):
    return jnp.sum(jnp.sin(x @ w))

  gx_d, gw_d = jax.grad(f_dense, argnums=(0, 1))(x, w)
  np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_d), atol=1e-4)
  np.testing.assert_allclose(np.asarray(gw),
                             np.asarray(bsp.pack_dense(gw_d, packing, blk)),
                             atol=1e-4)
