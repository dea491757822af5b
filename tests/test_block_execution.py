"""End-to-end block-sparse *execution*: the block-skipping kernel wired
through ConvFixedPad / ResNet / make_train_step.

Contract: enabling block execution changes HOW eligible 1x1 convs compute
(skip inactive weight blocks) but not WHAT they compute — params, masks, and
training trajectories must match the dense-times-mask execution.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rigl_tpu.models import common
from rigl_tpu.ops import block_mask as bm_lib
from rigl_tpu.sparsity import masks as masks_lib
from rigl_tpu.sparsity.schedules import UpdateSchedule
from rigl_tpu.train import steps
from rigl_tpu.transforms import algorithms
from rigl_tpu.transforms.sparse_training import SparseTraining

BLOCK = (8, 8)
BM = 8


def _conv_pair(kernel_size, stride, cin=8, cout=16):
  dense = common.ConvFixedPad(cout, kernel_size, stride)
  blocked = common.ConvFixedPad(cout, kernel_size, stride, block=BLOCK,
                                block_bm=BM)
  x = jax.random.normal(jax.random.key(1), (2, 8, 8, cin))
  params = dense.init(jax.random.key(0), x)
  params_b = blocked.init(jax.random.key(0), x)
  # Identical param trees regardless of execution mode.
  jax.tree.map(np.testing.assert_array_equal, params, params_b)
  return dense, blocked, params, x


@pytest.mark.parametrize('stride', [1, 2])
def test_conv1x1_block_execution_matches_dense(stride):
  dense, blocked, params, x = _conv_pair(1, stride)
  kshape = params['params']['conv']['kernel'].shape
  mask = bm_lib.random_block_mask(jax.random.key(2), kshape, 0.5, BLOCK)
  eff = jax.tree.map(lambda p: p, params)
  eff['params']['conv']['kernel'] = (
      eff['params']['conv']['kernel'] * mask)
  want = dense.apply(eff, x)
  col = bm_lib.block_mask_collection({'conv/kernel': mask}, BLOCK)
  got = blocked.apply({**eff, 'block_masks': col}, x)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('stride', [1, 2])
def test_conv3x3_block_execution_matches_dense(stride):
  """Spatial convs execute via the direct tap kernel (stride 1 runs SAME
  directly; strided layers run stride-1 on the fixed-padded input and take
  every s-th window center); semantics identical to the dense conv."""
  dense, blocked, params, x = _conv_pair(3, stride)
  kshape = params['params']['conv']['kernel'].shape  # (3, 3, 8, 16)
  mask = bm_lib.random_block_mask(jax.random.key(5), kshape, 0.5, BLOCK)
  assert bm_lib.is_tap_layer(kshape, BLOCK)
  eff = jax.tree.map(lambda p: p, params)
  eff['params']['conv']['kernel'] = eff['params']['conv']['kernel'] * mask
  want = dense.apply(eff, x)
  col = bm_lib.block_mask_collection({'conv/kernel': mask}, BLOCK,
                                     conv3x3=True)
  assert col, '3x3 layer must be block-executable with conv3x3=True'
  entry = col['conv']['kernel']
  assert isinstance(entry, dict) and 'taps' in entry
  got = blocked.apply({**eff, 'block_masks': col}, x)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('stride', [1, 2])
def test_conv3x3_tap_backward_matches_dense_at_active_blocks(stride):
  dense, blocked, params, x = _conv_pair(3, stride)
  kshape = params['params']['conv']['kernel'].shape
  mask = bm_lib.random_block_mask(jax.random.key(7), kshape, 0.5, BLOCK)
  col = bm_lib.block_mask_collection({'conv/kernel': mask}, BLOCK,
                                     conv3x3=True)

  def loss_b(p, xin):
    return jnp.sum(blocked.apply({**p, 'block_masks': col}, xin) ** 2)

  def loss_d(p, xin):
    eff = jax.tree.map(lambda q: q, p)
    eff['params']['conv']['kernel'] = eff['params']['conv']['kernel'] * mask
    return jnp.sum(dense.apply(eff, xin) ** 2)

  gb = jax.grad(loss_b, argnums=(0, 1))(params, x)
  gd = jax.grad(loss_d, argnums=(0, 1))(params, x)
  np.testing.assert_allclose(np.asarray(gb[1]), np.asarray(gd[1]),
                             rtol=1e-4, atol=1e-5)
  dwb = np.asarray(gb[0]['params']['conv']['kernel'])
  dwd = np.asarray(gd[0]['params']['conv']['kernel']) * np.asarray(mask)
  np.testing.assert_allclose(dwb * np.asarray(mask), dwd, rtol=1e-4,
                             atol=1e-5)


def test_conv3x3_falls_back_to_dense_conv():
  dense, blocked, params, x = _conv_pair(3, 1)
  want = dense.apply(params, x)
  got = blocked.apply(params, x)  # no block_masks entry -> XLA conv
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=1e-5, atol=1e-5)


def test_block_conv_backward_matches_dense_at_active_blocks():
  dense, blocked, params, x = _conv_pair(1, 1)
  kshape = params['params']['conv']['kernel'].shape
  mask = bm_lib.random_block_mask(jax.random.key(3), kshape, 0.5, BLOCK)
  col = bm_lib.block_mask_collection({'conv/kernel': mask}, BLOCK)

  def loss_b(p, xin):
    return jnp.sum(blocked.apply({**p, 'block_masks': col}, xin) ** 2)

  def loss_d(p, xin):
    eff = jax.tree.map(lambda q: q, p)
    eff['params']['conv']['kernel'] = eff['params']['conv']['kernel'] * mask
    return jnp.sum(dense.apply(eff, xin) ** 2)

  gb = jax.grad(loss_b, argnums=(0, 1))(params, x)
  gd = jax.grad(loss_d, argnums=(0, 1))(params, x)
  # dx matches everywhere.
  np.testing.assert_allclose(np.asarray(gb[1]), np.asarray(gd[1]),
                             rtol=1e-4, atol=1e-5)
  # dw matches at active blocks (the dense path also has grads at inactive
  # blocks; the kernel backward skips them by design).
  dwb = np.asarray(gb[0]['params']['conv']['kernel'])
  dwd = np.asarray(gd[0]['params']['conv']['kernel']) * np.asarray(mask)
  np.testing.assert_allclose(dwb * np.asarray(mask), dwd, rtol=1e-4,
                             atol=1e-5)


class _TinyNet(nn.Module):
  """Conv stack with 1x1 and 3x3 layers, all block-eligible under (8, 8)."""
  block: tuple = None

  @nn.compact
  def __call__(self, x, train: bool = False):
    x = common.ConvFixedPad(16, 1, 1, block=self.block, block_bm=BM,
                            name='c1')(x)
    x = nn.relu(x)
    x = common.ConvFixedPad(16, 3, 1, block=self.block, block_bm=BM,
                            name='c3x3')(x)
    x = nn.relu(x)
    x = common.ConvFixedPad(32, 1, 2, block=self.block, block_bm=BM,
                            name='c2')(x)
    x = nn.relu(x)
    x = jnp.mean(x, axis=(1, 2))
    return nn.Dense(10, name='head')(x)


def _make(block_exec, algo):
  model = _TinyNet(block=BLOCK if block_exec else None)
  st = SparseTraining(
      optax.sgd(0.05, momentum=0.9), algo, distribution='uniform',
      default_sparsity=0.5, block=BLOCK, seed=3)
  state = steps.init_train_state(jax.random.key(0), model, st, (4, 8, 8, 8),
                                 has_batch_stats=False)
  fn = steps.make_train_step(model, st, has_batch_stats=False,
                             block=BLOCK if block_exec else None,
                             block_conv3x3=block_exec)
  return jax.jit(fn), state


@pytest.mark.parametrize('algo_name', ['rigl', 'set', 'static'])
def test_train_trajectory_block_vs_dense(algo_name):
  """Multiple steps spanning a mask update: identical trajectories."""
  sched = UpdateSchedule(begin_step=0, end_step=100, frequency=2,
                         drop_fraction=0.5)
  algo = algorithms.get_algorithm(algo_name, schedule=sched)
  fn_b, state_b = _make(True, algo)
  algo = algorithms.get_algorithm(algo_name, schedule=sched)
  fn_d, state_d = _make(False, algo)
  jax.tree.map(np.testing.assert_array_equal, state_b.params, state_d.params)

  rng = np.random.default_rng(0)
  updated = 0
  for i in range(6):
    batch = {
        'image': jnp.asarray(rng.normal(size=(4, 8, 8, 8)), jnp.float32),
        'label': jnp.asarray(rng.integers(0, 10, (4,)), jnp.int32),
    }
    state_b, mb = fn_b(state_b, batch)
    state_d, md = fn_d(state_d, batch)
    updated += int(mb['mask_updated'])
    assert bool(mb['mask_updated']) == bool(md['mask_updated'])
    np.testing.assert_allclose(float(mb['loss']), float(md['loss']),
                               rtol=1e-4, atol=1e-5)
  assert updated >= 2, 'test must cover mask-update iterations'
  for p, m in state_b.sparse.masks.items():
    np.testing.assert_array_equal(np.asarray(m),
                                  np.asarray(state_d.sparse.masks[p]), p)
  jax.tree.map(
      lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                              rtol=1e-4, atol=1e-5),
      state_b.params, state_d.params)


def test_block_execution_rejects_per_step_dense_grad_algos():
  sched = UpdateSchedule(begin_step=0, end_step=100, frequency=2,
                         drop_fraction=0.5)
  algo = algorithms.get_algorithm('momentum', schedule=sched)
  model = _TinyNet(block=BLOCK)
  st = SparseTraining(optax.sgd(0.05), algo, distribution='uniform',
                      default_sparsity=0.5, block=BLOCK)
  with pytest.raises(ValueError, match='block-sparse execution'):
    steps.make_train_step(model, st, has_batch_stats=False, block=BLOCK)


def test_block_mask_collection_matches_resnet_paths():
  """Collection entries nest at the exact param paths ResNet's 1x1 convs
  read, and only 1x1-divisible layers are included."""
  from rigl_tpu.models import registry
  model = registry.create_model('resnet', depth=50, num_classes=10,
                                width=0.25, block=(16, 16))
  variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                         train=False)
  st = SparseTraining(optax.sgd(0.1), algorithms.SET(
      schedule=UpdateSchedule(begin_step=0, end_step=10, frequency=5,
                              drop_fraction=0.3)),
      default_sparsity=0.8, block=(16, 16))
  _, sstate = st.init(jax.random.key(1), {'params': variables['params']})
  col = bm_lib.block_mask_collection(sstate.masks, (16, 16))
  flat = {masks_lib.path_str(p): v
          for p, v in jax.tree_util.tree_flatten_with_path(col)[0]}
  assert flat, 'no block-executable layers found'
  params_flat = masks_lib.mask_shapes({'params': variables['params']})
  for path, bm2 in flat.items():
    assert path in params_flat, path
    shape = params_flat[path]
    assert len(shape) == 4 and shape[:2] == (1, 1), (path, shape)
    assert bm2.shape == (shape[2] // 16, shape[3] // 16)
    # Occupancy agrees with the element mask.
    want = np.asarray(bm_lib.pool_to_blocks(sstate.masks[path], (16, 16),
                                            'max') > 0).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(bm2), want)
  # 3x3 convs and the (C, 10) head are excluded.
  assert not any('conv2' in p for p in flat)
  assert 'final_dense/kernel' not in flat


def test_block_routing_controls_pack_forms():
  """A measured routing table overrides the pack-form heuristics:
  'dense' layers get no pack, 'matmul' 1x1s get the flat v4 pack,
  unlisted layers keep the tap default."""
  sched = UpdateSchedule(begin_step=0, end_step=100, frequency=2,
                         drop_fraction=0.5)
  routing = {'c3x3/conv/kernel': 'dense', 'c1/conv/kernel': 'matmul'}
  model = _TinyNet(block=BLOCK)
  st = SparseTraining(
      optax.sgd(0.05), algorithms.get_algorithm('set', schedule=sched),
      distribution='uniform', default_sparsity=0.5, block=BLOCK, seed=3,
      block_routing=routing)
  state = steps.init_train_state(jax.random.key(0), model, st, (4, 8, 8, 8),
                                 has_batch_stats=False)
  packs = state.sparse.block_packs
  assert 'c3x3/conv/kernel' not in packs          # routed dense
  assert set(packs['c1/conv/kernel']) == {'cols', 'rows'}   # v4 matmul
  assert set(packs['c2/conv/kernel']) == {'cols', 'rows', 'taps'}  # default


def test_block_routing_trajectory_matches_dense():
  """Routing only changes execution, never semantics."""
  sched = UpdateSchedule(begin_step=0, end_step=100, frequency=2,
                         drop_fraction=0.5)

  def make(block_exec, routing=None):
    algo = algorithms.get_algorithm('rigl', schedule=sched)
    model = _TinyNet(block=BLOCK if block_exec else None)
    st = SparseTraining(
        optax.sgd(0.05, momentum=0.9), algo, distribution='uniform',
        default_sparsity=0.5, block=BLOCK, seed=3, block_routing=routing)
    state = steps.init_train_state(jax.random.key(0), model, st,
                                   (4, 8, 8, 8), has_batch_stats=False)
    fn = steps.make_train_step(model, st, has_batch_stats=False,
                               block=BLOCK if block_exec else None,
                               block_conv3x3=block_exec)
    return jax.jit(fn), state

  routing = {'c3x3/conv/kernel': 'dense', 'c1/conv/kernel': 'matmul'}
  fn_r, state_r = make(True, routing)
  fn_d, state_d = make(False)
  rng = np.random.default_rng(0)
  for _ in range(4):
    batch = {
        'image': jnp.asarray(rng.normal(size=(4, 8, 8, 8)), jnp.float32),
        'label': jnp.asarray(rng.integers(0, 10, (4,)), jnp.int32),
    }
    state_r, mr = fn_r(state_r, batch)
    state_d, md = fn_d(state_d, batch)
    np.testing.assert_allclose(float(mr['loss']), float(md['loss']),
                               rtol=1e-4, atol=1e-5)
  for p, m in state_r.sparse.masks.items():
    np.testing.assert_array_equal(np.asarray(m),
                                  np.asarray(state_d.sparse.masks[p]), p)
