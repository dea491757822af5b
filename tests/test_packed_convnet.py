"""PackedConvNet: packed block-sparse pointwise convs at depth — dense-twin
forward parity, and end-to-end training with RigL updates on packed storage
through PackedClassifierTrainer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


@pytest.mark.slow
def test_packed_resnet50_matches_dense_twin_and_layer_census():
  """Full PackedResNet-50 (reference generator resnet_model.py:577-731,
  depth table :771-796): packed forward == dense-twin forward on the
  unpacked params, and the layer census is exactly the expected one —
  16 bottlenecks x 3 packed convs at (16,16) blocks (stem/proj/head
  dense per the first/last convention, resnet_model.py:628,722)."""
  import flax.traverse_util as traverse
  from rigl_tpu.models.packed_convnet import (DenseResNetTwin, PackedResNet,
                                              RESNET_BOTTLENECK_DEPTHS)
  kw = dict(depth=50, num_classes=10, width_mult=0.25)
  model = PackedResNet(sparsity=0.5, block=(16, 16), bm=32, **kw)
  x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3), jnp.float32)
  variables = model.init(jax.random.key(0), x)
  flat_pk = traverse.flatten_dict(variables['packing'])
  n_blocks = sum(RESNET_BOTTLENECK_DEPTHS[50])
  assert n_blocks == 16
  assert len(flat_pk) == 3 * n_blocks        # reduce + conv3x3 + expand
  assert not any('stem' in p or 'head' in p or 'proj' in p for p in flat_pk)

  y_packed = model.apply(variables, x)
  twin = DenseResNetTwin(block=(16, 16), **kw)
  tv = dense_twin_params(variables['params'], variables['packing'], (16, 16))
  y_twin = twin.apply({'params': tv}, x)
  assert y_packed.shape == (2, 10)
  np.testing.assert_allclose(np.asarray(y_packed), np.asarray(y_twin),
                             rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_packed_resnet_block_eligibility_fallback():
  """At a block larger than group-1's widths, the small convs fall back to
  plain dense (the packed analog of forced-dense ERK layers) while the
  wide groups stay packed — and the twin still matches."""
  import flax.traverse_util as traverse
  from rigl_tpu.models.packed_convnet import DenseResNetTwin, PackedResNet
  kw = dict(depth=50, num_classes=10, width_mult=0.25)
  # width_mult 0.25 -> widths 16/32/64/128; block (32,32) makes the
  # width-16 group-1 convs ineligible.
  model = PackedResNet(sparsity=0.5, block=(32, 32), bm=32, **kw)
  x = jnp.asarray(np.random.RandomState(1).randn(2, 32, 32, 3), jnp.float32)
  variables = model.init(jax.random.key(0), x)
  flat_pk = traverse.flatten_dict(variables['packing'])
  g1_packed = [p for p in flat_pk if p[0].startswith('g0_')]
  # g0 reduce (cin 64 or 256 -> 16): cout 16 % 32 != 0 -> dense fallback;
  # g0 expand cin=16 -> dense.  Later groups all packed.
  assert not g1_packed
  assert any(p[0].startswith('g3_') for p in flat_pk)

  y_packed = model.apply(variables, x)
  twin = DenseResNetTwin(block=(32, 32), **kw)
  tv = dense_twin_params(variables['params'], variables['packing'], (32, 32))
  y_twin = twin.apply({'params': tv}, x)
  np.testing.assert_allclose(np.asarray(y_packed), np.asarray(y_twin),
                             rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_packed_resnet50_trains_with_rigl_updates():
  """End-to-end: the full packed RN50 trains under PackedClassifierTrainer
  with drop/grow on packed storage (dense-twin grow grads), loss drops.
  ~10 min CPU (RN50-depth compile) — slow tier."""
  from rigl_tpu.models.packed_convnet import DenseResNetTwin, PackedResNet
  rs = np.random.RandomState(0)
  # Tiny learnable synthetic task: class = argmax of channel means.
  x = rs.randn(256, 16, 16, 3).astype(np.float32)
  y = np.argmax(x.mean(axis=(1, 2)), axis=-1).astype(np.int32)
  kw = dict(depth=50, num_classes=3, width_mult=0.25)
  # Compile dominates the cost; 150 steps (~19 epochs of the 256-sample
  # set) are cheap and let the deep pre-act stack actually fit the task.
  cfg = PackedClassifierConfig(
      sparsity=0.5, block=(16, 16), learning_rate=0.05, train_steps=150,
      batch_size=32, maskupdate_begin_step=0, maskupdate_end_step=100,
      maskupdate_frequency=30, seed=0)
  model = PackedResNet(sparsity=cfg.sparsity, block=cfg.block, bm=32, **kw)
  twin = DenseResNetTwin(block=cfg.block, **kw)
  tr = PackedClassifierTrainer(model, twin, cfg, input_shape=(16, 16, 3))
  losses = []
  res = tr.train((x, y), eval_xy=(x[:64], y[:64]),
                 progress_fn=lambda m: losses.append(m['loss']),
                 log_every=10)
  assert res['mask_updates'] >= 2
  assert res['batches'] == res['train_steps'] + res['mask_updates']
  assert res['n_params_packed'] < 0.6 * res['n_params_dense_equiv']
  assert np.isfinite(res['final_loss'])
  assert res['final_loss'] < losses[0], (losses, res)
  assert res['eval_top_1'] > 0.6, res


@pytest.mark.parametrize('algo', ['set', 'snfs'])
def test_packed_classifier_set_snfs_semantics(algo):
  """SET/SNFS through PackedClassifierTrainer: apply-then-update ordering
  (batches == steps), topology moves, counts preserved, SNFS EMA has
  mass after the first update."""
  import flax.traverse_util as traverse
  from rigl_tpu.transforms.packed_training import occupancy_grid
  rs = np.random.RandomState(0)
  x = rs.randn(200, 8, 8, 1).astype(np.float32)
  y = rs.randint(0, 10, 200).astype(np.int32)
  # Wider stages than KW: the 1x1/1x2 block grids there give n_active 1,
  # where floor(drop_fraction * 1) = 0 drops nothing and topology CANNOT
  # move (reference floor arithmetic); 2x2 and 2x4 grids can.
  kw = dict(num_classes=10, stem_width=32, stages=((32, 1), (64, 1)))
  cfg = PackedClassifierConfig(
      sparsity=0.5, block=(16, 16), learning_rate=0.05, train_steps=12,
      batch_size=50, maskupdate_begin_step=0, maskupdate_end_step=100,
      maskupdate_frequency=3, drop_fraction=0.5, seed=0, algo=algo)
  model = PackedConvNet(sparsity=cfg.sparsity, block=cfg.block, bm=32, **kw)
  twin = DenseConvNet(**kw)
  tr = PackedClassifierTrainer(model, twin, cfg, input_shape=(8, 8, 1))
  tr.init_state()
  occ0 = {p: np.asarray(occupancy_grid(pk))
          for p, pk in traverse.flatten_dict(tr.packings).items()}
  res = tr.train((x, y))
  assert res['mask_updates'] >= 2
  assert res['batches'] == res['train_steps'] == 12
  changed = 0
  for p, pk in traverse.flatten_dict(tr.packings).items():
    occ1 = np.asarray(occupancy_grid(pk))
    assert occ1.sum() == occ0[p].sum(), p
    changed += int((occ1 != occ0[p]).sum())
  assert changed > 0
  if algo == 'snfs':
    assert tr.ema_grids is not None
    assert any(float(np.abs(np.asarray(g)).sum()) > 0
               for g in tr.ema_grids.values())


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


# ----------------------------------------------------------- MBv1 --------
def test_mbv1_config_published_schedule():
  """Width schedule + _make_divisible rounding match the reference
  generator (mobilenetv1_model.py:223-343, :33-40)."""
  from rigl_tpu.models.packed_convnet import make_divisible, mbv1_config
  stem, stages = mbv1_config(1.0)
  assert stem == 32
  assert [f for f, _ in stages] == [64, 128, 128, 256, 256, 512, 512, 512,
                                    512, 512, 512, 1024, 1024]
  assert [s for _, s in stages] == [1, 2, 1, 2, 1, 2, 1, 1, 1, 1, 1, 2, 1]
  # width 0.25: published rounding (int(w*f) then divisible-by-8).
  stem25, stages25 = mbv1_config(0.25)
  assert stem25 == 8
  assert [f for f, _ in stages25][:5] == [16, 32, 32, 64, 64]
  assert make_divisible(90) == 88 and make_divisible(12) == 16


def test_packed_mbv1_matches_dense_twin_and_census():
  """Full PackedMobileNetV1 at width 0.25: packed forward == dense-twin
  forward on the unpacked params; census = 13 packed pointwise convs at
  (16,16)... minus the width-8 stem-input stage (ineligible -> dense
  fallback), dense depthwise/stem/head (the reference's sparsity
  structure, mobilenetv1_model.py:43,205-221)."""
  import flax.traverse_util as traverse
  from rigl_tpu.models.packed_convnet import (DenseMobileNetV1Twin,
                                              PackedMobileNetV1)
  kw = dict(width_mult=0.25, num_classes=10)
  model = PackedMobileNetV1(sparsity=0.5, block=(16, 16), bm=32, **kw)
  x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3), jnp.float32)
  variables = model.init(jax.random.key(0), x)
  flat_pk = traverse.flatten_dict(variables['packing'])
  flat_p = traverse.flatten_dict(variables['params'])
  # stage0's pointwise has cin=8 (stem 8 % 16 != 0) -> dense fallback;
  # stages 1-12 packed.
  assert len(flat_pk) == 12
  assert ('stage0', 'pw', 'kernel') not in flat_pk
  assert ('stage1', 'pw', 'kernel') in flat_pk
  # Depthwise convs exist and are DENSE (no packing entry).
  dw = [p for p in flat_p if p[-2] == 'dw']
  assert len(dw) == 13
  assert not any(p[:-1] + ('kernel',) in flat_pk for p in dw)

  y_packed = model.apply(variables, x)
  twin = DenseMobileNetV1Twin(block=(16, 16), **kw)
  tvars = dense_twin_params(variables['params'], variables['packing'],
                            (16, 16))
  y_twin = twin.apply({'params': tvars}, x)
  assert y_packed.shape == (2, 10)
  np.testing.assert_allclose(np.asarray(y_packed), np.asarray(y_twin),
                             rtol=1e-4, atol=1e-4)


def test_packed_mbv1_erk_map_and_layer_shapes():
  from rigl_tpu.models.packed_convnet import mbv1_layer_shapes
  from rigl_tpu.sparsity.layer_sparsity import (achieved_block_sparsity,
                                                make_sparsity_map)
  shapes = mbv1_layer_shapes(1.0, (16, 16))
  assert len(shapes) == 13                     # width 1: all eligible
  assert shapes['stage0/pw/kernel'] == (1, 1, 32, 64)
  assert shapes['stage12/pw/kernel'] == (1, 1, 1024, 1024)
  m = make_sparsity_map(shapes, 'erdos_renyi_kernel', 0.8)
  ach = achieved_block_sparsity(shapes, m, (16, 16))
  assert abs(ach - 0.8) < 0.005, ach
  # Ineligible stages drop out of the solve at width 0.25.
  assert 'stage0/pw/kernel' not in mbv1_layer_shapes(0.25, (16, 16))


@pytest.mark.slow
def test_packed_mbv1_trains_with_rigl_updates():
  from rigl_tpu.models.packed_convnet import (DenseMobileNetV1Twin,
                                              PackedMobileNetV1)
  from rigl_tpu.train.packed_classifier import (PackedClassifierConfig,
                                                PackedClassifierTrainer)
  import flax.traverse_util as traverse
  from rigl_tpu.transforms.packed_training import occupancy_grid
  kw = dict(width_mult=0.25, num_classes=10)
  cfg = PackedClassifierConfig(
      sparsity=0.5, block=(16, 16), learning_rate=0.05, train_steps=6,
      batch_size=16, maskupdate_begin_step=0, maskupdate_end_step=100,
      maskupdate_frequency=3, drop_fraction=0.5, seed=0)
  model = PackedMobileNetV1(sparsity=cfg.sparsity, block=cfg.block, bm=32,
                            **kw)
  twin = DenseMobileNetV1Twin(block=cfg.block, **kw)
  rs = np.random.RandomState(0)
  x = rs.randn(64, 16, 16, 3).astype(np.float32)
  y = rs.randint(0, 10, 64).astype(np.int32)
  tr = PackedClassifierTrainer(model, twin, cfg, input_shape=(16, 16, 3))
  tr.init_state()
  occ0 = {p: np.asarray(occupancy_grid(pk))
          for p, pk in traverse.flatten_dict(tr.packings).items()}
  res = tr.train((x, y))
  assert res['mask_updates'] >= 1
  assert np.isfinite(res['final_loss'])
  for p, pk in traverse.flatten_dict(tr.packings).items():
    assert np.asarray(occupancy_grid(pk)).sum() == occ0[p].sum(), p


def test_packed_classifier_checkpoint_resume_is_deterministic(tmp_path):
  """save/restore mid-run resumes bit-identically to an uninterrupted
  run — incl. per-layer ERK n_active (occupancy rebuild) and the SNFS
  EMA state (the PackedLMTrainer npz contract for the conv family)."""
  import flax.traverse_util as traverse
  from rigl_tpu.models.packed_convnet import convnet_layer_shapes
  from rigl_tpu.sparsity.layer_sparsity import make_sparsity_map
  from rigl_tpu.transforms.packed_training import occupancy_grid
  kw = dict(num_classes=10, stem_width=16, stages=((32, 1), (64, 1)))
  erk = make_sparsity_map(convnet_layer_shapes(16, kw['stages']),
                         'erdos_renyi_kernel', 0.6)
  rs = np.random.RandomState(0)
  x = rs.randn(128, 8, 8, 1).astype(np.float32)
  y = rs.randint(0, 10, 128).astype(np.int32)

  def make(train_steps):
    cfg = PackedClassifierConfig(
        sparsity=0.6, block=(16, 16), learning_rate=0.05,
        train_steps=train_steps, batch_size=32, maskupdate_begin_step=0,
        maskupdate_end_step=100, maskupdate_frequency=4,
        drop_fraction=0.4, seed=0, algo='snfs')
    model = PackedConvNet(sparsity=erk, block=cfg.block, bm=32, **kw)
    twin = DenseConvNet(**kw)
    return PackedClassifierTrainer(model, twin, cfg, input_shape=(8, 8, 1))

  tr_a = make(14)
  tr_a.train((x, y))
  tr_b = make(7)
  tr_b.train((x, y))
  tr_b.save(str(tmp_path))
  tr_c = make(14)
  assert tr_c.restore(str(tmp_path))
  assert tr_c.step == 7
  tr_c.train((x, y))
  fa = traverse.flatten_dict(tr_a.params)
  fc = traverse.flatten_dict(tr_c.params)
  for p in fa:
    np.testing.assert_array_equal(np.asarray(fa[p]), np.asarray(fc[p]),
                                  err_msg='/'.join(p))
  for p, pk in traverse.flatten_dict(tr_a.packings).items():
    np.testing.assert_array_equal(
        np.asarray(occupancy_grid(pk)),
        np.asarray(occupancy_grid(traverse.flatten_dict(tr_c.packings)[p])))
  for p in tr_a.ema_grids:
    np.testing.assert_array_equal(np.asarray(tr_a.ema_grids[p]),
                                  np.asarray(tr_c.ema_grids[p]))
