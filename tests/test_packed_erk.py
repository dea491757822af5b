"""Per-layer ERK sparsity on the PACKED-storage surface
(sparsity/layer_sparsity.py): SparsityMap resolution, ERK budget at block
granularity, per-layer static n_active through init and drop/grow for
every packed family, and the reference-recipe plumbing
(sparse_utils.py:258-316 feeding imagenet_train_eval.py:308-316 — here the
map feeds the packed models directly)."""

import flax.traverse_util as tv
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rigl_tpu.models.packed_convnet import (PackedConvNet,
                                            convnet_layer_shapes,
                                            resnet_layer_shapes,
                                            wrn_layer_shapes)
from rigl_tpu.models.packed_moe import moe_layer_shapes
from rigl_tpu.models.packed_transformer import (PackedTransformer,
                                                transformer_layer_shapes)
from rigl_tpu.sparsity.distributions import get_n_zeros
from rigl_tpu.sparsity.layer_sparsity import (SparsityMap,
                                              achieved_block_sparsity,
                                              make_sparsity_map,
                                              resolve_sparsity,
                                              spec_for_model)


# ------------------------------------------------------------ SparsityMap
def test_sparsity_map_lookup_exact_and_suffix():
  m = SparsityMap({'attn/qkv/kernel': 0.7, 'fc1/kernel': 0.9})
  assert m.lookup('attn/qkv/kernel') == 0.7
  # Suffix: any block prefix resolves to the canonical key.
  assert m.lookup('block3/attn/qkv/kernel') == 0.7
  assert resolve_sparsity(m, ('block0', 'fc1')) == 0.9
  # Floats pass through untouched.
  assert resolve_sparsity(0.8, ('anything',)) == 0.8


def test_sparsity_map_errors():
  m = SparsityMap({'a/fc/kernel': 0.5, 'b/fc/kernel': 0.6})
  with pytest.raises(KeyError, match='no sparsity entry'):
    m.lookup('missing/kernel')
  # 'x/.../fc/kernel' suffix-matches neither full key; but a map with
  # overlapping suffixes must refuse ambiguous paths.
  amb = SparsityMap({'fc/kernel': 0.5, 'deep/fc/kernel': 0.6})
  with pytest.raises(KeyError, match='ambiguous'):
    amb.lookup('x/deep/fc/kernel')
  with pytest.raises(ValueError, match='must be in'):
    SparsityMap({'k': 1.5})


def test_sparsity_map_is_hashable_module_attribute():
  m = SparsityMap({'fc1/kernel': 0.8})
  assert hash(m) == hash(SparsityMap({'fc1/kernel': 0.8}))
  assert m == SparsityMap({'fc1/kernel': 0.8})
  assert m != SparsityMap({'fc1/kernel': 0.9})


def test_spec_for_model_uniform_is_plain_float():
  shapes = transformer_layer_shapes(64, 256)
  assert spec_for_model(shapes, 'random', 0.8) == 0.8
  assert isinstance(spec_for_model(shapes, 'erdos_renyi_kernel', 0.8),
                    SparsityMap)


# --------------------------------------------------------------- budgets
def test_transformer_erk_budget_and_ordering():
  shapes = transformer_layer_shapes(256, 1024)
  m = make_sparsity_map(shapes, 'erdos_renyi_kernel', 0.8)
  d = m.as_dict()
  # ER scaling: the smallest layer (out: d x d) is the densest.
  assert d['attn/out/kernel'] < d['attn/qkv/kernel']
  assert d['attn/qkv/kernel'] < d['fc1/kernel']
  # Budget preserved at block granularity (floor rounding tolerance).
  ach = achieved_block_sparsity(shapes, m, (16, 16))
  assert abs(ach - 0.8) < 0.005, ach
  # ...and exactly (by parameter count) before block flooring.
  total = sum(int(np.prod(s)) for s in shapes.values())
  active = sum(int(np.prod(s)) - get_n_zeros(int(np.prod(s)), d[p])
               for p, s in shapes.items())
  assert abs(1 - active / total - 0.8) < 1e-3


def test_resnet50_erk_map_mirrors_reference_recipe():
  """48 packed conv layers at block (16,16); ERK forces the
  highest-probability layers dense (sparse_utils.py:128-188) and
  preserves the global budget."""
  shapes = resnet_layer_shapes(50, 1.0, (16, 16))
  assert len(shapes) == 48                # 16 bottlenecks x 3 convs
  m = make_sparsity_map(shapes, 'erdos_renyi_kernel', 0.8)
  vals = m.as_dict()
  assert any(v == 0.0 for v in vals.values())     # dense-forced layers
  assert max(vals.values()) > 0.9                 # big layers sparser
  ach = achieved_block_sparsity(shapes, m, (16, 16))
  assert abs(ach - 0.8) < 0.005, ach


def test_wrn_and_convnet_and_moe_shapes_cover_model_paths():
  assert set(wrn_layer_shapes(10, 1)) == {
      f'g{g}_b0/conv{c}/kernel' for g in range(3) for c in (1, 2)}
  assert convnet_layer_shapes(32, ((64, 2), (128, 1)))[
      'stage1/pw/kernel'] == (1, 1, 64, 128)
  ms = moe_layer_shapes(64, 256, 4)
  assert ms['moe/fc1/kernel'] == (4, 64, 256)


# ------------------------------------------------- per-layer n_active
def _expected_n_active(shape, s, block=(16, 16)):
  k2d = int(np.prod(shape[:-1]))
  nb = (k2d // block[0]) * (shape[-1] // block[1])
  return nb - get_n_zeros(nb, s)


def test_packed_transformer_erk_init_counts():
  shapes = transformer_layer_shapes(64, 256)
  m = make_sparsity_map(shapes, 'erdos_renyi_kernel', 0.8)
  model = PackedTransformer(num_layers=2, d_model=64, d_ff=256,
                            num_heads=4, vocab_size=32, sparsity=m,
                            block=(16, 16), bm=64)
  v = jax.eval_shape(model.init, jax.random.key(0),
                     jnp.zeros((1, 8), jnp.int32))
  flat_p = tv.flatten_dict(v['params'])
  flat_pk = tv.flatten_dict(v['packing'])
  checked = 0
  for path in flat_pk:
    key = '/'.join(path)
    s = m.lookup(key)
    want = _expected_n_active(shapes[key.split('/', 1)[1]], s)
    assert flat_p[path].shape[0] == want, (key, s)
    checked += 1
  assert checked == 8


def test_packed_resnet50_erk_census():
  """Full PackedResNet-50 with the ERK map: every packed kernel's
  n_active matches the per-layer solve (eval_shape — no compute)."""
  from rigl_tpu.models.packed_convnet import PackedResNet
  shapes = resnet_layer_shapes(50, 1.0, (16, 16))
  m = make_sparsity_map(shapes, 'erdos_renyi_kernel', 0.8)
  model = PackedResNet(depth=50, num_classes=10, sparsity=m,
                       block=(16, 16), bm=64)
  v = jax.eval_shape(model.init, jax.random.key(0),
                     jnp.zeros((1, 32, 32, 3), jnp.float32))
  flat_p = tv.flatten_dict(v['params'])
  flat_pk = tv.flatten_dict(v['packing'])
  assert len(flat_pk) == 48
  for path in flat_pk:
    key = '/'.join(path)
    want = _expected_n_active(shapes[key], m.lookup(key))
    assert flat_p[path].shape[0] == want, key
  # Dense-forced ERK layers carry FULL occupancy packed storage.
  dense_keys = [k for k, s in m.as_dict().items() if s == 0.0]
  assert dense_keys
  for k in dense_keys:
    nb = ((int(np.prod(shapes[k][:-1])) // 16) * (shapes[k][-1] // 16))
    assert flat_p[tuple(k.split('/'))].shape[0] == nb


# ------------------------------------------------ training w/ drop-grow
def _lm_cfg(**kw):
  from rigl_tpu.train.packed_lm import PackedLMConfig
  # vocab 64: matches the 64-symbol synthetic stream (out-of-range ids
  # would NaN the embed).
  base = dict(vocab_size=64, num_layers=2, d_model=64, d_ff=256,
              num_heads=4, seq_len=32, sparsity=0.8,
              sparsity_distribution='erdos_renyi_kernel',
              block=(16, 16), bm=64, train_steps=8, batch_size=4,
              maskupdate_begin_step=0, maskupdate_end_step=6,
              maskupdate_frequency=4, drop_fraction=0.5, seed=0)
  base.update(kw)
  return PackedLMConfig(**base)


@pytest.mark.parametrize('algo', ['rigl', 'set', 'snfs'])
def test_packed_lm_erk_preserves_per_layer_counts(algo):
  from rigl_tpu.drivers.packed_lm import synthetic_stream
  from rigl_tpu.train.packed_lm import PackedLMTrainer
  from rigl_tpu.transforms.packed_training import occupancy_grid
  tr = PackedLMTrainer(_lm_cfg(algo=algo))
  toks = synthetic_stream(8000)
  res = tr.train(toks)
  assert res['mask_updates'] >= 2
  flat_p = tv.flatten_dict(tr.params)
  counts = {}
  for path, pk in tv.flatten_dict(tr.packings).items():
    occ = int(np.asarray(occupancy_grid(pk)).sum())
    assert occ == flat_p[path].shape[0], path
    counts['/'.join(path[1:])] = occ
  # Distinct ERK layer types kept their DISTINCT static counts.
  assert counts['attn/out/kernel'] < counts['attn/qkv/kernel'] \
      < counts['fc1/kernel']


def test_packed_classifier_erk_trains():
  from rigl_tpu.models.packed_convnet import DenseConvNet
  from rigl_tpu.train.packed_classifier import (PackedClassifierConfig,
                                                PackedClassifierTrainer)
  kw = dict(num_classes=10, stem_width=16, stages=((32, 2), (64, 1)))
  m = make_sparsity_map(convnet_layer_shapes(16, kw['stages']),
                        'erdos_renyi_kernel', 0.75)
  cfg = PackedClassifierConfig(sparsity=0.75, block=(16, 16),
                               train_steps=6, batch_size=32,
                               maskupdate_end_step=5,
                               maskupdate_frequency=3)
  model = PackedConvNet(sparsity=m, block=(16, 16), bm=32, **kw)
  twin = DenseConvNet(**kw)
  rs = np.random.RandomState(0)
  x = rs.randn(128, 8, 8, 1).astype(np.float32)
  y = rs.randint(0, 10, 128).astype(np.int32)
  tr = PackedClassifierTrainer(model, twin, cfg, input_shape=(8, 8, 1))
  res = tr.train((x, y))
  assert res['mask_updates'] >= 1
  assert np.isfinite(res['final_loss'])


# ----------------------------------------------------- SNFS signed EMA
def test_snfs_signed_pooling_cancels_oscillation():
  """The reference ranks grow candidates by |EMA of grad| (abs AFTER the
  EMA, sparse_optimizers.py:126-214): a sign-oscillating gradient scores
  near zero while a consistent one scores high.  The packed pipeline
  (flax_snfs_inst_grids -> snfs_update_ema_grids -> abs) preserves that
  ordering; abs-BEFORE-EMA would rank both equally."""
  from rigl_tpu.layers.packed_dense import random_occupancy
  from rigl_tpu.ops.pallas.block_sparse_packed import make_packing
  from rigl_tpu.transforms import packed_training as pt
  occ = random_occupancy(jax.random.key(0), 2, 2, 2)
  packings = {'l': {'kernel': make_packing(occ, 2)}}
  g = np.zeros((32, 32), np.float32)
  g[:16, :16] = 1.0        # block (0,0): consistent +1
  g[16:, 16:] = 1.0        # block (1,1): oscillates (sign flips below)
  flip = g.copy()
  flip[16:, 16:] = -1.0
  ema = pt.init_snfs_ema_grids(packings)
  for gd in (g, flip) * 4:
    inst = pt.flax_snfs_inst_grids({('l', 'kernel'): jnp.asarray(gd)},
                                   packings, (16, 16))
    ema = pt.snfs_update_ema_grids(ema, inst, 0.9)
  score = np.abs(np.asarray(ema[('l', 'kernel')]))
  # Signed EMA: the oscillating block decays toward (1-m)/(1+m) of the
  # consistent one's steady state; abs-BEFORE-EMA would score them equal.
  assert score[0, 0] > 5 * score[1, 1], score


# ------------------------------------------------------- top_p guard
def test_sample_top_p_degenerate_keeps_top_token():
  from rigl_tpu.serve.decode import _sample
  logits = jnp.asarray([[0.0, 5.0, 1.0, -2.0]])
  for tp in (0.0, 1e-9):
    out = _sample(logits, jax.random.key(0), temperature=1.0, top_p=tp)
    assert int(out[0]) == 1          # the argmax token, never uniform


@pytest.mark.slow
def test_packed_resnet50_erk_parity_and_drop_grow():
  """Packed RN50 at per-layer ERK: forward == dense twin on the unpacked
  params (per-layer n_active transparent to dense_twin_params), and one
  RigL drop/grow update preserves every layer's count — the reference's
  flagship ERK recipe end to end on packed storage."""
  from rigl_tpu.models.packed_convnet import (DenseResNetTwin, PackedResNet,
                                              resnet_layer_shapes)
  from rigl_tpu.train.packed_classifier import (PackedClassifierConfig,
                                                PackedClassifierTrainer)
  from rigl_tpu.train.packed_lm import dense_twin_params
  from rigl_tpu.transforms.packed_training import occupancy_grid
  kw = dict(depth=50, num_classes=10, width_mult=0.25)
  shapes = resnet_layer_shapes(50, 0.25, (16, 16))
  m = make_sparsity_map(shapes, 'erdos_renyi_kernel', 0.8)
  model = PackedResNet(sparsity=m, block=(16, 16), bm=32, **kw)
  x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, 3), jnp.float32)
  variables = model.init(jax.random.key(0), x)
  y_packed = model.apply(variables, x)
  twin = DenseResNetTwin(block=(16, 16), **kw)
  tvars = dense_twin_params(variables['params'], variables['packing'],
                            (16, 16))
  y_twin = twin.apply({'params': tvars}, x)
  np.testing.assert_allclose(np.asarray(y_packed), np.asarray(y_twin),
                             rtol=1e-4, atol=1e-4)

  cfg = PackedClassifierConfig(sparsity=0.8, block=(16, 16),
                               train_steps=2, batch_size=8,
                               maskupdate_begin_step=0,
                               maskupdate_end_step=-1,
                               maskupdate_frequency=1,
                               drop_fraction_anneal='constant')
  rs = np.random.RandomState(0)
  xd = rs.randn(16, 16, 16, 3).astype(np.float32)
  yd = rs.randint(0, 10, 16).astype(np.int32)
  tr = PackedClassifierTrainer(model, twin, cfg, input_shape=(16, 16, 3))
  tr.init_state()
  occ0 = {p: int(np.asarray(occupancy_grid(pk)).sum())
          for p, pk in tv.flatten_dict(tr.packings).items()}
  res = tr.train((xd, yd))
  assert res['mask_updates'] >= 1
  for p, pk in tv.flatten_dict(tr.packings).items():
    assert int(np.asarray(occupancy_grid(pk)).sum()) == occ0[p], p
