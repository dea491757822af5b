"""Tensor-parallel packed block-sparse matmul: column-group sharding over
the 'model' mesh axis (parallel/packed_tp.py).

Validates: fwd/grad equivalence vs the single-device dense view, a full
data+model (4x2) mesh SGD train step matching the unsharded packed step,
per-group drop/grow count preservation, and n_model=1 equivalence with
packed_drop_grow."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rigl_tpu.ops import block_mask as bm_lib
from rigl_tpu.ops.pallas import block_sparse_packed as bsp
from rigl_tpu.parallel import packed_tp as tp
from rigl_tpu.transforms import packed_training as pt

BLK = (64, 64)
NK, NN = 4, 8            # K=256, N=512
KD, ND = NK * BLK[0], NN * BLK[1]
N_ACTIVE = 16            # 50% dense, 2 blocks per column group at nm=8


def _setup(nm, seed=0):
  rs = np.random.RandomState(seed)
  occ = tp.balanced_block_mask(rs, NK, NN, N_ACTIVE, nm)
  tppk = tp.make_tp_packing(occ, nm)
  wd = jnp.asarray(rs.randn(KD, ND) * 0.1, jnp.float32)
  wd = wd * bm_lib.expand_from_blocks(jnp.asarray(occ), (KD, ND), BLK)
  packed = tp.pack_dense_tp(wd, tppk, BLK)
  return occ, tppk, wd, packed, rs


def test_pack_unpack_roundtrip():
  occ, tppk, wd, packed, _ = _setup(4)
  assert packed.shape == (4, N_ACTIVE // 4) + BLK
  np.testing.assert_array_equal(
      np.asarray(tp.unpack_dense_tp(packed, tppk, BLK)), np.asarray(wd))


def test_tp_matmul_matches_dense_view():
  """8-way model sharding: shard_map'd column-group matmul == x @ W."""
  occ, tppk, wd, packed, rs = _setup(8)
  mesh = Mesh(np.array(jax.devices()[:8]), ('model',))
  x = jnp.asarray(rs.randn(32, KD), jnp.float32)

  def local_fwd(xl, w, *pk_arrays):
    # Shard-local pk rows keep their leading axis of 1, exactly the
    # stacked-slice form tp_packed_matmul/local_packing expect.
    lpk = bsp.Packing(pk_arrays[:4], pk_arrays[4:], tppk.shape)
    return tp.tp_packed_matmul(xl, w, lpk, BLK, 8, True)

  pk_flat = tuple(tppk.fwd) + tuple(tppk.bwd)
  fn = jax.jit(shard_map(
      local_fwd, mesh=mesh,
      in_specs=(P(), P('model')) + (P('model'),) * 8,
      out_specs=P(None, 'model'), check_vma=False))
  y = fn(x, packed, *pk_flat)
  np.testing.assert_allclose(np.asarray(y), np.asarray(x @ wd),
                             rtol=1e-5, atol=1e-4)


def test_tp_train_step_matches_unsharded():
  """(4 data, 2 model) mesh: one SGD-momentum step on TP-sharded packed
  weights (batch sharded over 'data', columns over 'model', dx psum'd over
  'model', grads psum'd over 'data') == the unsharded packed step."""
  occ, tppk, wd, packed, rs = _setup(2)
  devs = np.array(jax.devices()[:8]).reshape(4, 2)
  mesh = Mesh(devs, ('data', 'model'))
  batch = 64
  x = jnp.asarray(rs.randn(batch, KD), jnp.float32)
  tx = optax.sgd(0.1, momentum=0.9)
  opt_state = tx.init(packed)

  pk_flat = tuple(tppk.fwd) + tuple(tppk.bwd)
  os_leaves, os_tree = jax.tree.flatten(opt_state)
  assert len(os_leaves) == 1          # sgd-momentum trace

  def local_step(xl, w, mom, *pk_arrays):
    lpk = bsp.Packing(pk_arrays[:4], pk_arrays[4:], tppk.shape)

    def loss(w):
      y = tp.tp_packed_matmul(xl, w, lpk, BLK, 8, True)
      return jnp.sum(y.astype(jnp.float32) ** 2)

    l, g = jax.value_and_grad(loss)(w)
    # Global mean loss: sum over local rows AND local columns -> psum both.
    denom = batch * ND
    l = jax.lax.psum(jax.lax.psum(l, 'data'), 'model') / denom
    g = jax.lax.psum(g, 'data') / denom          # dw is model-local
    os_local = jax.tree.unflatten(os_tree, [mom])
    updates, os_local = tx.update(g, os_local, w)
    w = optax.apply_updates(w, updates)
    return l, w, jax.tree.leaves(os_local)[0]

  specs_pk = (P('model'),) * 8
  fn = jax.jit(shard_map(
      local_step, mesh=mesh,
      in_specs=(P('data'), P('model'), P('model')) + specs_pk,
      out_specs=(P(), P('model'), P('model')),
      check_vma=False))
  loss, w2, mom2 = fn(x, packed, os_leaves[0], *pk_flat)

  # Unsharded reference on the same packed layout.
  def ref_loss(w):
    y = jnp.concatenate([
        bsp.packed_matmul(x, w[g], tp.local_packing(tppk, g), BLK, 8, True)
        for g in range(2)], axis=1)
    return jnp.mean(y.astype(jnp.float32) ** 2)

  l_ref, g_ref = jax.value_and_grad(ref_loss)(packed)
  upd_ref, os_ref = tx.update(g_ref, opt_state, packed)
  w_ref = optax.apply_updates(packed, upd_ref)
  np.testing.assert_allclose(float(loss), float(l_ref), rtol=1e-5)
  np.testing.assert_allclose(np.asarray(w2), np.asarray(w_ref),
                             rtol=1e-4, atol=1e-6)
  np.testing.assert_allclose(np.asarray(mom2),
                             np.asarray(jax.tree.leaves(os_ref)[0]),
                             rtol=1e-4, atol=1e-6)


def test_tp_drop_grow_preserves_per_group_counts():
  occ, tppk, wd, packed, rs = _setup(4, seed=1)
  grow = jnp.asarray(rs.rand(NK, NN).astype(np.float32))
  out = tp.tp_drop_grow(packed, tppk, grow, 0.5)
  occ2 = np.asarray(out.occupancy)
  nn_local = NN // 4
  for g in range(4):
    assert occ2[:, g * nn_local:(g + 1) * nn_local].sum() == N_ACTIVE // 4
  # Round-trip: new packing unpacks with zeros exactly at inactive blocks.
  dense2 = np.asarray(tp.unpack_dense_tp(out.packed, out.packing, BLK))
  exp = np.asarray(bm_lib.expand_from_blocks(jnp.asarray(occ2), (KD, ND),
                                             BLK))
  assert np.all((dense2 != 0) <= (exp > 0))
  # Survivor blocks keep their weights (grown are zeroed).
  surv = (np.asarray(out.grown) == 0)
  for g in range(4):
    w_old = np.asarray(packed[g])
    w_new = np.asarray(out.packed[g])
    perm = np.asarray(out.perm[g])
    for s in range(N_ACTIVE // 4):
      if surv[g, s]:
        np.testing.assert_array_equal(w_new[s], w_old[perm[s]])
      else:
        assert not w_new[s].any()


def test_tp_drop_grow_nm1_matches_packed_drop_grow():
  """With a single model shard, tp_drop_grow IS packed_drop_grow."""
  occ, tppk, wd, packed, rs = _setup(1, seed=2)
  grow = jnp.asarray(rs.rand(NK, NN).astype(np.float32))
  out_tp = tp.tp_drop_grow(packed, tppk, grow, 0.3)
  pk1 = bsp.make_packing(jnp.asarray(occ), N_ACTIVE)
  out_ref = pt.packed_drop_grow(packed[0], pk1, grow, 0.3, N_ACTIVE)
  np.testing.assert_array_equal(np.asarray(out_tp.occupancy),
                                np.asarray(out_ref.occupancy))
  np.testing.assert_array_equal(np.asarray(out_tp.packed[0]),
                                np.asarray(out_ref.packed))


def test_tp_fix_opt_state_moves_and_resets_momentum():
  occ, tppk, wd, packed, rs = _setup(2, seed=3)
  tx = optax.sgd(0.1, momentum=0.9)
  opt_state = tx.init(packed)
  # Fill momentum with recognizable per-slot values.
  mom = jnp.asarray(
      np.arange(1, packed.size + 1, dtype=np.float32).reshape(packed.shape))
  leaves, tree = jax.tree.flatten(opt_state)
  opt_state = jax.tree.unflatten(tree, [mom] + leaves[1:])
  grow = jnp.asarray(rs.rand(NK, NN).astype(np.float32))
  out = tp.tp_drop_grow(packed, tppk, grow, 0.5)
  new_os = tp.tp_fix_opt_state(tx, opt_state, out.perm, out.grown)
  new_mom = np.asarray(jax.tree.leaves(new_os)[0])
  grown = np.asarray(out.grown)
  perm = np.asarray(out.perm)
  for g in range(2):
    for s in range(N_ACTIVE // 2):
      if grown[g, s]:
        assert not new_mom[g, s].any()
      else:
        np.testing.assert_array_equal(new_mom[g, s],
                                      np.asarray(mom[g, perm[g, s]]))


def test_balanced_mask_validation():
  rs = np.random.RandomState(0)
  with pytest.raises(ValueError):
    tp.balanced_block_mask(rs, 4, 8, 15, 4)    # n_active % nm != 0
  with pytest.raises(ValueError):
    tp.balanced_block_mask(rs, 4, 6, 16, 4)    # nn % nm != 0
  # Unbalanced occupancy rejected by make_tp_packing.
  occ = np.zeros((4, 8), np.int32)
  occ[0, 0] = occ[1, 0] = occ[0, 4] = 1
  with pytest.raises(ValueError):
    tp.make_tp_packing(occ, 2)
