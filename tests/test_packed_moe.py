"""Packed Mixture-of-Experts: routing semantics, dense-twin parity,
per-expert RigL drop/grow, training, and checkpointing
(models/packed_moe.py, parallel/packed_ep.py).  Expert-PARALLEL tests
(mesh + all_to_all) live in test_packed_moe_ep.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rigl_tpu.models.packed_moe import (DenseMoETransformer,
                                        PackedMoETransformer)
from rigl_tpu.parallel import packed_ep as ep
from rigl_tpu.train.packed_lm import (PackedLMConfig, PackedLMTrainer,
                                      dense_twin_params)

CFG = dict(vocab_size=64, num_layers=1, d_model=32, d_ff=64, num_heads=2,
           seq_len=16, sparsity=0.5, block=(16, 16), bm=32,
           learning_rate=1e-2, warmup_steps=2, train_steps=6, batch_size=4,
           maskupdate_begin_step=0, maskupdate_end_step=100,
           maskupdate_frequency=3, drop_fraction=0.5, seed=3,
           n_experts=4, capacity_factor=2.0)


def _tokens(n=4000, seed=0):
  return np.random.RandomState(seed).randint(0, 64, size=n).astype(np.int32)


# ------------------------------------------------------------- routing ----
def test_top1_dispatch_capacity_and_combine():
  rs = np.random.RandomState(0)
  logits = jnp.asarray(rs.randn(12, 3), jnp.float32)
  dispatch, combine, aux = ep.top1_dispatch(logits, capacity=2)
  d = np.asarray(dispatch)
  probs = np.asarray(jax.nn.softmax(logits, -1))
  choice = probs.argmax(-1)
  # Each slot holds at most one token; each token occupies at most one slot.
  assert d.sum(axis=0).max() <= 1.0
  assert d.sum(axis=(1, 2)).max() <= 1.0
  # First `capacity` tokens per expert (token order) are kept, rest dropped.
  for e in range(3):
    toks = np.where(choice == e)[0]
    kept = np.where(d[:, e].sum(-1) > 0)[0]
    np.testing.assert_array_equal(kept, toks[:2])
  # Combine carries the chosen expert's probability.
  c = np.asarray(combine)
  for t in range(12):
    if d[t].sum() > 0:
      np.testing.assert_allclose(c[t].sum(), probs[t, choice[t]], rtol=1e-6)
  assert np.isfinite(float(aux)) and float(aux) >= 1.0 - 1e-6


def test_gather_dispatch_matches_onehot_oracle():
  """top1_gather_dispatch (the O(T*d) gather form _MoEFFN runs) must
  reproduce the one-hot top1_dispatch einsums BIT-EXACTLY: same slab
  contents, same combined outputs, same aux — including capacity drops
  and empty slots."""
  rs = np.random.RandomState(2)
  T, E, C, d = 24, 3, 4, 8
  logits = jnp.asarray(rs.randn(T, E) * 2.0, jnp.float32)
  x2d = jnp.asarray(rs.randn(T, d), jnp.float32)
  ye = jnp.asarray(rs.randn(E, C, d), jnp.float32)

  dispatch, combine, aux_ref = ep.top1_dispatch(logits, C)
  xe_ref = jnp.einsum('td,tec->ecd', x2d, dispatch)
  y2d_ref = jnp.einsum('ecd,tec->td', ye, combine)
  assert float(jnp.sum(dispatch)) < T          # some drops occurred

  src, flat_ec, kept, gate, aux = ep.top1_gather_dispatch(logits, C)
  x_pad = jnp.concatenate([x2d, jnp.zeros((1, d), jnp.float32)])
  xe = x_pad[src].reshape(E, C, d)
  y2d = jnp.where(kept, gate, 0.0)[:, None] * ye.reshape(E * C, d)[flat_ec]

  np.testing.assert_array_equal(np.asarray(xe), np.asarray(xe_ref))
  np.testing.assert_array_equal(np.asarray(y2d), np.asarray(y2d_ref))
  np.testing.assert_array_equal(np.asarray(aux), np.asarray(aux_ref))


def test_gather_dispatch_gradients_match_onehot_oracle():
  """d(loss)/d(x) and d(loss)/d(router logits) through the gather form ==
  through the one-hot einsum form (the scatter/gather transposes must
  route cotangents exactly like the einsum transposes)."""
  rs = np.random.RandomState(3)
  T, E, C, d = 16, 4, 3, 8
  x0 = jnp.asarray(rs.randn(T, d), jnp.float32)
  lw = jnp.asarray(rs.randn(d, E) * 0.5, jnp.float32)
  we = jnp.asarray(rs.randn(E, d, d) * 0.3, jnp.float32)
  tgt = jnp.asarray(rs.randn(T, d), jnp.float32)

  def loss_onehot(x, lw):
    dispatch, combine, aux = ep.top1_dispatch(x @ lw, C)
    xe = jnp.einsum('td,tec->ecd', x, dispatch)
    ye = jnp.einsum('ecd,edf->ecf', xe, we)
    y = jnp.einsum('ecd,tec->td', ye, combine)
    return jnp.sum((y - tgt) ** 2) + 0.1 * aux

  def loss_gather(x, lw):
    src, flat_ec, kept, gate, aux = ep.top1_gather_dispatch(x @ lw, C)
    x_pad = jnp.concatenate([x, jnp.zeros((1, d), jnp.float32)])
    xe = x_pad[src].reshape(E, C, d)
    ye = jnp.einsum('ecd,edf->ecf', xe, we)
    y = jnp.where(kept, gate, 0.0)[:, None] * ye.reshape(E * C, d)[flat_ec]
    return jnp.sum((y - tgt) ** 2) + 0.1 * aux

  l1, (gx1, gl1) = jax.value_and_grad(loss_onehot, argnums=(0, 1))(x0, lw)
  l2, (gx2, gl2) = jax.value_and_grad(loss_gather, argnums=(0, 1))(x0, lw)
  np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
  np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), rtol=1e-5,
                             atol=1e-6)
  np.testing.assert_allclose(np.asarray(gl1), np.asarray(gl2), rtol=1e-5,
                             atol=1e-6)


def test_top1_dispatch_aux_is_one_at_perfect_balance():
  # Uniform logits -> argmax all expert 0, so use a balanced assignment:
  # strongly peaked logits, equal counts per expert.
  E, T = 4, 16
  choice = np.tile(np.arange(E), T // E)
  logits = jnp.asarray(np.eye(E)[choice] * 20.0, jnp.float32)
  _, _, aux = ep.top1_dispatch(logits, capacity=T // E)
  np.testing.assert_allclose(float(aux), 1.0, atol=1e-3)


# ------------------------------------------------- expert-stacked store ----
def test_expert_packing_roundtrip():
  rs = np.random.RandomState(1)
  E, nk, nn, cap = 3, 4, 4, 7
  occ = np.zeros((E, nk * nn), np.int32)
  for e in range(E):
    occ[e, rs.choice(nk * nn, cap, replace=False)] = 1
  occ = jnp.asarray(occ.reshape(E, nk, nn))
  pk = ep.expert_packing_from_occ(occ, cap)
  assert ep.is_expert_stacked(pk)
  assert ep.n_experts_of(pk) == E and ep.cap_of(pk) == cap
  np.testing.assert_array_equal(np.asarray(ep.expert_occupancy_grid(pk)),
                                np.asarray(occ))
  w = jnp.asarray(rs.randn(E, nk * 16, nn * 16), jnp.float32)
  dense_masked = np.asarray(w) * np.kron(np.asarray(occ),
                                         np.ones((16, 16)))
  packed = ep.pack_dense_experts(w, pk, (16, 16))
  assert packed.shape == (E, cap, 16, 16)
  np.testing.assert_allclose(
      np.asarray(ep.unpack_dense_experts(packed, pk, (16, 16))),
      dense_masked, rtol=1e-6)


def test_expert_drop_grow_preserves_per_expert_counts():
  rs = np.random.RandomState(2)
  E, nk, nn, cap = 3, 4, 4, 6
  occ = np.zeros((E, nk * nn), np.int32)
  for e in range(E):
    occ[e, rs.choice(nk * nn, cap, replace=False)] = 1
  occ = jnp.asarray(occ.reshape(E, nk, nn))
  pk = ep.expert_packing_from_occ(occ, cap)
  packed = jnp.asarray(rs.randn(E, cap, 16, 16), jnp.float32)
  grids = jnp.asarray(np.abs(rs.randn(E, nk, nn)), jnp.float32)
  out = ep.expert_drop_grow(packed, pk, grids, jnp.float32(0.5))
  new_occ = np.asarray(out.occupancy)
  assert new_occ.shape == (E, nk, nn)
  np.testing.assert_array_equal(new_occ.sum(axis=(1, 2)), [cap] * E)
  # Grown slots start at zero; survivors carry their weights.
  grown = np.asarray(out.grown)
  newp = np.asarray(out.packed)
  assert newp[grown].size == 0 or np.all(newp[grown] == 0)
  # Dense views agree at surviving blocks.
  old_d = np.asarray(ep.unpack_dense_experts(packed, pk, (16, 16)))
  new_d = np.asarray(ep.unpack_dense_experts(out.packed, out.packing,
                                             (16, 16)))
  both = (np.asarray(occ) * new_occ).repeat(16, 1).repeat(16, 2)
  np.testing.assert_allclose(new_d * both, old_d * both, rtol=1e-6)


# ------------------------------------------------------- model parity ----
def test_moe_forward_matches_dense_twin():
  """PackedMoETransformer == DenseMoETransformer on the unpacked params
  (identical routing code; expert matmuls packed vs dense einsum)."""
  kwargs = dict(num_layers=1, d_model=32, d_ff=64, num_heads=2,
                vocab_size=64, num_experts=4, capacity_factor=1.0)
  model = PackedMoETransformer(sparsity=0.5, block=(16, 16), bm=32,
                               **kwargs)
  twin = DenseMoETransformer(**kwargs)
  x = jnp.asarray(np.random.RandomState(0).randint(0, 64, (2, 16)))
  variables = model.init(jax.random.key(0), x)
  y = model.apply({'params': variables['params'],
                   'packing': variables['packing']}, x)
  dv = dense_twin_params(variables['params'], variables['packing'],
                         (16, 16))
  y2 = twin.apply({'params': dv}, x)
  np.testing.assert_allclose(np.asarray(y), np.asarray(y2),
                             rtol=1e-4, atol=1e-4)


# ------------------------------------------------------------ training ----
@pytest.mark.slow
def test_moe_lm_trains_and_updates_masks():
  tr = PackedLMTrainer(PackedLMConfig(**CFG))
  tr.init_state()
  tok = _tokens()
  occ0 = {p: np.asarray(ep.expert_occupancy_grid(pk))
          for p, pk in _expert_packings(tr).items()}
  res = tr.train(tok, eval_tokens=_tokens(1200, 7))
  assert res['mask_updates'] >= 1
  assert np.isfinite(res['final_loss'])
  assert np.isfinite(res['eval_ce_nats'])
  changed = 0
  for p, pk in _expert_packings(tr).items():
    occ1 = np.asarray(ep.expert_occupancy_grid(pk))
    np.testing.assert_array_equal(occ1.sum(axis=(1, 2)),
                                  occ0[p].sum(axis=(1, 2)))
    changed += int((occ1 != occ0[p]).any())
  assert changed > 0, 'no expert mask changed across RigL updates'


def _expert_packings(tr):
  import flax.traverse_util as traverse
  return {p: pk for p, pk in traverse.flatten_dict(tr.packings).items()
          if ep.is_expert_stacked(pk)}


def test_moe_ckpt_roundtrip(tmp_path):
  cfg = PackedLMConfig(**{**CFG, 'train_steps': 4})
  tok = _tokens()
  tr = PackedLMTrainer(cfg)
  tr.init_state()
  tr.train(tok)
  tr.save(str(tmp_path))
  tr2 = PackedLMTrainer(cfg)
  assert tr2.restore(str(tmp_path))
  for (p, a), (q, b) in zip(
      sorted(_flat(tr.params).items()), sorted(_flat(tr2.params).items())):
    assert p == q
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
  x, y = tr.sample_batch(tok)
  x2, y2 = tr2.sample_batch(tok)
  np.testing.assert_array_equal(np.asarray(x), np.asarray(x2))
  l1 = tr.train_step(x, y)
  l2 = tr2.train_step(x2, y2)
  np.testing.assert_allclose(l1, l2, rtol=1e-5)


def _flat(tree):
  import flax.traverse_util as traverse
  return {'/'.join(p): v for p, v in traverse.flatten_dict(tree).items()}
