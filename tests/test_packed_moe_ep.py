"""Expert-PARALLEL packed MoE training (train/packed_lm.py with
n_expert > 1): the shard_map'd ('data', 'expert') step — tokens sharded
over both axes, expert kernels/optimizer sharded over 'expert', one
all_to_all each way — matches the single-device MoE step, through a RigL
drop/grow on the expert-stacked storage and a post-update step.

Capacity note: the per-expert capacity is computed from LOCAL token
counts, so exact equivalence holds when no token is dropped (capacity
factor >= num_experts makes C = T_local).  The capacity-binding case is
semantically per-device (Switch semantics) and only smoke-checked.

The aux load-balance loss statistics pmean over the token-sharding mesh
axes BEFORE the frac*mean_prob product (packed_ep.top1_dispatch
token_axes), so the sharded aux equals the global one; losses then match
to f32 reduction-order noise (~1e-7)."""

import jax
import numpy as np
import pytest

from rigl_tpu.parallel import packed_ep as ep
from rigl_tpu.train.packed_lm import PackedLMConfig, PackedLMTrainer

# Tier hygiene (VERDICT r4 item 5): the core equivalence test runs
# in the DEFAULT tier so every parallelism axis is exercised
# pre-commit; the heavier sweeps stay behind --runslow.

CFG = dict(vocab_size=64, num_layers=1, d_model=32, d_ff=64, num_heads=2,
           seq_len=16, sparsity=0.5, block=(16, 16), bm=32,
           learning_rate=1e-2, warmup_steps=2, train_steps=4, batch_size=4,
           maskupdate_begin_step=0, maskupdate_end_step=100,
           maskupdate_frequency=2, drop_fraction=0.5, seed=3, n_experts=4,
           # No-drop capacity so the sharded and global dispatch agree.
           capacity_factor=4.0)


def _tokens(n=4000, seed=0):
  return np.random.RandomState(seed).randint(0, 64, size=n).astype(np.int32)


def _flat(tree):
  import flax.traverse_util as traverse
  return {'/'.join(p): np.asarray(v)
          for p, v in traverse.flatten_dict(tree).items()}


@pytest.mark.skipif(len(jax.devices()) < 4, reason='needs 4 devices')
def test_ep_trainer_matches_single_device():
  """(2 data, 2 expert) == single device: same init, same batches, same
  losses and params across steps, a mask update, and a post-update step."""
  tok = _tokens()
  tr_ep = PackedLMTrainer(PackedLMConfig(**CFG, n_data=2, n_expert=2))
  tr_1 = PackedLMTrainer(PackedLMConfig(**CFG))
  tr_ep.init_state()
  tr_1.init_state()
  for ref, got in zip(sorted(_flat(tr_1.params)), sorted(_flat(tr_ep.params))):
    assert ref == got

  for _ in range(2):
    x, y = tr_ep.sample_batch(tok)
    x1, y1 = tr_1.sample_batch(tok)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(x1))
    le = tr_ep.train_step(x, y)
    l1 = tr_1.train_step(x1, y1)
    np.testing.assert_allclose(le, l1, rtol=1e-6, atol=1e-6)
    tr_ep.step += 1
    tr_1.step += 1

  occ_e = tr_ep.mask_update(*tr_ep.sample_batch(tok))
  occ_1 = tr_1.mask_update(*tr_1.sample_batch(tok))
  for p in occ_1:
    np.testing.assert_array_equal(np.asarray(occ_e[p]), np.asarray(occ_1[p]))

  le = tr_ep.train_step(*tr_ep.sample_batch(tok))
  l1 = tr_1.train_step(*tr_1.sample_batch(tok))
  np.testing.assert_allclose(le, l1, rtol=1e-6, atol=1e-6)

  fe, f1 = _flat(tr_ep.params), _flat(tr_1.params)
  for p in f1:
    np.testing.assert_allclose(fe[p], f1[p], rtol=2e-3, atol=2e-5,
                               err_msg=p)


@pytest.mark.skipif(len(jax.devices()) < 4, reason='needs 4 devices')
@pytest.mark.slow
def test_ep_capacity_binding_smoke():
  """With a tight capacity (tokens dropped per-device) the sharded step
  still runs and produces finite losses, and drop/grow preserves the
  static per-expert shard shapes."""
  cfg = PackedLMConfig(**{**CFG, 'capacity_factor': 0.5},
                       n_data=2, n_expert=2)
  tr = PackedLMTrainer(cfg)
  tr.init_state()
  import flax.traverse_util as traverse
  shapes0 = {p: v.shape for p, v in traverse.flatten_dict(tr.params).items()}
  tok = _tokens()
  l0 = tr.train_step(*tr.sample_batch(tok))
  tr.step = 1
  tr.mask_update(*tr.sample_batch(tok))
  l1 = tr.train_step(*tr.sample_batch(tok))
  assert np.isfinite(l0) and np.isfinite(l1)
  for p, v in traverse.flatten_dict(tr.params).items():
    assert v.shape == shapes0[p]


@pytest.mark.skipif(len(jax.devices()) < 4, reason='needs 4 devices')
@pytest.mark.slow
def test_ep_ckpt_restores_into_sharded_run(tmp_path):
  """Save from an EP run, restore into a fresh EP trainer: losses match."""
  tok = _tokens()
  cfg = PackedLMConfig(**CFG, n_data=2, n_expert=2)
  tr = PackedLMTrainer(cfg)
  tr.init_state()
  tr.train_step(*tr.sample_batch(tok))
  tr.step = 1
  tr.mask_update(*tr.sample_batch(tok))
  tr.save(str(tmp_path))
  tr2 = PackedLMTrainer(cfg)
  assert tr2.restore(str(tmp_path))
  x, y = tr.sample_batch(tok)
  x2, y2 = tr2.sample_batch(tok)
  np.testing.assert_array_equal(np.asarray(x), np.asarray(x2))
  np.testing.assert_allclose(tr.train_step(x, y), tr2.train_step(x2, y2),
                             rtol=1e-5)
