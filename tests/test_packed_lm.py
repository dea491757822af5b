"""PackedLMTrainer: end-to-end LM training on packed transformer storage —
learns, survives RigL updates, and resumes deterministically."""

import numpy as np
import pytest

from rigl_tpu.drivers.packed_lm import synthetic_stream
from rigl_tpu.train.packed_lm import PackedLMConfig, PackedLMTrainer

CFG = dict(vocab_size=64, num_layers=1, d_model=64, d_ff=128, num_heads=4,
           seq_len=32, sparsity=0.5, block=(16, 16), bm=32,
           learning_rate=3e-3, warmup_steps=5, batch_size=4,
           maskupdate_begin_step=0, maskupdate_end_step=40,
           maskupdate_frequency=20, seed=0)


@pytest.mark.slow
def test_packed_lm_trains_and_updates():
  tokens = synthetic_stream(6000, seed=0)
  tr = PackedLMTrainer(PackedLMConfig(train_steps=60, **CFG))
  losses = []
  res = tr.train(tokens, eval_tokens=tokens[-2000:],
                 progress_fn=lambda m: losses.append(m['loss']),
                 log_every=10)
  assert res['mask_updates'] >= 2
  assert res['batches'] == res['train_steps'] + res['mask_updates']
  # ln(64) = 4.16 is the uniform floor-less baseline; the stream is 90%
  # deterministic so even a tiny model should beat it clearly.
  assert res['final_loss'] < 3.6, res
  assert res['eval_ce_nats'] < 3.8, res
  assert res['n_params_packed'] < 0.6 * res['n_params_dense_equiv']


def test_packed_lm_no_recompile_across_mask_updates():
  """Packings ride as traced pytree args, so drop/grow must NOT invalidate
  the compiled train step (one compile per run, even over the TPU tunnel)."""
  tokens = synthetic_stream(4000, seed=2)
  tr = PackedLMTrainer(PackedLMConfig(train_steps=45, **CFG))
  tr.init_state()
  compiles = {'step': 0, 'update': 0}
  orig_step, orig_update = tr._make_jit_step, tr._make_jit_update

  def count_step():
    compiles['step'] += 1
    return orig_step()

  def count_update():
    compiles['update'] += 1
    return orig_update()

  tr._make_jit_step = count_step
  tr._make_jit_update = count_update
  res = tr.train(tokens)
  assert res['mask_updates'] >= 2
  assert compiles['step'] == 1, compiles
  assert compiles['update'] == 1, compiles


@pytest.mark.slow
def test_packed_lm_scan_chunk_matches_per_step():
  """steps_per_loop > 1 (lax.scan train_chunk) must be bit-identical to
  the per-step loop: same batch stream, same mask updates, same params."""
  import flax.traverse_util as traverse
  tokens = synthetic_stream(6000, seed=3)
  a = PackedLMTrainer(PackedLMConfig(train_steps=50, **CFG))
  res_a = a.train(tokens)
  b = PackedLMTrainer(PackedLMConfig(train_steps=50, **CFG))
  res_b = b.train(tokens, steps_per_loop=16)
  assert res_a['mask_updates'] == res_b['mask_updates'] >= 2
  assert res_a['batches'] == res_b['batches']
  fa, fb = traverse.flatten_dict(a.params), traverse.flatten_dict(b.params)
  for p in fa:
    np.testing.assert_array_equal(np.asarray(fa[p]), np.asarray(fb[p]),
                                  err_msg='/'.join(p))


@pytest.mark.slow
def test_packed_lm_resume_is_deterministic(tmp_path):
  tokens = synthetic_stream(6000, seed=1)
  cfg_a = PackedLMConfig(train_steps=50, **CFG)
  a = PackedLMTrainer(cfg_a)
  a.train(tokens)

  b = PackedLMTrainer(PackedLMConfig(train_steps=25, **CFG))
  b.train(tokens)
  b.save(str(tmp_path))
  c = PackedLMTrainer(cfg_a)
  assert c.restore(str(tmp_path))
  assert c.step == b.step
  res_c = c.train(tokens)
  assert res_c['batches'] == a.batches_seen

  import flax.traverse_util as traverse
  fa = traverse.flatten_dict(a.params)
  fc = traverse.flatten_dict(c.params)
  for p in fa:
    np.testing.assert_array_equal(np.asarray(fa[p]), np.asarray(fc[p]),
                                  err_msg='/'.join(p))


def test_packed_lm_set_trains_and_updates():
  """SET on packed storage: gradient step applies on update iters (post-
  increment gating — reference sparse_optimizers_base.py:118-146), so NO
  extra batches are consumed; grow is random (stateless fold_in(seed,
  step)), so topology changes without any dense backward."""
  import flax.traverse_util as traverse
  from rigl_tpu.transforms.packed_training import occupancy_grid
  tokens = synthetic_stream(6000, seed=0)
  tr = PackedLMTrainer(PackedLMConfig(train_steps=60, algo='set', **CFG))
  tr.init_state()
  occ0 = {p: np.asarray(occupancy_grid(pk))
          for p, pk in traverse.flatten_dict(tr.packings).items()}
  res = tr.train(tokens, eval_tokens=tokens[-2000:])
  assert res['mask_updates'] >= 2
  # SET consumes exactly one batch per gradient step — updates ride along.
  assert res['batches'] == res['train_steps']
  assert res['final_loss'] < 3.6, res
  changed = 0
  for p, pk in traverse.flatten_dict(tr.packings).items():
    occ1 = np.asarray(occupancy_grid(pk))
    assert occ1.sum() == occ0[p].sum(), p     # count invariance
    changed += int((occ1 != occ0[p]).sum())
  assert changed > 0                          # topology actually moved


@pytest.mark.slow
def test_packed_lm_set_is_deterministic_across_runs():
  """SET grow draws are stateless (fold_in(seed, step)) — two identical
  runs produce bit-identical params and packings."""
  import flax.traverse_util as traverse
  tokens = synthetic_stream(5000, seed=4)
  a = PackedLMTrainer(PackedLMConfig(train_steps=45, algo='set', **CFG))
  a.train(tokens)
  b = PackedLMTrainer(PackedLMConfig(train_steps=45, algo='set', **CFG))
  b.train(tokens)
  fa, fb = traverse.flatten_dict(a.params), traverse.flatten_dict(b.params)
  for p in fa:
    np.testing.assert_array_equal(np.asarray(fa[p]), np.asarray(fb[p]),
                                  err_msg='/'.join(p))


@pytest.mark.slow
def test_packed_lm_set_scan_chunk_matches_per_step():
  """The lax.scan-chunked loop must stay bit-identical for SET's apply-
  then-update ordering (the chunk's LAST step lands on the update iter)."""
  import flax.traverse_util as traverse
  tokens = synthetic_stream(6000, seed=3)
  a = PackedLMTrainer(PackedLMConfig(train_steps=50, algo='set', **CFG))
  res_a = a.train(tokens)
  b = PackedLMTrainer(PackedLMConfig(train_steps=50, algo='set', **CFG))
  res_b = b.train(tokens, steps_per_loop=16)
  assert res_a['mask_updates'] == res_b['mask_updates'] >= 2
  assert res_a['batches'] == res_b['batches'] == 50
  fa, fb = traverse.flatten_dict(a.params), traverse.flatten_dict(b.params)
  for p in fa:
    np.testing.assert_array_equal(np.asarray(fa[p]), np.asarray(fb[p]),
                                  err_msg='/'.join(p))


def test_packed_lm_snfs_trains_and_updates():
  """SNFS on packed storage: block-grid gradient EMA advances at update
  steps (grow = |EMA|); apply-then-update ordering like SET."""
  tokens = synthetic_stream(6000, seed=1)
  tr = PackedLMTrainer(PackedLMConfig(train_steps=60, algo='snfs', **CFG))
  res = tr.train(tokens, eval_tokens=tokens[-2000:])
  assert res['mask_updates'] >= 2
  assert res['batches'] == res['train_steps']
  assert res['final_loss'] < 3.6, res
  assert tr.ema_grids is not None
  # EMA advanced from zeros: every packed kernel's grid has mass.
  for p, g in tr.ema_grids.items():
    assert float(np.abs(np.asarray(g)).sum()) > 0, p


@pytest.mark.slow
def test_packed_lm_snfs_resume_carries_ema(tmp_path):
  """save/restore round-trips the SNFS EMA grids; the resumed run matches
  an uninterrupted one bit-for-bit."""
  import flax.traverse_util as traverse
  tokens = synthetic_stream(6000, seed=2)
  cfg = PackedLMConfig(train_steps=50, algo='snfs', **CFG)
  a = PackedLMTrainer(cfg)
  a.train(tokens)

  b = PackedLMTrainer(PackedLMConfig(train_steps=25, algo='snfs', **CFG))
  b.train(tokens)
  b.save(str(tmp_path))
  c = PackedLMTrainer(cfg)
  assert c.restore(str(tmp_path))
  for p in b.ema_grids:
    np.testing.assert_array_equal(np.asarray(c.ema_grids[p]),
                                  np.asarray(b.ema_grids[p]))
  c.train(tokens)
  fa, fc = traverse.flatten_dict(a.params), traverse.flatten_dict(c.params)
  for p in fa:
    np.testing.assert_array_equal(np.asarray(fa[p]), np.asarray(fc[p]),
                                  err_msg='/'.join(p))


@pytest.mark.slow
def test_packed_lm_generate_from_trained_state():
  """Trainer -> serving: generate() runs the KV-cache decode path on the
  trainer's own packed params/packing trees — greedy output is
  deterministic and matches a full re-forward oracle token-for-token."""
  import jax
  import jax.numpy as jnp
  tokens = synthetic_stream(4000, seed=1)
  tr = PackedLMTrainer(PackedLMConfig(train_steps=10, **CFG))
  tr.train(tokens)
  prompt = np.asarray(tokens[:8], np.int32)
  out = tr.generate(prompt, 4, temperature=0.0)
  assert out.shape == (1, 4)
  again = tr.generate(prompt, 4, temperature=0.0)
  np.testing.assert_array_equal(out, again)

  variables = {'params': tr.params, 'packing': tr.packings}
  seq = jnp.asarray(prompt, jnp.int32)[None]
  for t in range(4):
    logits = tr.model.apply(variables, seq)
    nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
    assert int(nxt[0]) == int(out[0, t]), (t, out)
    seq = jnp.concatenate([seq, nxt[:, None]], axis=1)

  sampled = tr.generate(prompt, 4, temperature=1.0, seed=3)
  assert sampled.shape == (1, 4)
  assert int(sampled.min()) >= 0 and int(sampled.max()) < CFG['vocab_size']
