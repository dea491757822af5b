"""Generates MULTI-STEP golden trajectories by EXECUTING the reference's
TF1 sparse optimizers (rigl/sparse_optimizers.py + sparse_optimizers_base.py)
for ~300 training steps on a tiny 2-layer model, recording masks / latent
weights / optimizer slots / global_step after EVERY step.

tests/test_golden_trajectories.py replays the identical per-step dense
gradients through rigl_tpu's SparseTraining.step and demands bit-exact
masks, weights, slots, and step accounting — covering the semantics the
single-call goldens (drop_grow_traces.npz) cannot: schedule gating
(sparse_optimizers_base.py:152-230), RigL's skip-apply step accounting
(:487-521), SNFS's pre-apply EMA (sparse_optimizers.py:195-197), momentum
reset on grown connections (:345-353 / :555-564), SNIP's one-shot step-0
prune (:258-337) and DNW's every-step remask (:408-471).

Fixtures are reference-GENERATED data (the reference code itself runs
here); nothing is transcribed.  Reference randomness is treated as data:
the stateless drop-noise / SET grow scores are recomputed in-process with
the same seeds (pure functions of (hash(name), global_step)) and recorded,
so the replay side injects the exact tensors the reference drew.

Requirements: TensorFlow 2.x (graph mode via tf.compat.v1) and read access
to /root/reference.  tensorflow.contrib.model_pruning and
google_research.micronet_challenge (unavailable) are stubbed: the stub
only routes the optimizers' get_weights()/get_masks()/get_masked_weights()
to this script's variable registry, which is what the TF1 collections did.

  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      python tests/golden/generate_trajectory_traces.py
"""

import argparse
import json
import os
import sys
import types

import numpy as np

_REGISTRY = {'weights': [], 'masks': [], 'masked_weights': []}


def install_stubs(reference_root):
  """Stubs tensorflow.contrib.model_pruning + google_research before the
  reference imports resolve; pruning.get_* read this script's registry."""
  sys.path.insert(0, reference_root)

  pruning_stub = types.ModuleType(
      'tensorflow.contrib.model_pruning.python.pruning')
  pruning_stub.get_weights = lambda: list(_REGISTRY['weights'])
  pruning_stub.get_masks = lambda: list(_REGISTRY['masks'])
  pruning_stub.get_masked_weights = lambda: list(_REGISTRY['masked_weights'])
  contrib = types.ModuleType('tensorflow.contrib')
  mp = types.ModuleType('tensorflow.contrib.model_pruning')
  py = types.ModuleType('tensorflow.contrib.model_pruning.python')
  py.pruning = pruning_stub
  mp.python = py
  contrib.model_pruning = mp
  sys.modules['tensorflow.contrib'] = contrib
  sys.modules['tensorflow.contrib.model_pruning'] = mp
  sys.modules['tensorflow.contrib.model_pruning.python'] = py
  sys.modules['tensorflow.contrib.model_pruning.python.pruning'] = \
      pruning_stub

  gr = types.ModuleType('google_research')
  mc = types.ModuleType('google_research.micronet_challenge')
  counting = types.ModuleType('google_research.micronet_challenge.counting')
  mc.counting = counting
  gr.micronet_challenge = mc
  sys.modules['google_research'] = gr
  sys.modules['google_research.micronet_challenge'] = mc
  sys.modules['google_research.micronet_challenge.counting'] = counting


def random_mask(rng, shape, sparsity):
  n = int(np.prod(shape))
  n_zeros = int(np.floor(sparsity * n))  # sparse_utils.get_n_zeros
  flat = np.ones(n, np.float32)
  flat[:n_zeros] = 0.0
  rng.shuffle(flat)
  return flat.reshape(shape)


def build_graph(tf1, case, rng):
  """Tiny 2-layer MLP with {scope}/weights + {scope}/mask variables and
  masked-weight forward, the model_pruning convention the reference's
  PruningGetterTf1Mixin expects (sparse_optimizers.py:46-66)."""
  shapes = [(12, 16), (16, 4)]
  sparsities = case['sparsities']
  w_init = [rng.normal(0, 1.0, s).astype(np.float32) for s in shapes]
  if case['kind'] in ('snip', 'dnw'):
    # Reference convention: SNIP/DNW start DENSE (masks all ones); SNIP
    # prunes once at step 0 from |g*w|, DNW remasks every step by |w|.
    m_init = [np.ones(s, np.float32) for s in shapes]
  else:
    m_init = [random_mask(rng, s, sp) for s, sp in zip(shapes, sparsities)]

  x_ph = tf1.placeholder(tf1.float32, [None, 12], name='x')
  y_ph = tf1.placeholder(tf1.int32, [None], name='y')

  _REGISTRY['weights'].clear()
  _REGISTRY['masks'].clear()
  _REGISTRY['masked_weights'].clear()

  h = x_ph
  for i, (shape, name) in enumerate(zip(shapes, ['layer1', 'layer2'])):
    with tf1.variable_scope(name):
      w = tf1.get_variable('weights', initializer=w_init[i])
      m = tf1.get_variable('mask', initializer=m_init[i], trainable=False)
    mw = tf1.multiply(m, w, name=f'{name}/masked_weight')
    _REGISTRY['weights'].append(w)
    _REGISTRY['masks'].append(m)
    _REGISTRY['masked_weights'].append(mw)
    h = tf1.matmul(h, mw)
    if i == 0:
      h = tf1.tanh(h)
  logits = h
  loss = tf1.reduce_mean(
      tf1.nn.sparse_softmax_cross_entropy_with_logits(labels=y_ph,
                                                      logits=logits))
  # Dense gradients w.r.t. the EFFECTIVE (masked) weights: what the JAX
  # trainer's single backward produces (CLAUDE.md invariant), recorded
  # per step and replayed verbatim.
  dense_grads = tf1.gradients(loss, _REGISTRY['masked_weights'])
  return x_ph, y_ph, loss, dense_grads, w_init, m_init


def make_optimizer(tf1, sparse_optimizers, case, inner):
  kind = case['kind']
  sched = case.get('sched', {})
  common = dict(begin_step=sched.get('begin', 0),
                end_step=sched.get('end', -1),
                frequency=sched.get('freq', 25),
                drop_fraction=sched.get('drop_fraction', 0.3),
                drop_fraction_anneal=sched.get('anneal', 'constant'),
                grow_init=case.get('grow_init', 'zeros'))
  if kind == 'rigl':
    return sparse_optimizers.SparseRigLOptimizer(
        inner, initial_acc_scale=case.get('initial_acc_scale', 0.0),
        **common)
  if kind == 'set':
    return sparse_optimizers.SparseSETOptimizer(inner, **common)
  if kind == 'static':
    return sparse_optimizers.SparseStaticOptimizer(inner, **common)
  if kind == 'momentum':
    return sparse_optimizers.SparseMomentumOptimizer(
        inner, momentum=case.get('ema_momentum', 0.9), **common)
  if kind == 'snip':
    return sparse_optimizers.SparseSnipOptimizer(
        inner, default_sparsity=case['sparsities'][0],
        mask_init_method='random',
        custom_sparsity_map={'layer2': case['sparsities'][1]})
  if kind == 'dnw':
    return sparse_optimizers.SparseDNWOptimizer(
        inner, default_sparsity=case['sparsities'][0],
        mask_init_method='random',
        custom_sparsity_map={'layer2': case['sparsities'][1]})
  raise ValueError(kind)


def stateless_mirrors(tf1, opt, gs_ph):
  """Recomputes the in-graph stateless draws (pure fns of (seed, step)):
  drop noise (sparse_optimizers_base.py:266-270 / 530-534) and SET's grow
  uniform (:272-273), parameterized on a global_step placeholder so the
  generator can evaluate them at any step value."""
  from tensorflow.python.ops import stateless_random_ops
  mirrors = {}
  for w in _REGISTRY['weights']:
    c_drop = np.int64(hash(w.name + 'drop'))
    seed_d = tf1.cast(tf1.stack([tf1.constant(c_drop), gs_ph]), tf1.int32)
    mirrors[w.name + '/drop_noise'] = \
        stateless_random_ops.stateless_random_normal(
            w.shape, stddev=1e-5, dtype=tf1.float32, seed=seed_d)
    c_grow = np.int64(hash(w.name + 'grow'))
    seed_g = tf1.cast(tf1.stack([tf1.constant(c_grow), gs_ph]), tf1.int32)
    mirrors[w.name + '/grow_uniform'] = \
        stateless_random_ops.stateless_random_uniform(w.shape, seed=seed_g)
  return mirrors


def run_case(tf1, sparse_optimizers, case, steps, rng):
  tf1.reset_default_graph()
  x_ph, y_ph, loss, dense_grads, w_init, m_init = build_graph(
      tf1, case, rng)
  n_data = 64
  data_x = rng.normal(0, 1, (n_data, 12)).astype(np.float32)
  data_y = rng.integers(0, 4, n_data).astype(np.int32)
  batch = 16

  inner = tf1.train.MomentumOptimizer(case.get('lr', 0.1),
                                      case.get('momentum', 0.9))
  opt = make_optimizer(tf1, sparse_optimizers, case, inner)
  global_step = tf1.train.get_or_create_global_step()
  gs_ph = tf1.placeholder(tf1.int64, [], name='gs_ph')

  grads_and_vars = opt.compute_gradients(loss)
  train_op = opt.apply_gradients(grads_and_vars, global_step=global_step)
  mirrors = stateless_mirrors(tf1, opt, gs_ph)

  slot_vars = []
  for w in _REGISTRY['weights']:
    s = inner.get_slot(w, 'momentum')
    slot_vars.append(s if s is not None else tf1.zeros_like(w))

  ema_vars = []
  if case['kind'] == 'momentum':
    ema_vars = [opt._ema_grads.average(g) for g in opt._masked_grads]

  state_fetches = {
      'masks': _REGISTRY['masks'], 'weights': _REGISTRY['weights'],
      'slots': slot_vars, 'gs': global_step}
  if hasattr(opt, 'is_snipped'):
    state_fetches['is_snipped'] = opt.is_snipped

  rec = {'dense_grads': [], 'masks': [], 'weights': [], 'slots': [],
         'gs': [], 'batch_x': [], 'batch_y': [], 'drop_noise': [],
         'grow_uniform': [], 'ema': [], 'is_snipped': []}

  with tf1.Session() as sess:
    sess.run(tf1.global_variables_initializer())
    for t in range(steps):
      idx = (np.arange(batch) + t * batch) % n_data
      feed = {x_ph: data_x[idx], y_ph: data_y[idx]}
      # Run 1 (pure): record the gradients the optimizer will recompute
      # in run 2 from the identical variable state (no side effects, so
      # no read/write races on the fetched tensors).
      g_now = sess.run(dense_grads, feed)
      rec['dense_grads'].append([g.copy() for g in g_now])
      rec['batch_x'].append(idx.astype(np.int32))
      # Run 2: the actual reference train step (cond: apply and/or mask
      # update per the optimizer's own schedule semantics).
      sess.run(train_op, feed)
      st = sess.run(state_fetches)
      rec['masks'].append([m.copy() for m in st['masks']])
      rec['weights'].append([w.copy() for w in st['weights']])
      rec['slots'].append([s.copy() for s in st['slots']])
      rec['gs'].append(int(st['gs']))
      if 'is_snipped' in st:
        rec['is_snipped'].append(bool(st['is_snipped']))
      if ema_vars:
        rec['ema'].append([e.copy() for e in sess.run(ema_vars, feed)])
      # Stateless draws at the candidate step values around the realized
      # global_step; the replay test determines which one the in-graph
      # cond used by matching the recorded masks.
      noise = {}
      for cand in sorted({max(rec['gs'][-1] - 1, 0), rec['gs'][-1],
                          rec['gs'][-1] + 1}):
        noise[cand] = sess.run(mirrors, {gs_ph: cand})
      rec['drop_noise'].append(noise)

  return {'w_init': w_init, 'm_init': m_init, 'rec': rec,
          'data_x': data_x, 'data_y': data_y, 'batch': batch}


CASES = [
    dict(name='rigl_cosine', kind='rigl',
         sched=dict(begin=20, end=200, freq=25, drop_fraction=0.3,
                    anneal='cosine'),
         sparsities=(0.5, 0.75)),
    dict(name='rigl_accscale', kind='rigl',
         sched=dict(begin=0, end=-1, freq=40, drop_fraction=0.2,
                    anneal='constant'),
         initial_acc_scale=0.5, grow_init='zeros', sparsities=(0.5, 0.5)),
    dict(name='set_constant', kind='set',
         sched=dict(begin=20, end=200, freq=25, drop_fraction=0.3,
                    anneal='constant'),
         sparsities=(0.5, 0.75)),
    dict(name='static_reinit', kind='static',
         sched=dict(begin=20, end=200, freq=25, drop_fraction=0.3,
                    anneal='constant'),
         sparsities=(0.5, 0.75)),
    dict(name='momentum_ema', kind='momentum',
         sched=dict(begin=20, end=200, freq=25, drop_fraction=0.3,
                    anneal='constant'),
         ema_momentum=0.9, sparsities=(0.5, 0.75)),
    dict(name='snip_step0', kind='snip', sparsities=(0.5, 0.75)),
    dict(name='dnw_everystep', kind='dnw', sparsities=(0.5, 0.75)),
]


def flatten_case(name, out, arrays, meta):
  rec = out['rec']
  T = len(rec['gs'])
  L = len(out['w_init'])
  for i in range(L):
    arrays[f'{name}/w_init_{i}'] = out['w_init'][i]
    arrays[f'{name}/m_init_{i}'] = out['m_init'][i]
    arrays[f'{name}/dense_grads_{i}'] = np.stack(
        [g[i] for g in rec['dense_grads']])
    arrays[f'{name}/masks_{i}'] = np.stack([m[i] for m in rec['masks']])
    arrays[f'{name}/weights_{i}'] = np.stack(
        [w[i] for w in rec['weights']])
    arrays[f'{name}/slots_{i}'] = np.stack([s[i] for s in rec['slots']])
    if rec['ema']:
      arrays[f'{name}/ema_{i}'] = np.stack([e[i] for e in rec['ema']])
  arrays[f'{name}/gs'] = np.asarray(rec['gs'], np.int64)
  if rec['is_snipped']:
    arrays[f'{name}/is_snipped'] = np.asarray(rec['is_snipped'], np.bool_)
  # Stateless draws: (T, n_cand, ...) per layer + the candidate gs values.
  cand_sets = [sorted(n.keys()) for n in rec['drop_noise']]
  n_cand = max(len(c) for c in cand_sets)
  names = [w_name for w_name in rec['drop_noise'][0][cand_sets[0][0]]]
  drop_names = sorted(n for n in names if n.endswith('/drop_noise'))
  grow_names = sorted(n for n in names if n.endswith('/grow_uniform'))
  for i, (dn, gn) in enumerate(zip(drop_names, grow_names)):
    dshape = rec['drop_noise'][0][cand_sets[0][0]][dn].shape
    d_all = np.zeros((T, n_cand) + dshape, np.float32)
    g_all = np.zeros((T, n_cand) + dshape, np.float32)
    c_all = np.full((T, n_cand), -1, np.int64)
    for t in range(T):
      for j, cand in enumerate(cand_sets[t]):
        d_all[t, j] = rec['drop_noise'][t][cand][dn]
        g_all[t, j] = rec['drop_noise'][t][cand][gn]
        c_all[t, j] = cand
    arrays[f'{name}/drop_noise_{i}'] = d_all
    arrays[f'{name}/grow_uniform_{i}'] = g_all
    arrays[f'{name}/noise_gs_{i}'] = c_all
  meta.append({'name': name, 'steps': T})


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--reference', default='/root/reference')
  parser.add_argument('--steps', type=int, default=300)
  parser.add_argument('--out', default=os.path.join(
      os.path.dirname(os.path.abspath(__file__)), 'trajectory_traces.npz'))
  args = parser.parse_args()

  install_stubs(args.reference)
  import tensorflow.compat.v1 as tf1
  tf1.disable_eager_execution()
  tf1.disable_v2_behavior()
  # TF >= 2.x moved cond/Assert helpers out of control_flow_ops; restore
  # the TF1-era attribute surface the reference was written against.
  from tensorflow.python.ops import array_ops, control_flow_ops
  for mod, attr, repl in (
      (control_flow_ops, 'cond', tf1.cond),
      (control_flow_ops, 'Assert', tf1.debugging.Assert),
      (control_flow_ops, 'group', tf1.group),
      (control_flow_ops, 'no_op', tf1.no_op),
      (array_ops, 'stack', tf1.stack),
      (array_ops, 'where', tf1.where)):
    if not hasattr(mod, attr):
      setattr(mod, attr, repl)
  from rigl import sparse_optimizers

  arrays, meta = {}, []
  import zlib
  for case in CASES:
    rng = np.random.default_rng(20260819 + zlib.crc32(
        case['name'].encode()) % 1000)
    out = run_case(tf1, sparse_optimizers, case, args.steps, rng)
    flatten_case(case['name'], out, arrays, meta)
    print(f"{case['name']}: {args.steps} steps, final gs "
          f"{out['rec']['gs'][-1]}")

  np.savez_compressed(args.out, **arrays)
  with open(args.out.replace('.npz', '_meta.json'), 'w') as f:
    json.dump({'cases': [dict(c, **m) for c, m in zip(
        [{k: v for k, v in c.items() if k != 'name'} for c in CASES],
        meta)],
               'generator': 'tests/golden/generate_trajectory_traces.py',
               'reference':
                   'rigl/sparse_optimizers.py + sparse_optimizers_base.py',
               'inner_optimizer': 'MomentumOptimizer(lr, momentum)'},
              f, indent=2, default=str)
  import tensorflow as tf
  print(f'wrote {args.out} ({len(arrays)} arrays), tf {tf.__version__}')


if __name__ == '__main__':
  main()
