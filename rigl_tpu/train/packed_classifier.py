"""Image-classification training loop on PACKED block-sparse storage.

The conv-family counterpart of train/packed_lm.py: a PackedConvNet (or any
flax classifier whose sparse kernels are PackedDense/PackedConv1x1) trains
with weights, gradients, and optimizer slots in O(density) packed memory,
RigL drop/grow running ON packed storage through
transforms/packed_training.flax_packed_rigl_update, and the dense-gradient
grow score computed lazily at update steps via the model's dense twin
(the reference's grow-score contract, sparse_optimizers_base.py:328-334;
update-step-only dense views mirror its amortized mask-update cost).

RigL's skip-apply semantics are preserved: a mask-update iteration
consumes a batch WITHOUT advancing the step counter
(sparse_optimizers_base.py:487-521), so `batches == steps + updates`.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional, Tuple

import flax.traverse_util as traverse
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from rigl_tpu.parallel import packed_tp as tp
from rigl_tpu.sparsity.schedules import UpdateSchedule
from rigl_tpu.train.packed_lm import dense_twin_params
from rigl_tpu.transforms import packed_training as pt


@dataclasses.dataclass
class PackedClassifierConfig:
  sparsity: float = 0.8
  block: Tuple[int, int] = (16, 16)
  learning_rate: float = 0.05
  momentum: float = 0.9
  train_steps: int = 1000
  batch_size: int = 100
  maskupdate_begin_step: int = 0
  maskupdate_end_step: int = 750
  maskupdate_frequency: int = 100
  drop_fraction: float = 0.3
  drop_fraction_anneal: str = 'cosine'
  seed: int = 0
  # Drop/grow algorithm on packed storage — same semantics as
  # train/packed_lm.PackedLMConfig.algo: 'rigl' (grow |dense grad|,
  # update REPLACES the gradient step), 'set' (grow uniform random,
  # apply-then-update, no dense backward), 'snfs' (grow |EMA of pooled
  # dense grads|, apply-then-update).
  algo: str = 'rigl'
  snfs_momentum: float = 0.9
  # SPMD: n_data data-parallel shards x n_model tensor-parallel column
  # groups over a (data, model) Mesh; (1, 1) = single-device jit.  With
  # n_model>1 the model must store tp_shards=n_model stacked kernels and
  # a `model_sharded` twin (tp_axis='model') must be passed to the
  # trainer — see train/packed_lm.py for the same contract.
  n_data: int = 1
  n_model: int = 1


class PackedClassifierTrainer:
  """init / step / RigL update / eval for (model, dense_twin) pairs whose
  sparse kernels live in the 'packing' collection (PackedConvNet and
  friends).  All packed shapes are static across the run."""

  def __init__(self, model, dense_twin, cfg: PackedClassifierConfig,
               input_shape: Tuple[int, ...], model_sharded=None):
    if cfg.algo not in ('rigl', 'set', 'snfs'):
      raise ValueError(f'algo must be rigl/set/snfs, got {cfg.algo!r}')
    self.model = model
    self.dense_twin = dense_twin
    self.cfg = cfg
    self.input_shape = tuple(input_shape)
    self.mesh = None
    self.model_sharded = None
    if cfg.n_data > 1 or cfg.n_model > 1:
      if cfg.batch_size % cfg.n_data:
        raise ValueError(f'batch_size={cfg.batch_size} must divide '
                         f'n_data={cfg.n_data}')
      if cfg.n_model > 1 and model_sharded is None:
        raise ValueError('n_model>1 needs a model_sharded instance '
                         "(tp_axis='model')")
      n_dev = cfg.n_data * cfg.n_model
      devs = jax.devices()
      if len(devs) < n_dev:
        raise ValueError(f'need {n_dev} devices for mesh '
                         f'({cfg.n_data} data, {cfg.n_model} model); '
                         f'have {len(devs)}')
      self.mesh = Mesh(np.asarray(devs[:n_dev]).reshape(
          cfg.n_data, cfg.n_model), ('data', 'model'))
      self.model_sharded = (model_sharded if cfg.n_model > 1 else model)
    self.tx = optax.sgd(cfg.learning_rate, momentum=cfg.momentum,
                        nesterov=True)
    self.schedule = UpdateSchedule(
        cfg.maskupdate_begin_step, cfg.maskupdate_end_step,
        cfg.maskupdate_frequency, cfg.drop_fraction,
        cfg.drop_fraction_anneal)
    self.last_update_step = self.schedule.initial_last_update_step
    self.params = None
    self.packings = None
    self.opt_state = None
    self.ema_grids = None
    self.step = 0
    self.batches_seen = 0
    self._jit_step = None
    self._jit_update = None

  def init_state(self):
    cfg = self.cfg
    dummy = jnp.zeros((1,) + self.input_shape, jnp.float32)
    variables = self.model.init(jax.random.key(cfg.seed), dummy)
    self.params = variables['params']
    self.packings = variables.get('packing', {})
    self.opt_state = self.tx.init(self.params)
    self.ema_grids = (pt.init_snfs_ema_grids(self.packings)
                      if cfg.algo == 'snfs' else None)
    self.step = 0
    self.batches_seen = 0
    self.last_update_step = self.schedule.initial_last_update_step
    self._jit_step = None
    self._jit_update = None

  # -------------------------------------------------------------- loss ----
  def _loss_with(self, model, params, packings, x, y):
    lg = model.apply({'params': params, 'packing': packings}, x)
    ll = jax.nn.log_softmax(lg.astype(jnp.float32))
    return -jnp.mean(ll[jnp.arange(y.shape[0]), y])

  def _loss(self, params, packings, x, y):
    return self._loss_with(self.model, params, packings, x, y)

  def _make_jit_step(self):
    # Packings ride as TRACED args (Packing is a registered pytree), so
    # drop/grow never recompiles the step — see train/packed_lm.py.
    if self.mesh is None:
      @jax.jit
      def step_fn(params, packings, opt_state, x, y):
        loss, g = jax.value_and_grad(
            lambda p: self._loss(p, packings, x, y))(params)
        updates, opt_state = self.tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

      return step_fn
    return self._make_sharded_step()

  def _make_sharded_step(self):
    """One SPMD train step over the (data, model) mesh — the same
    Megatron f/g pattern as train/packed_lm._make_sharded_step: batch
    sharded on 'data' (grads pmean'd), packed kernels column-group
    sharded on 'model' (dw/optimizer local; dx psum'd inside the packed
    layers via replicate_for_tp, outputs all-gathered slice-backward)."""
    from jax import shard_map

    model = self.model_sharded
    spec_p, spec_pk, spec_os = tp.mesh_spec_trees(
        self.tx, self.params, self.packings, self.opt_state,
        self.cfg.n_model)

    def local_step(params, packings, opt_state, x, y):
      loss, g = jax.value_and_grad(
          lambda p: self._loss_with(model, p, packings, x, y))(params)
      loss = jax.lax.pmean(loss, 'data')
      g = jax.lax.pmean(g, 'data')
      updates, opt_state = self.tx.update(g, opt_state, params)
      return optax.apply_updates(params, updates), opt_state, loss

    return jax.jit(shard_map(
        local_step, mesh=self.mesh,
        in_specs=(spec_p, spec_pk, spec_os, P('data'), P('data')),
        out_specs=(spec_p, spec_os, P()), check_vma=False))

  def train_step(self, x, y) -> float:
    if self._jit_step is None:
      self._jit_step = self._make_jit_step()
    self.params, self.opt_state, loss = self._jit_step(
        self.params, self.packings, self.opt_state, x, y)
    return float(loss)

  def is_update_step(self, step: int) -> bool:
    return bool(self.schedule.is_update_iter(step, self.last_update_step))

  def _dense_twin_grads(self, params, packings, x, y):
    """Dense grads of the packed kernels via the twin (RigL/SNFS grow
    scores); jit-traceable — see train/packed_lm.py."""
    dv = dense_twin_params(params, packings, self.cfg.block)

    def dense_loss(dv):
      lg = self.dense_twin.apply({'params': dv}, x).astype(jnp.float32)
      ll = jax.nn.log_softmax(lg)
      return -jnp.mean(ll[jnp.arange(y.shape[0]), y])

    gd = traverse.flatten_dict(jax.grad(dense_loss)(dv))
    flat_pk = traverse.flatten_dict(packings)
    return {p[:-2] + ('kernel',): v for p, v in gd.items()
            if p[:-2] + ('kernel',) in flat_pk}

  def _make_jit_update(self):
    """The whole drop/grow update as ONE jitted program, drop_fraction
    traced — one compile per run; grow-score stage per cfg.algo (see
    train/packed_lm.py for the algorithm semantics)."""
    cfg = self.cfg

    if cfg.algo == 'set':
      @jax.jit
      def set_fn(params, packings, opt_state, key, df):
        grids = pt.flax_set_grow_grids(packings, key)
        out = pt.flax_packed_drop_grow(params, packings, opt_state,
                                       self.tx, grids, df)
        return out.params, out.packings, out.opt_state, out.occupancy

      return set_fn

    if cfg.algo == 'snfs':
      @jax.jit
      def snfs_fn(params, packings, opt_state, ema_grids, x, y, df):
        # Signed pooled grads -> EMA -> |EMA| grow score (the reference's
        # abs-AFTER-EMA ranking; see flax_snfs_inst_grids).
        inst = pt.flax_snfs_inst_grids(
            self._dense_twin_grads(params, packings, x, y), packings,
            cfg.block)
        ema = pt.snfs_update_ema_grids(ema_grids, inst, cfg.snfs_momentum)
        out = pt.flax_packed_drop_grow(
            params, packings, opt_state, self.tx,
            {p: jnp.abs(v) for p, v in ema.items()}, df)
        return out.params, out.packings, out.opt_state, out.occupancy, ema

      return snfs_fn

    @jax.jit
    def rigl_fn(params, packings, opt_state, x, y, df):
      out = pt.flax_packed_rigl_update(
          params, packings, opt_state, self.tx,
          self._dense_twin_grads(params, packings, x, y), df, cfg.block)
      return out.params, out.packings, out.opt_state, out.occupancy

    return rigl_fn

  def mask_update(self, x, y):
    if self._jit_update is None:
      self._jit_update = self._make_jit_update()
    cfg = self.cfg
    df = jnp.float32(self.schedule.get_drop_fraction(self.step))
    if cfg.algo == 'set':
      key = jax.random.fold_in(jax.random.key(cfg.seed), self.step)
      self.params, self.packings, self.opt_state, occ = self._jit_update(
          self.params, self.packings, self.opt_state, key, df)
    elif cfg.algo == 'snfs':
      (self.params, self.packings, self.opt_state, occ,
       self.ema_grids) = self._jit_update(
          self.params, self.packings, self.opt_state, self.ema_grids,
          x, y, df)
    else:
      self.params, self.packings, self.opt_state, occ = self._jit_update(
          self.params, self.packings, self.opt_state, x, y, df)
    self.last_update_step = self.step
    # No jit-step reset: packings are traced args, shapes are static.
    return occ

  # --------------------------------------------------------------- eval ----
  def evaluate(self, x: np.ndarray, y: np.ndarray) -> float:
    correct = 0
    bs = self.cfg.batch_size
    params, packings = self.params, self.packings
    if self.mesh is not None:
      # Eval runs the global (tp_axis=None) model outside shard_map:
      # fetch the mesh-sharded state into ordinary single-device arrays.
      params = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), params)
      packings = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)),
                              packings)
    apply = jax.jit(lambda p, xb: self.model.apply(
        {'params': p, 'packing': packings}, xb))
    for i in range(0, len(x), bs):
      xb = jnp.asarray(x[i:i + bs])
      lg = apply(params, xb)
      correct += int(np.sum(np.argmax(np.asarray(lg), -1)
                            == y[i:i + len(xb)]))
    return correct / len(x)

  # ---------------------------------------------------------------- loop ----
  def sample_batch(self, x: np.ndarray, y: np.ndarray):
    cfg = self.cfg
    rs = np.random.RandomState(
        (cfg.seed * 1000003 + self.batches_seen) % (2 ** 31))
    idx = rs.randint(0, len(x), size=cfg.batch_size)
    self.batches_seen += 1
    return jnp.asarray(x[idx]), jnp.asarray(y[idx])

  def train(self, train_xy, eval_xy: Optional[tuple] = None,
            progress_fn=None, log_every: int = 0) -> Dict[str, Any]:
    cfg = self.cfg
    if self.opt_state is None:
      self.init_state()
    xtr, ytr = train_xy
    n_updates = 0
    loss = float('nan')
    while self.step < cfg.train_steps:
      x, y = self.sample_batch(xtr, ytr)
      if cfg.algo == 'rigl' and self.is_update_step(self.step):
        # RigL: update REPLACES the gradient step (batch consumed, step
        # unchanged — sparse_optimizers_base.py:487-521).
        self.mask_update(x, y)
        n_updates += 1
        continue
      loss = self.train_step(x, y)
      self.step += 1
      if cfg.algo != 'rigl' and self.is_update_step(self.step):
        # SET/SNFS: apply-then-update on the post-increment step, no
        # extra batch (sparse_optimizers_base.py:118-146).
        self.mask_update(x, y)
        n_updates += 1
      if log_every and self.step % log_every == 0 and progress_fn:
        progress_fn({'step': self.step, 'loss': loss})
    flat_p = traverse.flatten_dict(self.params)
    flat_pk = traverse.flatten_dict(self.packings)
    n_packed = sum(int(np.prod(v.shape)) for p, v in flat_p.items()
                   if p in flat_pk)
    n_dense_equiv = sum(
        int(np.prod(flat_pk[p]['shape']))
        * (tp.n_groups(flat_pk[p]) if tp.is_stacked(flat_pk[p]) else 1)
        * cfg.block[0] * cfg.block[1]
        for p in flat_pk)
    result = {'train_steps': self.step, 'mask_updates': n_updates,
              'batches': self.batches_seen, 'final_loss': loss,
              'sparsity': cfg.sparsity,
              'n_params_packed': n_packed,
              'n_params_dense_equiv': n_dense_equiv}
    if eval_xy is not None:
      result['eval_top_1'] = self.evaluate(*eval_xy)
    return result

  # ----------------------------------------------------------------- ckpt ----
  def save(self, path: str):
    """Packed params + occupancy grids (packings rebuild deterministically
    from occupancy + the static n_active) + optimizer leaves + counters +
    SNFS EMA — the same npz contract as PackedLMTrainer.save."""
    from rigl_tpu.ops.pallas.block_sparse_packed import make_packing  # noqa: F401
    os.makedirs(path, exist_ok=True)
    flat = {'step': np.asarray(self.step),
            'last_update': np.asarray(self.last_update_step),
            'batches_seen': np.asarray(self.batches_seen)}
    for p, pk in traverse.flatten_dict(self.packings).items():
      occ = (tp.tp_occupancy_grid(pk) if tp.is_stacked(pk)
             else pt.occupancy_grid(pk))
      flat['occ_' + '/'.join(p)] = np.asarray(occ)
    for p, v in traverse.flatten_dict(self.params).items():
      flat['param_' + '/'.join(p)] = np.asarray(v)
    if self.ema_grids is not None:
      for p, v in self.ema_grids.items():
        flat['ema_' + '/'.join(p)] = np.asarray(v)
    leaves, _ = jax.tree.flatten(self.opt_state)
    for i, leaf in enumerate(leaves):
      flat[f'opt_{i}'] = np.asarray(leaf)
    np.savez(os.path.join(path, 'packed_classifier_state.npz'), **flat)

  def restore(self, path: str) -> bool:
    from rigl_tpu.ops.pallas.block_sparse_packed import make_packing
    f = os.path.join(path, 'packed_classifier_state.npz')
    if not os.path.exists(f):
      return False
    if self.opt_state is None:
      self.init_state()
    z = np.load(f)
    self.step = int(z['step'])
    self.last_update_step = int(z['last_update'])
    self.batches_seen = int(z['batches_seen'])
    flat_pk = traverse.flatten_dict(self.packings)
    flat_p = traverse.flatten_dict(self.params)
    new_pk, new_p = {}, {}
    for p in flat_pk:
      occ = jnp.asarray(z['occ_' + '/'.join(p)])
      if tp.is_stacked(flat_pk[p]):
        # Stacked layout: per-group cap is the static shard shape.
        new_pk[p] = tp.stacked_packing_from_occ(
            occ, int(flat_p[p].shape[0]), int(flat_p[p].shape[1]))
      else:
        new_pk[p] = make_packing(occ, int(flat_p[p].shape[0]))
    for p in flat_p:
      new_p[p] = jnp.asarray(z['param_' + '/'.join(p)])
    self.packings = traverse.unflatten_dict(new_pk)
    self.params = traverse.unflatten_dict(new_p)
    if self.ema_grids is not None:
      self.ema_grids = {p: jnp.asarray(z['ema_' + '/'.join(p)])
                        for p in self.ema_grids}
    leaves, treedef = jax.tree.flatten(self.opt_state)
    self.opt_state = jax.tree.unflatten(
        treedef, [jnp.asarray(z[f'opt_{i}']) for i in range(len(leaves))])
    self._jit_step = None
    self._jit_update = None
    return True
