"""The Trainer: config -> model + data + sparse optimizer -> jitted loop.

Mirrors the reference trainers' responsibilities (mnist_train_eval.py,
resnet_train_eval.py, imagenet_train_eval.py) in one config-driven class:
optimizer selection per training_method, mask init / schedule wiring, LR
schedules, periodic eval with top-1/top-5, metrics, and checkpointing.

Distribution: jit over a ('data','model') Mesh with the batch sharded on
'data' — XLA inserts all collectives (see rigl_tpu/parallel/mesh.py).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Callable, Dict, List, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rigl_tpu.data import datasets as datasets_lib
from rigl_tpu.data import pipeline
from rigl_tpu.models import registry
from rigl_tpu.parallel import mesh as mesh_lib
from rigl_tpu.sparsity import masks as masks_lib
from rigl_tpu.sparsity.schedules import UpdateSchedule
from rigl_tpu.train import lr_schedules, steps
from rigl_tpu.train.train_state import TrainState
from rigl_tpu.transforms import algorithms
from rigl_tpu.transforms.sparse_training import SparseTraining


@dataclasses.dataclass
class TrainConfig:
  """Resolved training configuration (the reference's ~80 absl flags
  collapsed into one dataclass; dump with `to_json`)."""
  # model / data
  model: str = 'mnist_mlp'
  model_kwargs: Dict[str, Any] = dataclasses.field(default_factory=dict)
  dataset: str = 'mnist'
  data_dir: Optional[str] = None
  batch_size: int = 128
  eval_batch_size: int = 0

  # optimization
  optimizer: str = 'momentum'        # momentum | adam | sgd
  base_learning_rate: float = 0.1
  lr_schedule: str = 'constant'      # constant|imagenet|cifar|mnist|sgdr
  momentum: float = 0.9
  use_nesterov: bool = True
  weight_decay: float = 0.0
  label_smoothing: float = 0.0
  train_steps: int = 1000
  training_steps_multiplier: float = 1.0

  # sparse training
  training_method: str = 'rigl'      # rigl|set|static|momentum|snip|dnw|
                                     # prune|scratch|none|rigl_inverted
  sparsity: float = 0.8
  mask_init_method: str = 'erdos_renyi_kernel'
  erk_power_scale: float = 1.0
  custom_sparsity_map: Dict[str, float] = dataclasses.field(
      default_factory=dict)
  maskupdate_begin_step: int = 0
  maskupdate_end_step: int = 25000   # reference imagenet default; anneals
                                     # require a positive end_step
  maskupdate_frequency: int = 100
  drop_fraction: float = 0.3
  drop_fraction_anneal: str = 'constant'
  grow_init: str = 'zeros'
  initial_acc_scale: float = 0.0
  prune_initial_sparsity: float = 0.0
  # Block-granular masks (reference's reserved block_width/height flags):
  # 0 = element-granular.
  block_width: int = 0
  block_height: int = 0
  # Block-sparse *execution*: route eligible convs through the
  # block-skipping Pallas matmul (ops/conv.py) instead of dense-times-mask.
  # Requires block_width/height set and a model accepting `block` kwargs
  # (resnet).  conv3x3 extends it to spatial convs via im2col — usually a
  # loss, measure first (ops/block_mask.py::block_executable_layers).
  block_execution: bool = False
  block_conv3x3: bool = False
  block_bm: int = 512
  # Row tile for the tap conv kernel; None = default_tap_bm()/RIGL_TAP_BM.
  block_tap_bm: Optional[int] = None
  # Only block-execute layers at least this sparse (denser layers skip
  # little and pay kernel overhead; 0 = route every eligible layer).
  block_min_sparsity: float = 0.0
  # Measured per-layer routing table {mask path: 'dense'|'tap'|'matmul'},
  # overriding the heuristics for listed layers; block_routing_file points
  # at a JSON of the same mapping (scripts/bench_layer_routing.py output)
  # and is merged under block_routing.
  block_routing: Dict[str, str] = dataclasses.field(default_factory=dict)
  block_routing_file: Optional[str] = None
  # Structured mask init ('per_neuron', 'symmetric', ...); None = random.
  mask_type: Optional[str] = None
  # Resolve the mask-update lax.cond at trace time: compile a plain step
  # and an update step and select host-side from the deterministic
  # schedule (SparseTraining.predict_update_iters).  Removes the cond's
  # ~2% TPU cost from every hot-loop step at the price of a second
  # compile; drop/grow family + gradual pruning only.
  static_update_steps: bool = False
  # Store parameters pre-masked (inactive weights zeroed) so the forward
  # uses them directly — drops the per-step apply_masks full-params
  # multiply.  Drop/grow family only (see SparseTraining.premask_params).
  premask_params: bool = False
  # Runtime guards for the two representation tricks above, checked at
  # log/eval boundaries and at the end of training (device-side compute,
  # one scalar readback per boundary): (1) under premask_params, params
  # must equal params * masks; (2) under static_update_steps, every step's
  # update_hint must have matched the device-evaluated schedule.  A wrong
  # hint or a premask violation raises instead of silently diverging.
  debug_checks: bool = True

  # bookkeeping
  seed: int = 0
  log_every: int = 100
  eval_every: int = 0               # 0 = only at end
  checkpoint_dir: Optional[str] = None
  checkpoint_every: int = 0
  n_synthetic: int = 4096
  # Dump per-layer mask images every N batches (0 = off) to
  # checkpoint_dir/mask_images/ — the reference's with_img=True mask
  # summaries (imagenet_resnet/utils.py:83-90).
  mask_image_every: int = 0
  # Save pre/post snapshots around every mask update and log the grad-norm
  # change the update produced (rigl_tf2/train.py:418-438).  Update steps
  # are predicted host-side from the deterministic schedule.
  snapshot_mask_updates: bool = False
  # Auto-resume from the latest checkpoint in checkpoint_dir (the reference
  # Estimator's model_dir behavior / rigl_tf2 train.py:304-313).
  auto_resume: bool = True
  # Cross-experiment surgery (imagenet_resnet/utils.py:93-125, flags
  # :256-261): initialize masks and/or params from another run's checkpoint.
  init_masks_from: Optional[str] = None
  init_params_from: Optional[str] = None
  # Shuffle loaded masks per layer, preserving sparsity — the mask-shuffling
  # control experiment (rigl_tf2/utils.py:126-128).
  shuffle_loaded_masks: bool = False
  # Capture a jax.profiler trace of steps [profile_start, profile_start+n).
  profile_dir: Optional[str] = None
  profile_start: int = 10
  profile_steps: int = 5

  # parallelism
  n_model_shards: int = 1

  def resolved(self) -> 'TrainConfig':
    """Applies training_steps_multiplier (imagenet_train_eval.py:290-297)."""
    if self.training_steps_multiplier == 1.0:
      return self
    m = self.training_steps_multiplier
    return dataclasses.replace(
        self,
        train_steps=int(self.train_steps * m),
        maskupdate_begin_step=int(self.maskupdate_begin_step * m),
        maskupdate_end_step=(int(self.maskupdate_end_step * m)
                             if self.maskupdate_end_step > 0
                             else self.maskupdate_end_step),
    )

  def to_json(self) -> str:
    return json.dumps(dataclasses.asdict(self), indent=2, default=str)


def build_lr_fn(config: TrainConfig, steps_per_epoch: float):
  name = config.lr_schedule
  if name == 'constant':
    return lr_schedules.constant_lr(config.base_learning_rate)
  if name == 'mnist':
    return lr_schedules.mnist_lr_schedule(config.base_learning_rate)
  if name == 'cifar':
    return lr_schedules.cifar_lr_schedule(config.training_steps_multiplier)
  if name == 'imagenet':
    arch = ('mobilenet' if config.model.startswith('mobilenet') else
            'vgg' if config.model.startswith('vgg') else 'resnet')
    return lr_schedules.imagenet_lr_schedule(
        config.base_learning_rate, config.batch_size, steps_per_epoch,
        lr_schedules.LR_SCHEDULES[arch], config.training_steps_multiplier)
  if name == 'sgdr':
    return lr_schedules.sgdr_schedule(
        config.base_learning_rate, config.batch_size, steps_per_epoch,
        decay_epochs=10.0)
  raise ValueError(f'Unknown lr schedule {name!r}')


def build_optimizer(config: TrainConfig, lr_fn) -> optax.GradientTransformation:
  """Inner optimizer selection (imagenet_train_eval.py:333-365)."""
  if config.optimizer == 'momentum':
    return optax.sgd(lr_fn, momentum=config.momentum,
                     nesterov=config.use_nesterov)
  if config.optimizer == 'sgd':
    return optax.sgd(lr_fn)
  if config.optimizer == 'adam':
    return optax.adam(lr_fn)
  raise ValueError(f'Unknown optimizer {config.optimizer!r}')


def build_algorithm(config: TrainConfig,
                    lr_fn=None) -> algorithms.Algorithm:
  sched = UpdateSchedule(
      begin_step=config.maskupdate_begin_step,
      end_step=config.maskupdate_end_step,
      frequency=config.maskupdate_frequency,
      drop_fraction=config.drop_fraction,
      drop_fraction_anneal=config.drop_fraction_anneal,
      lr_fn=lr_fn,
  )
  name = config.training_method
  kwargs: Dict[str, Any] = {}
  if name in ('set', 'rigl', 'rigl_inverted', 'static', 'momentum', 'snfs'):
    kwargs = dict(schedule=sched, grow_init=config.grow_init)
    if name in ('rigl', 'rigl_inverted'):
      kwargs['initial_acc_scale'] = config.initial_acc_scale
    return algorithms.get_algorithm(name, **kwargs)
  if name == 'prune':
    return algorithms.GradualPruning(
        schedule=sched, initial_sparsity=config.prune_initial_sparsity)
  return algorithms.get_algorithm(name)


def predict_update_batches(algo: algorithms.Algorithm, n_batches: int,
                           start_step: int = 0,
                           start_last_update: Optional[int] = None):
  """Batch indices at which a mask update fires — the schedule is fully
  deterministic, so snapshots can be arranged host-side without device
  syncs."""
  sched = algo.schedule
  if sched is None:
    if algo.name == 'snip':
      return {0} if start_step == 0 else set()
    if algo.name == 'dnw':
      return set(range(n_batches))
    return set()
  out = set()
  step = start_step
  last = (sched.initial_last_update_step if start_last_update is None
          else start_last_update)
  for i in range(n_batches):
    if algo.skip_apply_on_update:
      if bool(sched.is_update_iter(step, last)):
        out.add(i)
        last = step
      else:
        step += 1
    else:
      step += 1
      if bool(sched.is_update_iter(step, last)):
        out.add(i)
        last = step
  return out


def simulate_step_sequence(algo: algorithms.Algorithm, total_steps: int,
                           start_step: int = 0,
                           start_last_update: Optional[int] = None) -> int:
  """Number of batches needed to reach `total_steps` optimizer steps.

  RigL/SNIP consume a batch without advancing the step counter on update
  iterations (the reference's skipped apply_gradients); the schedule is
  fully deterministic, so we precompute the batch count host-side and keep
  the device loop sync-free.  `start_step`/`start_last_update` support
  resumption from a checkpoint mid-run.
  """
  if not (algo.skip_apply_on_update and algo.schedule is not None):
    extra = 1 if (algo.name == 'snip' and start_step == 0) else 0
    return max(total_steps - start_step, 0) + extra
  sched = algo.schedule
  step = start_step
  last = (sched.initial_last_update_step if start_last_update is None
          else start_last_update)
  batches = 0
  while step < total_steps:
    batches += 1
    if bool(sched.is_update_iter(step, last)):
      last = step
    else:
      step += 1
  return batches


class Trainer:
  """End-to-end sparse training driver."""

  def __init__(self, config: TrainConfig):
    self.config = config.resolved()
    cfg = self.config

    self.train_ds, self.eval_ds, self.data_info = datasets_lib.create_dataset(
        cfg.dataset, cfg.batch_size, cfg.eval_batch_size,
        data_dir=cfg.data_dir, seed=cfg.seed, n_synthetic=cfg.n_synthetic)
    steps_per_epoch = max(self.data_info['num_train'] / cfg.batch_size, 1.0)

    model_kwargs = dict(cfg.model_kwargs)
    model_kwargs.setdefault('num_classes', self.data_info['num_classes'])
    exec_block = None
    if cfg.block_execution:
      if not (cfg.block_width > 0 and cfg.block_height > 0):
        raise ValueError('block_execution requires block_width/block_height')
      exec_block = (cfg.block_height, cfg.block_width)
      model_kwargs['block'] = exec_block
      model_kwargs['block_bm'] = cfg.block_bm
      if cfg.block_tap_bm is not None:
        model_kwargs['block_tap_bm'] = cfg.block_tap_bm
    self._exec_block = exec_block
    self.model = registry.create_model(cfg.model, **model_kwargs)

    self.lr_fn = build_lr_fn(cfg, steps_per_epoch)
    tx = build_optimizer(cfg, self.lr_fn)
    self.algo = build_algorithm(cfg, lr_fn=self.lr_fn)

    custom_map = dict(cfg.custom_sparsity_map)
    # Depthwise kernels (MobileNet) never carry masks — reference convention.
    dense_paths = []
    if hasattr(self.model, 'dense_layer_paths'):
      dense_paths = list(self.model.dense_layer_paths())

    def mask_rule(path, leaf):
      if path in dense_paths:
        return False
      return masks_lib.default_mask_rule(path, leaf)

    block = ((cfg.block_height, cfg.block_width)
             if cfg.block_width > 0 and cfg.block_height > 0 else None)
    routing = dict(cfg.block_routing)
    if cfg.block_routing_file:
      with open(cfg.block_routing_file) as f:
        file_routing = json.load(f)
      routing = {**file_routing, **routing}
    self.sparse_training = SparseTraining(
        tx, self.algo,
        distribution=cfg.mask_init_method,
        default_sparsity=cfg.sparsity,
        custom_sparsity_map=custom_map,
        erk_power_scale=cfg.erk_power_scale,
        mask_rule=mask_rule,
        seed=cfg.seed,
        block=block,
        mask_generator=cfg.mask_type,
        block_routing=routing,
        premask_params=cfg.premask_params)

    has_dropout = cfg.model.startswith('vgg') or (
        cfg.model == 'wide_resnet'
        and cfg.model_kwargs.get('droprate', 0) > 0)

    def _make_step(update_hint=None):
      return steps.make_train_step(
          self.model, self.sparse_training,
          weight_decay=cfg.weight_decay,
          label_smoothing=cfg.label_smoothing,
          has_batch_stats=True,
          has_dropout=has_dropout,
          block=self._exec_block,
          block_conv3x3=cfg.block_conv3x3,
          block_min_sparsity=cfg.block_min_sparsity,
          update_hint=update_hint)

    self._make_step = _make_step
    self._train_step = _make_step()
    self._eval_step = steps.make_eval_step(self.model, has_batch_stats=True)

    self.mesh = None
    if jax.device_count() > 1 or cfg.n_model_shards > 1:
      self.mesh = mesh_lib.make_mesh(n_model=cfg.n_model_shards)

    self.state: Optional[TrainState] = None
    self.metrics_history: List[Dict[str, float]] = []
    self._eval_step_jit = None

  # ------------------------------------------------------------------------
  def init_state(self) -> TrainState:
    cfg = self.config
    input_shape = (cfg.batch_size,) + self.data_info['shape']
    has_surgery = bool(cfg.init_masks_from or cfg.init_params_from
                       or cfg.shuffle_loaded_masks)
    state = steps.init_train_state(
        jax.random.key(cfg.seed), self.model, self.sparse_training,
        input_shape,
        # Surgery swaps masks/params below; establish the pre-masked
        # invariant only once the FINAL masks are known, so latent init
        # values are not zeroed under the wrong mask.
        premask=False if has_surgery else None)
    if self.mesh is not None:
      state = jax.device_put(state, mesh_lib.replicated(self.mesh))
      if cfg.n_model_shards > 1:
        # Tensor parallelism: large kernels shard their output dim over
        # 'model'; masks and optimizer slots follow their params so the
        # drop/grow update runs on co-located shards.
        spec_tree = mesh_lib.param_sharding(self.mesh, state.params,
                                            shard_model_axis=True)
        params = jax.tree.map(jax.device_put, state.params, spec_tree)
        spec_by_path = masks_lib.select_masked(spec_tree, state.sparse.masks)
        masks = {p: jax.device_put(m, spec_by_path[p])
                 for p, m in state.sparse.masks.items()}
        import optax as _optax
        opt_state = _optax.tree_map_params(
            self.sparse_training.tx,
            lambda slot, spec: jax.device_put(slot, spec),
            state.opt_state, spec_tree)
        state = state.replace(params=params, opt_state=opt_state,
                              sparse=state.sparse.replace(masks=masks))
    if cfg.init_masks_from or cfg.init_params_from:
      from rigl_tpu.train.checkpoint import (
          CheckpointManager, restore_masks_only, restore_params_only,
          shuffle_masks)
      for path, surgery in ((cfg.init_masks_from, restore_masks_only),
                            (cfg.init_params_from, restore_params_only)):
        if path:
          mgr = CheckpointManager(path)
          other = mgr.restore(state)
          mgr.close()
          state = surgery(state, other)
      if cfg.shuffle_loaded_masks and state.sparse.masks:
        state = state.replace(sparse=state.sparse.replace(
            masks=shuffle_masks(jax.random.key(cfg.seed + 7),
                                state.sparse.masks)))
    if has_surgery:
      state = self._enforce_premask(state)
    self.state = state
    return state

  def _enforce_premask(self, state: TrainState) -> TrainState:
    """Re-establishes the pre-masked invariant (params AND optimizer slots
    zero at inactive positions) under the state's CURRENT masks; identity
    when already premasked or when the mode is off.

    Slots matter: a latent-mode checkpoint restored into a premask run
    carries momentum at inactive positions, and since masked grads are zero
    that stale momentum would walk 'premasked' weights off zero."""
    if not self.config.premask_params:
      return state
    inactive = masks_lib.update_masked(
        jax.tree.map(lambda w: jnp.zeros(np.shape(w), jnp.bool_),
                     state.params),
        {p: m == 0 for p, m in state.sparse.masks.items()})
    opt_state = optax.tree_map_params(
        self.sparse_training.tx,
        lambda slot, inact: jnp.where(inact, jnp.zeros_like(slot), slot),
        state.opt_state, inactive)
    return state.replace(
        params=masks_lib.apply_masks(state.params, state.sparse.masks),
        opt_state=opt_state)

  def jitted_train_step(self, step_fn=None):
    step_fn = self._train_step if step_fn is None else step_fn
    if self.mesh is None:
      return jax.jit(step_fn, donate_argnums=0)
    if self.config.n_model_shards > 1:
      # Input placements (sharded params/masks/slots + data-sharded batch)
      # drive GSPMD propagation; explicit out_shardings would force
      # resharding against the donated inputs.
      return jax.jit(step_fn, donate_argnums=0)
    repl = mesh_lib.replicated(self.mesh)
    return jax.jit(
        step_fn,
        donate_argnums=0,
        in_shardings=(repl, self._batch_sharding()),
        out_shardings=(repl, repl))

  def _batch_sharding(self):
    """Batch sharded over 'data' when divisible; replicated otherwise
    (e.g. the reference's MNIST batch 100 on an 8-device mesh — correct,
    just without data parallelism on the odd remainder-free split)."""
    n_data = self.mesh.shape['data']
    if self.config.batch_size % n_data == 0:
      return mesh_lib.batch_sharding(self.mesh)
    return mesh_lib.replicated(self.mesh)

  # ------------------------------------------------------------------------
  def train(self, total_steps: Optional[int] = None,
            progress_fn: Optional[Callable[[Dict[str, Any]], None]] = None
            ) -> Dict[str, Any]:
    cfg = self.config
    total_steps = total_steps or cfg.train_steps
    if self.state is None:
      self.init_state()
    state = self.state

    ckpt_mgr0 = None
    if cfg.checkpoint_dir and cfg.auto_resume:
      from rigl_tpu.train.checkpoint import CheckpointManager
      ckpt_mgr0 = CheckpointManager(cfg.checkpoint_dir)
      if ckpt_mgr0.latest_step() is not None:
        state = ckpt_mgr0.restore(state)
        # The checkpoint may come from a latent-mode run; re-establish the
        # pre-masked invariant (identity for premask-mode checkpoints).
        state = self._enforce_premask(state)
        self.state = state
    n_batches = simulate_step_sequence(
        self.algo, total_steps,
        start_step=int(state.sparse.step),
        start_last_update=int(state.sparse.last_update_step))

    hint_batches = None
    if cfg.static_update_steps and self.algo.name in (
        'set', 'rigl', 'rigl_inverted', 'static', 'momentum', 'prune'):
      # Two specialized programs selected by the host-side schedule
      # prediction; the cond disappears from the hot loop.
      hint_batches = predict_update_batches(
          self.algo, n_batches, start_step=int(state.sparse.step),
          start_last_update=int(state.sparse.last_update_step))
      train_step_plain = self.jitted_train_step(self._make_step(False))
      train_step_upd = self.jitted_train_step(self._make_step(True))
      train_step = train_step_plain
    else:
      train_step = self.jitted_train_step()
    sharding = (self._batch_sharding()
                if self.mesh is not None else None)
    it = pipeline.prefetch_to_device(self.train_ds.repeat(), size=2,
                                     sharding=sharding)

    writer = ckpt_mgr = None
    if cfg.checkpoint_dir:
      from rigl_tpu.train.checkpoint import CheckpointManager
      from rigl_tpu.utils.metrics import MetricsWriter
      writer = MetricsWriter(cfg.checkpoint_dir)
      ckpt_mgr = ckpt_mgr0 or CheckpointManager(cfg.checkpoint_dir)

    if not cfg.snapshot_mask_updates:
      update_batches = set()
    elif hint_batches is not None:
      update_batches = hint_batches  # same simulation, computed above
    else:
      update_batches = predict_update_batches(
          self.algo, n_batches, start_step=int(state.sparse.step),
          start_last_update=int(state.sparse.last_update_step))
    grad_norm_fn = None
    pre_mgr = post_mgr = None
    if update_batches:
      grad_norm_fn = jax.jit(steps.make_grad_norm_fn(
          self.model, self.sparse_training, cfg.weight_decay,
          cfg.label_smoothing))
      if cfg.checkpoint_dir:
        from rigl_tpu.train.checkpoint import CheckpointManager
        pre_mgr = CheckpointManager(
            os.path.join(cfg.checkpoint_dir, 'pre_update'), max_to_keep=20)
        post_mgr = CheckpointManager(
            os.path.join(cfg.checkpoint_dir, 'post_update'), max_to_keep=20)

    # Runtime guards (debug_checks): tiny device-side bools, read back only
    # at boundaries — see _run_debug_checks.
    hint_ok_buffer: List[Any] = []
    premask_ok_fn = None
    if cfg.debug_checks and cfg.premask_params:
      @jax.jit
      def premask_ok_fn(params, masks):  # noqa: F811
        sel = masks_lib.select_masked(params, masks)
        oks = [jnp.all(jnp.where(masks[p] == 0, sel[p] == 0.0, True))
               for p in masks]
        return jnp.all(jnp.stack(oks)) if oks else jnp.asarray(True)

    def _run_debug_checks(state):
      if hint_ok_buffer:
        ok = bool(jnp.all(jnp.stack(hint_ok_buffer)))
        hint_ok_buffer.clear()
        if not ok:
          raise RuntimeError(
              'static_update_steps hint mismatch: a step ran the wrong '
              'specialized program (host schedule prediction diverged from '
              'the device-evaluated schedule)')
      if premask_ok_fn is not None and state.sparse.masks:
        if not bool(premask_ok_fn(state.params, state.sparse.masks)):
          raise RuntimeError(
              'premask invariant violated: params have nonzero values at '
              'mask-inactive positions (params != params * masks)')

    # XLA's CPU in-process collectives deadlock intermittently when many
    # async-dispatched executions are in flight on an oversubscribed host:
    # each execution's all-reduce parks one worker thread per virtual
    # device at a rendezvous, the pool runs out, and the missing
    # participant aborts the process after the 40 s watchdog
    # ("Expected 8 threads to join ... only 7 arrived", rendezvous.cc).
    # On the virtual multi-device CPU platform (tests / dryruns) serialize
    # dispatch; real TPU keeps the async pipeline.
    serialize_dispatch = (jax.default_backend() == 'cpu'
                          and len(jax.devices()) > 1)

    t0 = time.time()
    last_log_t, last_log_i = t0, 0
    profiling = False
    for i in range(n_batches):
      if serialize_dispatch:
        jax.block_until_ready(state.params)
      if cfg.profile_dir:
        if i == cfg.profile_start:
          jax.profiler.start_trace(cfg.profile_dir)
          profiling = True
        elif profiling and i == cfg.profile_start + cfg.profile_steps:
          jax.block_until_ready(state.params)
          jax.profiler.stop_trace()
          profiling = False
      batch = next(it)
      is_update_batch = i in update_batches
      if is_update_batch:
        pre_norm = grad_norm_fn(state, batch)
        if pre_mgr:
          pre_mgr.save(i, state)  # keyed by batch index: unique/monotone
      if hint_batches is not None:
        train_step = train_step_upd if i in hint_batches else train_step_plain
      state, metrics = train_step(state, batch)
      # Keep self.state live: the input state's buffers are donated, and
      # progress callbacks (e.g. mask recording) read trainer.state.
      self.state = state
      if cfg.debug_checks and 'update_hint_ok' in metrics:
        hint_ok_buffer.append(metrics['update_hint_ok'])
      if is_update_batch:
        post_norm = grad_norm_fn(state, batch)
        if post_mgr:
          post_mgr.save(i, state)
        rec = {
            'mask_update_grad_norm_pre': float(pre_norm),
            'mask_update_grad_norm_post': float(post_norm),
            'mask_update_grad_norm_improvement':
                float(post_norm) - float(pre_norm),
            'step': float(state.sparse.step),
        }
        self.metrics_history.append(rec)
        if writer:
          writer.write(int(state.sparse.step), rec)
        if progress_fn:
          progress_fn(rec)
      if cfg.log_every and (i + 1) % cfg.log_every == 0:
        _run_debug_checks(state)
        m = {k: float(v) for k, v in metrics.items()}
        now = time.time()
        m['steps_per_sec'] = (i + 1 - last_log_i) / max(now - last_log_t,
                                                        1e-9)
        m['learning_rate'] = float(self.lr_fn(state.sparse.step))
        last_log_t, last_log_i = now, i + 1
        m['global_sparsity'] = (
            float(masks_lib.calculate_sparsity(state.sparse.masks))
            if state.sparse.masks else 0.0)
        self.metrics_history.append(m)
        if writer:
          writer.write(int(m['step']), m)
        if progress_fn:
          progress_fn(m)
      if (cfg.eval_every and (i + 1) % cfg.eval_every == 0):
        _run_debug_checks(state)
        em = self.evaluate(state)
        em['step'] = float(i + 1)
        self.metrics_history.append({'eval_' + k: v for k, v in em.items()})
        if writer:
          writer.write(int(em['step']), {'eval_' + k: v
                                         for k, v in em.items()})
        if progress_fn:
          progress_fn({'eval': em})
      if (ckpt_mgr and cfg.checkpoint_every
          and (i + 1) % cfg.checkpoint_every == 0):
        ckpt_mgr.save(int(state.sparse.step), state)
      if (cfg.mask_image_every and cfg.checkpoint_dir
          and (i + 1) % cfg.mask_image_every == 0 and state.sparse.masks):
        from rigl_tpu.utils.metrics import write_mask_images
        write_mask_images(cfg.checkpoint_dir, int(state.sparse.step),
                          state.sparse.masks)

    if profiling:
      jax.block_until_ready(state.params)
      jax.profiler.stop_trace()
    if cfg.debug_checks:
      _run_debug_checks(state)
    self.state = state
    if ckpt_mgr:
      ckpt_mgr.save(int(state.sparse.step), state, force=True)
      ckpt_mgr.close()
    if writer:
      writer.close()
    wall = time.time() - t0
    final_eval = self.evaluate(state)
    result = {
        'train_steps': total_steps,
        'batches': n_batches,
        'wall_time_s': wall,
        'steps_per_sec': n_batches / max(wall, 1e-9),
        'final_loss': next(
            (float(m['loss']) for m in reversed(self.metrics_history)
             if 'loss' in m), None),
        **{f'eval_{k}': v for k, v in final_eval.items()},
    }
    if state.sparse.masks:
      result['global_sparsity'] = float(
          masks_lib.calculate_sparsity(state.sparse.masks))
    return result

  # ------------------------------------------------------------------------
  def evaluate(self, state: Optional[TrainState] = None) -> Dict[str, float]:
    state = state if state is not None else self.state
    if self._eval_step_jit is None:
      self._eval_step_jit = jax.jit(self._eval_step)
    eval_step = self._eval_step_jit
    totals: Dict[str, float] = {}
    count = 0.0
    for batch in self.eval_ds.epoch():
      m = eval_step(state, jax.device_put(batch))
      bs = float(m['count'])
      for k in ('loss', 'top_1', 'top_5'):
        totals[k] = totals.get(k, 0.0) + float(m[k]) * bs
      count += bs
    return {k: v / max(count, 1.0) for k, v in totals.items()}
