"""The sparse-training state machine: one function, fully jit-traceable.

This replaces the reference's three separate implementations (TF1 wrapper
optimizers in rigl/sparse_optimizers*.py, TF2 eager MaskUpdaters in
rigl_tf2/mask_updaters.py, and the prune-only flax branch) with a single
functional core that composes with any optax optimizer and runs as one
compiled XLA program: the conditional mask update is a ``lax.cond`` whose
branches have identical shapes (full-size top_k), so the whole train step —
hot path and amortized update path — is a single TPU executable.

Key TPU-native simplification: the trainer differentiates the loss w.r.t. the
*effective* (masked) parameters, so a single backward pass yields dense
gradients; masked gradients are an elementwise multiply away.  The reference
needed two ``compute_gradients`` calls (sparse_optimizers_base.py:478-485).

Replica determinism: mask updates use RNG keyed on (seed, step, layer index)
via ``jax.random.fold_in``, the analogue of the reference's stateless ops
keyed on (hash(name)+offset, global_step) (sparse_optimizers_base.py:402-418).
Grow-score gradients are identical across data-parallel replicas because they
come out of jit's automatic gradient reduction over the sharded batch —
no explicit ``cross_replica_sum`` needed (reference: :471-476).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from rigl_tpu.sparsity import distributions
from rigl_tpu.sparsity import masks as masks_lib
from rigl_tpu.sparsity import update as update_lib
from rigl_tpu.transforms import algorithms

MaskDict = Dict[str, jnp.ndarray]
PyTree = Any


class SparseState(flax.struct.PyTreeNode):
  """Dynamic sparse-training state carried through the train loop.

  `step` follows the reference's global_step semantics: it advances only when
  a gradient step is applied.  For RigL/SNIP, update iterations consume a
  batch without advancing `step` (sparse_optimizers_base.py:487-521).
  """
  masks: MaskDict
  step: jnp.ndarray
  last_update_step: jnp.ndarray
  is_snipped: jnp.ndarray
  ema_grads: Optional[MaskDict] = None
  initial_weights: Optional[MaskDict] = None
  # Per-layer block-execution descriptors derived from `masks` — cached
  # here because they only change when masks change (amortized over the
  # update frequency), while the execution path reads them every step.
  # {path: {'cols', 'rows'} flat packing (static count) or occupancy}.
  block_packs: Optional[Dict[str, Any]] = None


class SparseTraining:
  """Couples an optax optimizer with a sparse-training algorithm.

  Usage:
    st = SparseTraining(optax.sgd(lr, momentum=0.9), algorithms.RigL(...))
    opt_state, sstate = st.init(key, params)
    ...
    eff = masks_lib.apply_masks(params, sstate.masks)
    grads = jax.grad(lambda p: loss(p, batch))(eff)   # dense at masked leaves
    params, opt_state, sstate, metrics = st.step(params, opt_state, sstate,
                                                 grads)
  """

  def __init__(
      self,
      tx: optax.GradientTransformation,
      algo: algorithms.Algorithm,
      distribution: str = 'erdos_renyi_kernel',
      default_sparsity: float = 0.8,
      custom_sparsity_map: Optional[Mapping[str, float]] = None,
      erk_power_scale: float = distributions.DEFAULT_ERK_SCALE,
      mask_rule=masks_lib.default_mask_rule,
      seed: int = 0,
      mask_dtype=jnp.float32,
      block: Optional[Tuple[int, int]] = None,
      mask_generator: Optional[str] = None,
      block_routing: Optional[Mapping[str, str]] = None,
      premask_params: bool = False,
  ):
    self.tx = tx
    self.algo = algo
    self.distribution = distribution
    self.default_sparsity = default_sparsity
    self.custom_sparsity_map = dict(custom_sparsity_map or {})
    self.erk_power_scale = erk_power_scale
    self.mask_rule = mask_rule
    self.seed = seed
    self.mask_dtype = mask_dtype
    # Block-granular sparsity: masks constant over (block_rows x block_cols)
    # blocks of the 2D matmul view, enabling the block-sparse Pallas kernels
    # (the reference reserved block_width/height flags for this,
    # imagenet_train_eval.py:271-272, but never implemented them).  Layers
    # whose 2D view the block does not divide stay element-granular.
    self.block = block
    # Structured init: 'per_neuron', 'symmetric',
    # 'per_neuron_no_input_ablation', ... (sparsity/generators.py registry);
    # None = plain exact-count random masks.
    self.mask_generator = mask_generator
    # Measured per-layer execution routing: {mask path: 'dense'|'tap'|
    # 'matmul'}.  Overrides the default heuristics in _compute_packs for
    # listed layers ('dense' = keep XLA conv with masked weights; 'tap' =
    # shift-and-matmul conv kernel; 'matmul' = 1x1/2D block-skipping matmul
    # kernels).  Produced by scripts/bench_layer_routing.py, which times
    # each candidate on the target hardware at the layer's real shape and
    # density — routing by measurement, not eligibility (PERF.md: heuristic
    # routing regressed e2e step time on every attempt).
    self.block_routing = dict(block_routing or {})
    # Pre-masked parameter storage: weights are zeroed at inactive
    # positions at init and kept zero by the masked training gradients, so
    # the hot path's forward uses `params` DIRECTLY — the per-step
    # apply_masks multiply (a full read+write of the parameter set)
    # disappears.  Valid exactly for the drop/grow family (+ scratch):
    # masked positions get zero training gradient (momentum/decay terms
    # stay zero), drop/grow zeroes dropped weights at update time, and
    # grown connections are (re)initialized by grow_init — so effective
    # weights match the latent-weight representation step for step.
    # Rejected for prune/dnw/snip, whose re-masking scores the reference's
    # *frozen latent* values (model_pruning keeps masked weights).
    self.premask_params = premask_params
    if premask_params and algo.name in ('prune', 'dnw', 'snip'):
      raise ValueError(
          f'premask_params changes {algo.name} semantics: its re-masking '
          'scores frozen latent weights, which pre-masking zeroes')
    if premask_params and getattr(algo, 'grow_init', 'zeros').startswith(
        'random_'):
      raise ValueError(
          f'premask_params changes grow_init={algo.grow_init} semantics: '
          'its scale statistics (std/mean|w|) are taken over the full '
          'tensor, which pre-masking zeroes at inactive positions')
    # Per-layer sparsity targets + shapes, filled by init() (host-side).
    self.sparsities: Dict[str, float] = {}
    self.layer_shapes: Dict[str, Tuple[int, ...]] = {}

  def _layer_block(self, shape) -> Optional[Tuple[int, int]]:
    if self.block is None:
      return None
    from rigl_tpu.ops.block_mask import block_shape_for, is_tap_layer
    shape = tuple(shape)
    if len(shape) == 4 and shape[:2] != (1, 1):
      # Spatial convs: per-tap block granularity (ops/block_mask.py).
      return self.block if is_tap_layer(shape, self.block) else None
    rows, cols = block_shape_for(shape, self.block)
    br, bc = self.block
    if rows % br == 0 and cols % bc == 0:
      return self.block
    return None

  def _n_blocks(self, shape) -> int:
    """Total block cells of a block-eligible layer."""
    from rigl_tpu.ops.block_mask import block_shape_for, is_tap_layer
    br, bc = self.block
    shape = tuple(shape)
    if is_tap_layer(shape, self.block):
      kh, kw, cin, cout = shape
      return kh * kw * (cin // br) * (cout // bc)
    rows, cols = block_shape_for(shape, self.block)
    return (rows // br) * (cols // bc)

  # ------------------------------------------------------------------ init --
  def init(self, key: jax.Array, params: PyTree
           ) -> Tuple[optax.OptState, SparseState]:
    """Builds the optimizer state and the initial mask set."""
    algo = self.algo
    shapes = masks_lib.mask_shapes(params, self.mask_rule)
    self.layer_shapes = dict(shapes)
    if algo.name == 'none':
      # Dense baseline: no masks at all.
      self.sparsities = {}
      mask_dict: MaskDict = {}
    else:
      self.sparsities = distributions.get_sparsities(
          shapes, self.distribution, self.default_sparsity,
          self.custom_sparsity_map, erk_power_scale=self.erk_power_scale)
      if algo.name == 'snip':
        # SNIP starts dense and prunes by saliency at step 0
        # (sparse_optimizers_test contract: masks are initially all-ones).
        mask_dict = {
            p: jnp.ones(s, self.mask_dtype) for p, s in shapes.items()
        }
      elif algo.name == 'prune':
        # Gradual pruning starts at initial_sparsity (usually 0).
        mask_dict = {}
        for i, (p, s) in enumerate(shapes.items()):
          mask_dict[p] = masks_lib.random_mask(
              jax.random.fold_in(key, i), s, algo.initial_sparsity,
              self.mask_dtype)
      elif self.mask_generator is not None:
        from rigl_tpu.sparsity import generators
        mask_dict = {}
        for i, (p, s) in enumerate(shapes.items()):
          layer = generators.generate_mask(
              self.mask_generator, jax.random.fold_in(key, i), {p: s},
              self.sparsities[p], self.mask_dtype)
          mask_dict[p] = layer[p]
      else:
        mask_dict = {}
        for i, (p, s) in enumerate(shapes.items()):
          blk = self._layer_block(s)
          if blk is not None:
            from rigl_tpu.ops.block_mask import random_block_mask
            mask_dict[p] = random_block_mask(
                jax.random.fold_in(key, i), s, self.sparsities[p], blk,
                self.mask_dtype)
          else:
            mask_dict[p] = masks_lib.random_mask(
                jax.random.fold_in(key, i), s, self.sparsities[p],
                self.mask_dtype)

    ema = None
    if algo.needs_ema:
      ema = {p: jnp.zeros(s, jnp.float32) for p, s in shapes.items()
             if p in mask_dict}
    initial_weights = None
    if algo.grow_init.startswith('initial_dist'):
      initial_weights = {
          p: v for p, v in masks_lib.select_masked(params, mask_dict).items()
      }

    sstate = SparseState(
        masks=mask_dict,
        step=jnp.zeros((), jnp.int32),
        last_update_step=jnp.full(
            (), algo.schedule.initial_last_update_step
            if algo.schedule else 0, jnp.int32),
        is_snipped=jnp.zeros((), jnp.bool_),
        ema_grads=ema,
        initial_weights=initial_weights,
        block_packs=self._compute_packs(mask_dict),
    )
    return self.tx.init(params), sstate

  def _compute_packs(self, masks: MaskDict) -> Optional[Dict[str, Any]]:
    """Block-execution descriptors for every block-divisible layer.

    Must be recomputed whenever masks change (init + every mask-mutating
    branch of step()); the train step serves them to the model's
    'block_masks' collection without touching the full masks.
    """
    if self.block is None or not masks:
      return None
    from rigl_tpu.ops.block_mask import pool_to_blocks, pool_to_tap_blocks
    counts = self.static_block_counts()
    packs: Dict[str, Any] = {}
    for p, m in masks.items():
      if self._layer_block(m.shape) is None:
        continue
      choice = self.block_routing.get(p)
      if choice == 'dense':
        continue  # measured loser: no pack -> XLA conv on masked weights
      if len(m.shape) == 4 and p in counts and choice != 'matmul':
        # Conv layers (1x1 and spatial) execute on the tap kernel, whose
        # grid is sized by the static active count.  1x1 kernels are the
        # T=1 degenerate case (no shifts, ops/pallas/block_sparse_conv.py
        # fast path); spatial kernels without an invariant count stay
        # dense-executed, 1x1s fall through to the occupancy (v3) form.
        from rigl_tpu.ops.pallas.block_sparse_conv import pack_tap_active
        occ3 = (pool_to_tap_blocks(m.astype(jnp.float32), self.block,
                                   'max') > 0).astype(jnp.int32)
        cols, rows, taps = pack_tap_active(occ3, counts[p])
        packs[p] = {'cols': cols, 'rows': rows, 'taps': taps}
        continue
      if len(m.shape) == 4 and tuple(m.shape[:2]) != (1, 1):
        continue  # spatial conv routed 'matmul' / without static count
      occ = (pool_to_blocks(m.astype(jnp.float32), self.block, 'max')
             > 0).astype(jnp.int32)
      if p in counts:
        from rigl_tpu.ops.pallas.block_sparse_v4 import pack_flat_active
        cols, rows = pack_flat_active(occ, counts[p])
        packs[p] = {'cols': cols, 'rows': rows}
      else:
        packs[p] = occ
    return packs or None

  def static_block_counts(self) -> Dict[str, int]:
    """Per-layer active-block counts that are invariant through training.

    The drop/grow kernel removes exactly ``floor(drop_fraction * n_ones)``
    blocks and grows the same number (floor arithmetic, disjoint sets), so
    for block-granular masks under the drop/grow family the active count
    never changes — it is a compile-time constant, which lets the v4
    flat-packed kernel size its grid by it
    (ops/pallas/block_sparse_v4.py).  Empty for configurations where the
    invariant does not hold (element masks, structured generators,
    count-changing algorithms like gradual pruning / SNIP / DNW).
    """
    if self.block is None or self.mask_generator is not None:
      return {}
    if self.algo.name not in ('set', 'rigl', 'rigl_inverted', 'static',
                              'scratch'):
      return {}
    out: Dict[str, int] = {}
    for p, shape in self.layer_shapes.items():
      if self._layer_block(shape) is None:
        continue
      n_blocks = self._n_blocks(shape)
      n_zeros = distributions.get_n_zeros(n_blocks, self.sparsities[p])
      out[p] = n_blocks - n_zeros
    return out

  # ------------------------------------------------------------- internals --
  def _layer_key(self, step: jnp.ndarray, layer_idx: int, tag: int
                 ) -> jax.Array:
    key = jax.random.fold_in(jax.random.key(self.seed), step)
    return jax.random.fold_in(jax.random.fold_in(key, layer_idx), tag)

  def _apply(self, grads: PyTree, params: PyTree, opt_state: optax.OptState
             ) -> Tuple[PyTree, optax.OptState]:
    updates, new_opt_state = self.tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), new_opt_state

  def _drop_noise(self, step, layer_idx: int, path: str, mask, w):
    """Tie-breaking noise added to the |mask*w| drop score
    (sparse_optimizers_base.py:264-270).  A seam: the golden-trajectory
    replay overrides this (and _grow_score) to inject the reference's
    recorded stateless draws."""
    return (jax.random.normal(self._layer_key(step, layer_idx, 0), mask.shape)
            * self.algo.noise_std)

  def _grow_score(self, algo: algorithms.Algorithm, path: str, mask, weights,
                  dense_grad, ema_grad, key) -> jnp.ndarray:
    name = algo.name
    if name == 'set':
      return jax.random.uniform(key, mask.shape)
    if name == 'rigl':
      return jnp.abs(dense_grad)
    if name == 'rigl_inverted':
      return -jnp.abs(dense_grad)
    if name == 'static':
      return mask.astype(jnp.float32)
    if name == 'momentum':
      return jnp.abs(ema_grad)
    raise ValueError(f'{name} has no drop/grow update')

  def _drop_grow_all(self, params: PyTree, opt_state: optax.OptState,
                     sstate: SparseState, dense_grads: PyTree,
                     drop_fraction: jnp.ndarray,
                     ema: Optional[MaskDict]) -> Tuple[PyTree, optax.OptState,
                                                       MaskDict]:
    """Runs the drop/grow kernel on every masked layer + resets slots."""
    algo = self.algo
    masks = sstate.masks
    w_sel = masks_lib.select_masked(params, masks)
    g_sel = masks_lib.select_masked(dense_grads, masks)
    step = sstate.step

    new_masks: MaskDict = {}
    new_weights: MaskDict = {}
    new_conn: MaskDict = {}
    reset_vals: MaskDict = {}
    for i, path in enumerate(masks):
      mask, w, g = masks[path], w_sel[path], g_sel[path]
      noise = self._drop_noise(step, i, path, mask, w)
      score_drop = jnp.abs(mask.astype(w.dtype) * w) + noise
      score_grow = self._grow_score(
          algo, path, mask, w, g, None if ema is None else ema[path],
          self._layer_key(step, i, 1))
      grow_tensor = update_lib.grow_init_tensor(
          algo.grow_init, self._layer_key(step, i, 2), w,
          masked_grad=g,
          initial_weights=(None if sstate.initial_weights is None
                           else sstate.initial_weights[path]))
      blk = self._layer_block(mask.shape)
      if blk is not None:
        from rigl_tpu.ops.block_mask import blockwise_drop_grow
        res = blockwise_drop_grow(
            mask, w, score_drop, score_grow, drop_fraction, blk,
            grow_tensor=grow_tensor, reinit_when_same=algo.reinit_when_same)
      else:
        res = update_lib.drop_grow_update(
            mask, w, score_drop, score_grow, drop_fraction,
            grow_tensor=grow_tensor, reinit_when_same=algo.reinit_when_same)
      new_masks[path] = res.mask
      # Momentum of grown connections: zero, or scaled dense gradient
      # (sparse_optimizers_base.py:555-564).
      if self.premask_params:
        # Pre-masked storage: zero dropped connections' weights AND their
        # optimizer slots (stale momentum would otherwise walk them off
        # zero despite zero gradients).  The reference keeps latent values
        # and slots, but both are invisible to effective behavior in the
        # drop/grow family — regrown connections are re-initialized by
        # grow_init and drop scores read |mask * w| — so trajectories of
        # the effective weights agree (tested).
        dropped = (mask > 0) & (res.mask == 0)
        new_weights[path] = res.weights * res.mask.astype(res.weights.dtype)
        new_conn[path] = res.new_connections | dropped
        reset_vals[path] = jnp.where(dropped, 0.0,
                                     g * algo.initial_acc_scale)
      else:
        new_weights[path] = res.weights
        new_conn[path] = res.new_connections
        reset_vals[path] = g * algo.initial_acc_scale

    new_params = masks_lib.update_masked(params, new_weights)
    conn_tree = masks_lib.update_masked(
        jax.tree.map(lambda w: jnp.zeros(np.shape(w), jnp.bool_), params),
        new_conn)
    reset_tree = masks_lib.update_masked(
        jax.tree.map(jnp.zeros_like, params), reset_vals)
    new_opt_state = optax.tree_map_params(
        self.tx,
        lambda slot, conn, val: jnp.where(conn, val.astype(slot.dtype), slot),
        opt_state, conn_tree, reset_tree)
    return new_params, new_opt_state, new_masks

  def _remask_by_score(self, scores: MaskDict, old_masks: MaskDict
                       ) -> MaskDict:
    """Per-layer top-k remask at the configured sparsity targets."""
    out: MaskDict = {}
    for path, score in scores.items():
      out[path] = update_lib.prune_to_sparsity(
          score, self.sparsities[path], self.mask_dtype)
    return out

  def one_shot_prune(self, params: PyTree, sstate: SparseState,
                     pruning_rate=None) -> SparseState:
    """Magnitude-prunes masks to the target rate in one shot.

    Parity with the eager MaskUpdater.prune (rigl_tf2/mask_updaters.py:
    296-298) and the JAX branch's pruning.prune (experimental/jax/pruning/
    pruning.py:31-94): per layer, keep the largest |mask * w|;
    `pruning_rate` is a float for all layers or a {path: rate} dict;
    defaults to the configured per-layer sparsities.
    """
    masks = sstate.masks
    w_sel = masks_lib.select_masked(params, masks)
    new_masks: MaskDict = {}
    for path, mask in masks.items():
      if pruning_rate is None:
        rate = self.sparsities[path]
      elif isinstance(pruning_rate, dict):
        rate = pruning_rate.get(path, 0.0)
      else:
        rate = float(pruning_rate)
      score = jnp.abs(mask.astype(jnp.float32) * w_sel[path])
      new_masks[path] = update_lib.prune_to_sparsity(score, rate,
                                                     self.mask_dtype)
    return sstate.replace(masks=new_masks)

  # ------------------------------------------------------------------ step --
  def predict_update_iters(self, n_steps: int, start_step: int = 0,
                           start_last: Optional[int] = None):
    """Host-side simulation of the update schedule: which of the next
    `n_steps` iterations are mask-update iterations.

    The schedule is fully deterministic in (step, last_update_step), so the
    host can predict every update iteration and select between two
    *specialized* compiled programs (``step(update_hint=False/True)``)
    instead of paying for a ``lax.cond`` that carries the whole drop/grow
    machinery on every iteration (~2% of a ResNet-50 step on TPU even when
    not taken, PERF.md).  Mirrors the reference's deterministic
    `is_mask_update_iter` gating (sparse_optimizers_base.py:198-230).

    MAINTENANCE CONTRACT: this function is a HOST-SIDE MIRROR of step()'s
    device-side gating.  Any new algorithm added to step() — or any change
    to an existing algorithm's step/gating semantics (skip-apply vs
    post-increment, snip one-shot, dnw every-step) — MUST extend the
    branch logic below in lockstep, or callers using hints silently train
    a different schedule.  Defenses if you get it wrong: step() emits
    metrics['update_hint_ok'] (the true device-side schedule value
    compared against the hint — the Trainer loop accumulates it and fails
    loudly under debug_checks), and the golden trajectory suite
    (tests/test_golden_trajectories.py) replays every algorithm's step
    accounting bit-exactly against reference-executed traces.

    Returns a list of bools; also usable for snapshot scheduling.
    """
    algo = self.algo
    sched = getattr(algo, 'schedule', None)
    if algo.name == 'snip':
      return [start_step == 0] + [False] * (n_steps - 1)
    if sched is None or algo.name in ('none', 'scratch', 'dnw'):
      return [algo.name == 'dnw'] * n_steps
    step = start_step
    last = (start_last if start_last is not None
            else int(sched.initial_last_update_step))
    out = []
    for _ in range(n_steps):
      if algo.name == 'prune' or not algo.skip_apply_on_update:
        # Post-increment gating: apply always, update fires after.
        step += 1
        upd = bool(sched.is_update_iter(np.int32(step), np.int32(last)))
        if upd:
          last = step
      else:
        # RigL semantics: update replaces the apply; step does not advance.
        upd = bool(sched.is_update_iter(np.int32(step), np.int32(last)))
        if upd:
          last = step
        else:
          step += 1
      out.append(upd)
    return out

  def step(self, params: PyTree, opt_state: optax.OptState,
           sstate: SparseState, dense_grads: PyTree,
           grow_grads_fn=None, update_hint: Optional[bool] = None
           ) -> Tuple[PyTree, optax.OptState, SparseState, Dict[str, Any]]:
    """One training iteration: gradient application and/or mask update.

    `dense_grads` must be the gradient of the loss w.r.t. the *effective*
    (masked) parameters — dense at masked leaves.

    `grow_grads_fn` (optional): params -> dense grads used for *grow scores
    only*, evaluated lazily inside the mask-update branch — the rigl_tf2
    convention of scoring regrowth on a held-out validation batch
    (mask_updaters.py:185-192).  Costs nothing on non-update iterations.

    `update_hint` (optional): host-side static knowledge of whether this
    iteration is a mask-update iteration (see `predict_update_iters`).
    With False/True the schedule ``lax.cond`` is resolved at trace time —
    two small specialized programs instead of one carrying both branches.
    Supported for the drop/grow family and gradual pruning; other
    algorithms ignore it.  The caller owns the prediction; a wrong hint
    diverges from the reference semantics (asserted in tests, and
    `metrics['mask_updated']` always reports the *true* schedule value).
    """
    algo = self.algo
    masks = sstate.masks

    if algo.dense_gradients:
      train_grads = dense_grads
    else:
      train_grads = masks_lib.mask_grads(dense_grads, masks)

    # SNFS: EMA of dense gradients advances every step, before apply
    # (sparse_optimizers.py:195-197).
    ema = sstate.ema_grads
    if algo.needs_ema:
      g_sel = masks_lib.select_masked(dense_grads, masks)
      m = algo.momentum
      ema = {p: m * ema[p] + (1.0 - m) * g_sel[p] for p in ema}

    metrics: Dict[str, Any] = {}

    if algo.name in ('none', 'scratch'):
      new_params, new_opt_state = self._apply(train_grads, params, opt_state)
      new_sstate = sstate.replace(step=sstate.step + 1)
      metrics['mask_updated'] = jnp.zeros((), jnp.bool_)
      return new_params, new_opt_state, new_sstate, metrics

    if algo.name == 'snip':
      do_snip = (sstate.step == 0) & (~sstate.is_snipped)

      def snip_branch(params, opt_state):
        w_sel = masks_lib.select_masked(params, masks)
        g_sel = masks_lib.select_masked(dense_grads, masks)
        saliency = {p: jnp.abs(g_sel[p] * w_sel[p]) for p in masks}
        new_masks = self._remask_by_score(saliency, masks)
        return (params, opt_state, new_masks, self._compute_packs(new_masks),
                sstate.step, jnp.ones((), jnp.bool_))

      def apply_branch(params, opt_state):
        new_params, new_opt_state = self._apply(train_grads, params, opt_state)
        return (new_params, new_opt_state, masks, sstate.block_packs,
                sstate.step + 1, sstate.is_snipped)

      # The snip is a one-time host-predictable event (step 0, not yet
      # snipped), so update_hint specializes here exactly like the
      # drop/grow family — and keeps the eager/XLA arithmetic of the apply
      # path un-fused with the snip branch (lax.cond compiles both into
      # one computation, where mul+add contracts to FMA).
      if update_hint is None:
        (new_params, new_opt_state, new_masks, new_packs, new_step,
         snipped) = jax.lax.cond(do_snip, snip_branch, apply_branch, params,
                                 opt_state)
      elif update_hint:
        (new_params, new_opt_state, new_masks, new_packs, new_step,
         snipped) = snip_branch(params, opt_state)
      else:
        (new_params, new_opt_state, new_masks, new_packs, new_step,
         snipped) = apply_branch(params, opt_state)
      new_sstate = sstate.replace(masks=new_masks, step=new_step,
                                  is_snipped=snipped, block_packs=new_packs)
      metrics['mask_updated'] = do_snip
      if update_hint is not None:
        metrics['update_hint_ok'] = do_snip == update_hint
      return new_params, new_opt_state, new_sstate, metrics

    if algo.name == 'dnw':
      # Dense gradient step, then re-mask by |w| every iteration
      # (sparse_optimizers.py:408-471).
      new_params, new_opt_state = self._apply(train_grads, params, opt_state)
      w_sel = masks_lib.select_masked(new_params, masks)
      new_masks = self._remask_by_score(
          {p: jnp.abs(w) for p, w in w_sel.items()}, masks)
      new_sstate = sstate.replace(masks=new_masks, step=sstate.step + 1,
                                  block_packs=self._compute_packs(new_masks))
      metrics['mask_updated'] = jnp.ones((), jnp.bool_)
      return new_params, new_opt_state, new_sstate, metrics

    if algo.name == 'prune':
      # Gradient step always; magnitude prune on the polynomial schedule.
      sched = algo.schedule
      new_params, new_opt_state = self._apply(train_grads, params, opt_state)
      step_after = sstate.step + 1
      is_update = sched.is_update_iter(step_after, sstate.last_update_step)
      t = jnp.clip(
          (step_after - sched.begin_step)
          / jnp.maximum(sched.end_step - sched.begin_step, 1),
          0.0, 1.0).astype(jnp.float32)

      def prune_branch(args):
        params_in, masks_in = args
        w_sel = masks_lib.select_masked(params_in, masks_in)
        out: MaskDict = {}
        for path, w in w_sel.items():
          final_s = self.sparsities[path]
          s_t = final_s + (algo.initial_sparsity - final_s) * (
              (1.0 - t) ** algo.power)
          n_total = int(np.prod(w.shape))
          n_keep = jnp.round((1.0 - s_t) * n_total).astype(jnp.int32)
          out[path] = update_lib.topk_mask_from_scores(
              jnp.abs(w), n_keep, self.mask_dtype).reshape(w.shape)
        return out, self._compute_packs(out), step_after

      def no_prune_branch(args):
        _, masks_in = args
        return masks_in, sstate.block_packs, sstate.last_update_step

      if update_hint is None:
        new_masks, new_packs, new_last = jax.lax.cond(
            is_update, prune_branch, no_prune_branch, (new_params, masks))
      elif update_hint:
        new_masks, new_packs, new_last = prune_branch((new_params, masks))
      else:
        new_masks, new_packs, new_last = no_prune_branch((new_params, masks))
      new_sstate = sstate.replace(masks=new_masks, step=step_after,
                                  last_update_step=new_last,
                                  block_packs=new_packs)
      metrics['mask_updated'] = is_update
      if update_hint is not None:
        # Device-side guard: the hint is a trace-time constant, is_update
        # the true schedule value — a wrong hint silently diverges, so the
        # trainer accumulates this bit and fails loudly (Trainer loop).
        metrics['update_hint_ok'] = is_update == update_hint
      return new_params, new_opt_state, new_sstate, metrics

    # --- drop/grow family: SET / RigL / RigLInverted / Static / SNFS -------
    sched = algo.schedule

    if algo.skip_apply_on_update:
      # RigL semantics: the mask update *replaces* the gradient step and the
      # step counter does not advance (sparse_optimizers_base.py:487-521).
      is_update = sched.is_update_iter(sstate.step, sstate.last_update_step)
      drop_fraction = sched.get_drop_fraction(sstate.step)

      def update_branch(params, opt_state):
        score_grads = (grow_grads_fn(params) if grow_grads_fn is not None
                       else dense_grads)
        p, os, m = self._drop_grow_all(params, opt_state, sstate, score_grads,
                                       drop_fraction, ema)
        return p, os, m, self._compute_packs(m), sstate.step, sstate.step

      def apply_branch(params, opt_state):
        new_params, new_opt_state = self._apply(train_grads, params, opt_state)
        return (new_params, new_opt_state, masks, sstate.block_packs,
                sstate.step + 1, sstate.last_update_step)

      if update_hint is None:
        (new_params, new_opt_state, new_masks, new_packs, new_step,
         new_last) = jax.lax.cond(
            is_update, update_branch, apply_branch, params, opt_state)
      elif update_hint:
        (new_params, new_opt_state, new_masks, new_packs, new_step,
         new_last) = update_branch(params, opt_state)
      else:
        (new_params, new_opt_state, new_masks, new_packs, new_step,
         new_last) = apply_branch(params, opt_state)
    else:
      # SET-family semantics: gradient step always applies; the mask update
      # additionally fires afterwards, gated on the *post-increment* step
      # (sparse_optimizers_base.py:118-146).
      new_params, new_opt_state = self._apply(train_grads, params, opt_state)
      new_step = sstate.step + 1
      is_update = sched.is_update_iter(new_step, sstate.last_update_step)
      drop_fraction = sched.get_drop_fraction(new_step)

      def update_branch(params, opt_state):
        score_grads = (grow_grads_fn(params) if grow_grads_fn is not None
                       else dense_grads)
        p, os, m = self._drop_grow_all(
            params, opt_state, sstate.replace(step=new_step), score_grads,
            drop_fraction, ema)
        return p, os, m, self._compute_packs(m), new_step

      def no_update_branch(params, opt_state):
        return (params, opt_state, masks, sstate.block_packs,
                sstate.last_update_step)

      if update_hint is None:
        (new_params, new_opt_state, new_masks, new_packs,
         new_last) = jax.lax.cond(
            is_update, update_branch, no_update_branch, new_params,
            new_opt_state)
      elif update_hint:
        (new_params, new_opt_state, new_masks, new_packs,
         new_last) = update_branch(new_params, new_opt_state)
      else:
        (new_params, new_opt_state, new_masks, new_packs,
         new_last) = no_update_branch(new_params, new_opt_state)

    new_sstate = sstate.replace(masks=new_masks, step=new_step,
                                last_update_step=new_last, ema_grads=ema,
                                block_packs=new_packs)
    metrics['mask_updated'] = is_update
    metrics['drop_fraction'] = drop_fraction
    if update_hint is not None:
      # Device-side guard: the hint is a trace-time constant, is_update the
      # true schedule value — a wrong hint silently diverges, so the
      # trainer accumulates this bit and fails loudly (Trainer loop).
      metrics['update_hint_ok'] = is_update == update_hint
    return new_params, new_opt_state, new_sstate, metrics
