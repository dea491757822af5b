"""Jitted train/eval steps.

The whole iteration — forward, backward, optimizer, and the conditional mask
update — is ONE jitted function, so on TPU it is a single XLA executable with
the mask-update branch compiled in as a ``lax.cond`` (the reference reached
the same shape with TF's in-graph cond, imagenet call stack in SURVEY.md
§3.1).  Under a sharded-batch jit, gradient reduction over the data axis is
inserted automatically by XLA (GSPMD) — this also covers the reference's
explicit ``cross_replica_sum`` of RigL grow-score gradients
(sparse_optimizers_base.py:471-476), since the same reduced gradient feeds
both the optimizer and the grow scores.

Loss: label-smoothed softmax cross-entropy + L2 on the *effective* (masked)
kernels (imagenet_train_eval.py:573-584).  Because the backward pass is taken
w.r.t. effective params, L2 decay acts only on active connections; inactive
weights are never read, so dynamics are unchanged.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from rigl_tpu.sparsity import masks as masks_lib
from rigl_tpu.train.train_state import TrainState
from rigl_tpu.transforms.sparse_training import SparseTraining


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                       label_smoothing: float = 0.0) -> jnp.ndarray:
  """Mean softmax CE with optional label smoothing; labels are int class ids."""
  num_classes = logits.shape[-1]
  onehot = jax.nn.one_hot(labels, num_classes)
  if label_smoothing > 0:
    onehot = (onehot * (1.0 - label_smoothing)
              + label_smoothing / num_classes)
  return optax.softmax_cross_entropy(logits.astype(jnp.float32),
                                     onehot).mean()


def l2_regularization(params: Any, weight_decay: float) -> jnp.ndarray:
  """L2 on kernels/biases, excluding normalization params (the reference
  filters out 'batch_normalization' variables, imagenet_train_eval.py:582)."""
  if weight_decay == 0.0:
    return jnp.zeros((), jnp.float32)
  total = jnp.zeros((), jnp.float32)
  for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
    p = masks_lib.path_str(path)
    name = p.rsplit('/', 1)[-1]
    parent = p.lower()
    if name in ('scale',) or 'bn' in parent.split('/')[-2:][0].lower():
      continue
    if name == 'bias' and ('bn' in parent or 'norm' in parent):
      continue
    total = total + jnp.sum(jnp.square(leaf.astype(jnp.float32)))
  return weight_decay * total


def make_train_step(
    model,
    st: SparseTraining,
    weight_decay: float = 0.0,
    label_smoothing: float = 0.0,
    has_batch_stats: bool = True,
    has_dropout: bool = False,
    grow_batch: Optional[Dict[str, jnp.ndarray]] = None,
    block: Optional[Tuple[int, int]] = None,
    block_conv3x3: bool = False,
    block_min_sparsity: float = 0.0,
    update_hint: Optional[bool] = None,
) -> Callable[[TrainState, Dict[str, jnp.ndarray]],
              Tuple[TrainState, Dict[str, jnp.ndarray]]]:
  """Builds the fused train step for `model` + sparse-training config `st`.

  `grow_batch`: optional held-out batch whose dense gradients provide the
  grow scores at mask-update steps (rigl_tf2/mask_updaters.py:185-192);
  evaluated only inside the update branch.

  `block`: enables block-sparse *execution* — the hot forward/backward run
  eligible layers through the block-skipping Pallas matmul, fed by a
  'block_masks' collection derived from the live masks each step.  Must
  match the model's `block` field and SparseTraining's `block` (mask
  granularity).  The kernel's backward only produces gradients at active
  blocks, so gradient-scored regrowth (RigL) automatically recomputes
  *dense* grow gradients through the standard dense-times-mask execution
  inside the update branch (costing nothing on non-update iterations);
  algorithms needing dense gradients on every step (SNFS momentum, DNW)
  are rejected.

  `update_hint`: host-side static knowledge of whether the steps this
  program runs are mask-update iterations (SparseTraining.step /
  predict_update_iters) — build one program with False for the hot loop
  and one with True for the predicted update steps to drop the schedule
  `lax.cond` from the hot path.
  """
  if block is not None and st.algo.name in ('momentum', 'dnw'):
    raise ValueError(
        f'block-sparse execution cannot serve {st.algo.name}: it needs '
        'dense gradients every step, but the block kernel backward only '
        'covers active blocks')
  if block is not None and st.block != block:
    raise ValueError(
        f'block execution {block} requires SparseTraining(block={block}) '
        f'so masks are block-granular (got {st.block})')

  def loss_fn(eff_params, batch_stats, batch, rng, bm_col=None):
    # `eff_params` is the {'params': ...}-wrapped tree (mask paths are
    # relative to the inner tree; path_str strips the wrapper).
    variables = {'params': eff_params['params']}
    if bm_col is not None:
      variables['block_masks'] = bm_col
    if has_batch_stats:
      variables['batch_stats'] = batch_stats
      logits, updates = model.apply(
          variables, batch['image'], train=True, mutable=['batch_stats'],
          rngs={'dropout': rng} if has_dropout else None)
      new_batch_stats = updates['batch_stats']
    else:
      logits = model.apply(variables, batch['image'], train=True,
                           rngs={'dropout': rng} if has_dropout else None)
      new_batch_stats = batch_stats
    loss = cross_entropy_loss(logits, batch['label'], label_smoothing)
    loss = loss + l2_regularization(eff_params, weight_decay)
    return loss, (logits, new_batch_stats)

  def train_step(state: TrainState, batch):
    rng, step_rng = jax.random.split(state.rng)
    # Differentiate w.r.t. the *effective* params: one backward pass yields
    # dense gradients at masked leaves (see transforms/sparse_training.py).
    # Pre-masked storage IS the effective params — the full-params multiply
    # (a read+write of every weight, every step) drops out of the hot path.
    eff = (state.params if st.premask_params
           else masks_lib.apply_masks(state.params, state.sparse.masks))
    bm_col = None
    if block is not None:
      from rigl_tpu.ops import block_mask as bm_lib
      # Route only layers whose (static) target sparsity makes block
      # skipping profitable; dense-ish layers stay on XLA convs.  Sparsity
      # targets are host-side floats (SparseTraining.init), so the routing
      # is resolved at trace time — no dynamic shapes.  The per-layer
      # descriptors come from SparseState.block_packs, refreshed only when
      # masks change — the hot path does no pooling/packing work.
      paths = bm_lib.block_executable_layers(state.sparse.masks, block,
                                             conv3x3=block_conv3x3)
      packs = state.sparse.block_packs or {}
      entries = {p: packs[p] for p in paths
                 if p in packs
                 and st.sparsities.get(p, 0.0) >= block_min_sparsity}
      bm_col = bm_lib.nest_entries(entries) if entries else None
    (loss, (logits, new_batch_stats)), dense_grads = jax.value_and_grad(
        loss_fn, has_aux=True)(eff, state.batch_stats, batch, step_rng,
                               bm_col)
    grow_grads_fn = None
    # Gradient-scored regrowth under block execution needs truly dense
    # gradients — recompute through dense-times-mask execution, lazily in
    # the update branch.
    # (SNIP needs no special case: its saliency pass runs at step 0 when
    # masks are still all-ones, i.e. every block is active.)
    need_dense_grow = (block is not None
                       and st.algo.name in ('rigl', 'rigl_inverted'))
    if update_hint is False:
      need_dense_grow = False  # update branch statically absent
    if grow_batch is not None or need_dense_grow:
      def grow_grads_fn(params):
        b = grow_batch if grow_batch is not None else batch
        eff_p = masks_lib.apply_masks(params, state.sparse.masks)
        return jax.grad(
            lambda p: loss_fn(p, state.batch_stats, b,
                              step_rng)[0])(eff_p)
    params, opt_state, sstate, st_metrics = st.step(
        state.params, state.opt_state, state.sparse, dense_grads,
        grow_grads_fn=grow_grads_fn, update_hint=update_hint)
    new_state = state.replace(
        params=params, batch_stats=new_batch_stats, opt_state=opt_state,
        sparse=sstate, rng=rng)
    acc = jnp.mean(
        (jnp.argmax(logits, -1) == batch['label']).astype(jnp.float32))
    metrics = {'loss': loss, 'accuracy': acc, 'step': sstate.step}
    metrics.update(st_metrics)
    return new_state, metrics

  return train_step


def make_grad_norm_fn(model, st: SparseTraining, weight_decay: float = 0.0,
                      label_smoothing: float = 0.0,
                      has_batch_stats: bool = True):
  """Global L2 norm of the *masked* training gradients on a batch — used to
  log the gradient-norm change produced by a mask update
  (rigl_tf2/train.py:433-438)."""

  def grad_norm(state: TrainState, batch):
    eff = masks_lib.apply_masks(state.params, state.sparse.masks)

    def loss_fn(eff_params):
      variables = {'params': eff_params['params']}
      if has_batch_stats:
        variables['batch_stats'] = state.batch_stats
        logits = model.apply(variables, batch['image'], train=True,
                             mutable=['batch_stats'])[0]
      else:
        logits = model.apply(variables, batch['image'], train=True)
      loss = cross_entropy_loss(logits, batch['label'], label_smoothing)
      return loss + l2_regularization(eff_params, weight_decay)

    grads = jax.grad(loss_fn)(eff)
    grads = masks_lib.mask_grads(grads, state.sparse.masks)
    sq = sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
             for g in jax.tree.leaves(grads))
    return jnp.sqrt(sq)

  return grad_norm


def make_eval_step(model, has_batch_stats: bool = True):
  """Top-1/top-5 eval step on masked params (imagenet_train_eval.py:596-615)."""

  def eval_step(state: TrainState, batch):
    eff = masks_lib.apply_masks(state.params, state.sparse.masks)
    variables = {'params': eff['params']}
    if has_batch_stats:
      variables['batch_stats'] = state.batch_stats
    logits = model.apply(variables, batch['image'], train=False)
    logits = logits.astype(jnp.float32)
    labels = batch['label']
    top1 = (jnp.argmax(logits, -1) == labels).astype(jnp.float32)
    top5 = jnp.any(
        jax.lax.top_k(logits, min(5, logits.shape[-1]))[1] == labels[:, None],
        axis=-1).astype(jnp.float32)
    loss = cross_entropy_loss(logits, labels)
    return {
        'loss': loss,
        'top_1': jnp.mean(top1),
        'top_5': jnp.mean(top5),
        'count': jnp.asarray(labels.shape[0], jnp.float32),
    }

  return eval_step


def init_train_state(
    key: jax.Array,
    model,
    st: SparseTraining,
    input_shape: Tuple[int, ...],
    has_batch_stats: bool = True,
    premask: Optional[bool] = None,
) -> TrainState:
  """Initializes model variables, masks, and optimizer state.

  `premask` overrides st.premask_params for the initial zeroing — callers
  that perform mask/param surgery afterwards (Trainer.init_state) pass
  False and establish the invariant themselves once the final masks are
  known, so latent init values are not destroyed under the wrong mask.
  """
  param_key, mask_key, rng = jax.random.split(key, 3)
  variables = model.init(param_key, jnp.zeros(input_shape), train=False)
  params = variables['params']
  batch_stats = variables.get('batch_stats', {}) if has_batch_stats else {}
  opt_state, sstate = st.init(mask_key, {'params': params})
  wrapped = {'params': params}
  if st.premask_params if premask is None else premask:
    # Establish the pre-masked invariant once; masked training gradients
    # keep inactive weights at zero from here on.
    wrapped = masks_lib.apply_masks(wrapped, sstate.masks)
  # SparseTraining paths are relative to the {'params': ...} wrapper; keep
  # params wrapped consistently.
  return TrainState(
      params=wrapped,
      batch_stats=batch_stats,
      opt_state=opt_state,
      sparse=sstate,
      rng=rng,
  )
