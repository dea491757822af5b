"""The drop/grow mask-update kernel as a pure JAX function.

This is the heart of dynamic sparse training.  Reference semantics
(rigl/sparse_optimizers_base.py:276-343 ``_get_update_op``):

  n_ones   = sum(mask)
  n_prune  = int(n_ones * drop_fraction)        # truncation, not rounding
  n_keep   = n_ones - n_prune
  keep-mask  = top n_keep of |score_drop| over the *whole* flattened layer
               ("k needs to be constant for TPU" — full-size top_k keeps the
               shape static while the counts stay data-dependent)
  grow-mask  = top n_prune of score_grow with already-kept positions lifted
               to min(score_grow) - 1 so they can never be re-grown
  new connections start from `grow_tensor` (zeros by default) and their
  optimizer slots are reset.

Everything here is shape-static and jit/pjit friendly: counts are traced
scalars used only in comparisons, never in shapes.  ``jax.lax.top_k`` sorts
descending with ties broken toward lower indices, the same tie-break as TF's
``nn_ops.top_k``, which the reference relies on for reproducible mask
evolution.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from rigl_tpu.sparsity.schedules import extract_number


class DropGrowResult(NamedTuple):
  mask: jnp.ndarray             # updated binary mask, same shape/dtype as input
  weights: jnp.ndarray          # weights with grown connections re-initialized
  new_connections: jnp.ndarray  # bool, True where a connection was just grown


def topk_mask_from_scores(scores: jnp.ndarray, n_keep: jnp.ndarray,
                          dtype=jnp.float32) -> jnp.ndarray:
  """Binary flat mask with ones at the top-`n_keep` positions of `scores`.

  `n_keep` may be traced; the sort is full-size so shapes stay static.
  """
  flat = scores.reshape(-1)
  n_total = flat.shape[0]
  _, order = jax.lax.top_k(flat, n_total)
  keep = (jnp.arange(n_total) < n_keep).astype(dtype)
  return jnp.zeros((n_total,), dtype).at[order].set(keep)


def drop_grow_update(
    mask: jnp.ndarray,
    weights: jnp.ndarray,
    score_drop: jnp.ndarray,
    score_grow: jnp.ndarray,
    drop_fraction: jnp.ndarray,
    grow_tensor: Optional[jnp.ndarray] = None,
    reinit_when_same: bool = False,
) -> DropGrowResult:
  """One drop/grow step for a single layer.

  Args:
    mask: current binary mask (any float/int dtype).
    weights: raw (unmasked) weights, same shape.
    score_drop: magnitude score; highest `n_keep` survive.
    score_grow: grow score; highest `n_prune` of currently-inactive win.
    drop_fraction: traced scalar in [0, 1].
    grow_tensor: init values for grown connections (defaults to zeros).
    reinit_when_same: if True (Static algorithm, sparse_optimizers.py:109-123)
      re-initialize every grown connection even if it was already active.

  Returns:
    DropGrowResult(mask, weights, new_connections).
  """
  old_dtype = mask.dtype
  shape = mask.shape
  mask_f = mask.astype(jnp.float32)
  n_total = int(score_drop.size)

  n_ones = jnp.sum(mask_f).astype(jnp.int32)
  n_prune = (n_ones.astype(jnp.float32) *
             jnp.asarray(drop_fraction, jnp.float32)).astype(jnp.int32)
  n_keep = n_ones - n_prune

  # Keep-mask over drop scores.
  mask1 = topk_mask_from_scores(score_drop, n_keep)

  # Lift kept positions out of the grow competition.  nan_to_num is the
  # identity for finite scores (bit-exact goldens unaffected); with NaN
  # grow scores (a diverged run) the lift's min-1 would otherwise be NaN,
  # NaNs sort to the top of top_k, kept positions re-win grow, and the
  # mask count silently drifts — fatal for packed storage, whose static
  # n_active is a shape.  Sanitizing keeps the count invariant; the run
  # is still diverged, but the state stays structurally valid.
  grow_flat = jnp.nan_to_num(score_grow.reshape(-1).astype(jnp.float32))
  lifted = jnp.where(mask1 == 1.0, jnp.min(grow_flat) - 1.0, grow_flat)
  mask2 = topk_mask_from_scores(lifted, n_prune)
  # mask1 and mask2 are disjoint by construction: mask2's candidates score
  # strictly below every non-lifted entry, and exactly n_keep + n_prune
  # <= n_total positions are set (the reference asserts this in-graph,
  # sparse_optimizers_base.py:319-321).

  mask2_r = mask2.reshape(shape)
  if reinit_when_same:
    new_connections = mask2_r == 1.0
  else:
    new_connections = (mask2_r == 1.0) & (mask_f == 0.0)

  if grow_tensor is None:
    grow_tensor = jnp.zeros_like(weights)
  new_weights = jnp.where(new_connections, grow_tensor.astype(weights.dtype),
                          weights)
  new_mask = (mask1 + mask2).reshape(shape).astype(old_dtype)
  return DropGrowResult(new_mask, new_weights, new_connections)


def prune_to_sparsity(score: jnp.ndarray, sparsity: float,
                      dtype=jnp.float32) -> jnp.ndarray:
  """One-shot mask keeping the top (1-sparsity) of `score` (static count).

  Used by SNIP (saliency |g*w|, sparse_optimizers.py:287-317), DNW (|w|,
  sparse_optimizers.py:430-460) and magnitude pruning.  The count is static
  here because target sparsity is a config, not data.
  """
  import numpy as np
  from rigl_tpu.sparsity import distributions
  n_total = int(np.prod(score.shape))
  n_keep = n_total - distributions.get_n_zeros(n_total, float(sparsity))
  return topk_mask_from_scores(score, n_keep, dtype).reshape(score.shape)


def grow_init_tensor(
    method: str,
    key: jax.Array,
    weights: jnp.ndarray,
    masked_grad: Optional[jnp.ndarray] = None,
    initial_weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
  """Initialization values for newly grown connections.

  Methods (sparse_optimizers_base.py:355-400 and the RigL-specific gradient
  variants at :540-553):
    'zeros'                     — zeros (default, the published RigL choice)
    'initial_dist[_d]'          — shuffled copy of the layer's initial
                                  weights, divided by d
    'random_normal[_d]'         — N(0, std(weights)) / d
    'random_uniform[_d]'        — U(-mean|w|, mean|w|) / d
    'grad_scale[_d]'            — dense gradient / d (RigL only)
    'grad_sign[_d]'             — sign(dense gradient) / d (RigL only)
  """
  if method == 'zeros':
    return jnp.zeros_like(weights)
  divisor = extract_number(method)
  if method.startswith('initial_dist'):
    if initial_weights is None:
      raise ValueError('initial_dist grow init requires initial_weights')
    flat = jax.random.permutation(key, initial_weights.reshape(-1))
    return flat.reshape(weights.shape) / divisor
  if method.startswith('random_normal'):
    stddev = jnp.std(weights)
    return jax.random.normal(key, weights.shape, weights.dtype) * stddev / divisor
  if method.startswith('random_uniform'):
    mean = jnp.mean(jnp.abs(weights))
    return jax.random.uniform(
        key, weights.shape, weights.dtype, minval=-mean, maxval=mean) / divisor
  if method.startswith('grad_scale'):
    if masked_grad is None:
      raise ValueError('grad_scale grow init requires the dense gradient')
    return masked_grad / divisor
  if method.startswith('grad_sign'):
    if masked_grad is None:
      raise ValueError('grad_sign grow init requires the dense gradient')
    return jnp.sign(masked_grad) / divisor
  raise ValueError('Grow-Init: %s is not a valid option.' % method)
