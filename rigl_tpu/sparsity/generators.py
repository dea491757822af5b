"""Structured mask generators + mask propagation analysis.

Capability parity with the reference's experimental JAX branch
(rigl/experimental/jax/pruning/masked.py:257-707), re-hosted onto the flat
``{path: mask}`` MaskDict representation used throughout rigl_tpu:

  shuffled      — exact-count random mask per layer (masked.py:257-289)
  bernoulli     — iid Bernoulli(1 - sparsity) mask (masked.py:292-323)
  simple        — mask from a numpy-style init fn (masked.py:326-345)
  symmetric     — one shared input-mask repeated across all output neurons
                  (structured pruning; masked.py:348-376)
  per_neuron    — every output neuron keeps exactly the same number of
                  inputs, each neuron shuffled independently
                  (masked.py:379-449)
  per_neuron_no_input_ablation — per_neuron + a wrapped-diagonal fill so
                  every input unit keeps at least one outgoing edge
                  (masked.py:452-634)

plus ``propagate_masks`` (masked.py:637-707): forward-propagates effective
ablation (a neuron with no surviving incoming weights kills its outgoing
weights in the next layer; convs handled channel-wise).
"""

from __future__ import annotations

from typing import Callable, Dict, Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np

MaskDict = Dict[str, jnp.ndarray]
ShapeDict = Mapping[str, Tuple[int, ...]]


def _check_sparsity(sparsity: float):
  if not 0.0 <= sparsity <= 1.0:
    raise ValueError(
      'Given sparsity, {}, is not in range [0, 1]'.format(sparsity))


def _fixed_count_vector(n: int, sparsity: float, dtype=jnp.float32):
  """[0]*ceil(s*n) then ones — the reference's arange>=s*n construction."""
  idx = jnp.arange(n)
  return jnp.where(idx >= sparsity * n, jnp.ones((n,), dtype),
                   jnp.zeros((n,), dtype))


def shuffled_mask(key: jax.Array, shapes: ShapeDict, sparsity: float,
                  dtype=jnp.float32) -> MaskDict:
  """Exact-count random mask for every layer."""
  _check_sparsity(sparsity)
  out: MaskDict = {}
  for i, (path, shape) in enumerate(shapes.items()):
    n = int(np.prod(shape))
    vec = _fixed_count_vector(n, sparsity, dtype)
    out[path] = jax.random.permutation(
        jax.random.fold_in(key, i), vec).reshape(shape)
  return out


def bernoulli_mask(key: jax.Array, shapes: ShapeDict, mean_sparsity: float,
                   dtype=jnp.float32) -> MaskDict:
  """iid Bernoulli(1 - mean_sparsity) masks (sparsity exact only in mean)."""
  _check_sparsity(mean_sparsity)
  out: MaskDict = {}
  for i, (path, shape) in enumerate(shapes.items()):
    out[path] = jax.random.bernoulli(
        jax.random.fold_in(key, i), p=1.0 - mean_sparsity,
        shape=shape).astype(dtype)
  return out


def simple_mask(shapes: ShapeDict, init_fn: Callable = np.ones,
                dtype=jnp.float32) -> MaskDict:
  """Masks from a numpy init function (e.g. np.ones, np.zeros)."""
  return {p: jnp.asarray(init_fn(s), dtype) for p, s in shapes.items()}


def symmetric_mask(key: jax.Array, shapes: ShapeDict, sparsity: float,
                   dtype=jnp.float32) -> MaskDict:
  """One shared input-mask repeated for every output neuron (structured)."""
  _check_sparsity(sparsity)
  out: MaskDict = {}
  for i, (path, shape) in enumerate(shapes.items()):
    n_in = int(np.prod(shape[:-1]))
    vec = _fixed_count_vector(n_in, sparsity, dtype)
    vec = jax.random.permutation(jax.random.fold_in(key, i), vec)
    out[path] = jnp.repeat(vec[:, None], shape[-1], axis=1).reshape(shape)
  return out


def per_neuron_mask(key: jax.Array, shapes: ShapeDict, sparsity: float,
                    dtype=jnp.float32) -> MaskDict:
  """Every output neuron keeps the same input count, shuffled independently —
  guarantees no output neuron is fully ablated (for sparsity < 1)."""
  _check_sparsity(sparsity)
  out: MaskDict = {}
  for i, (path, shape) in enumerate(shapes.items()):
    n_in = int(np.prod(shape[:-1]))
    base = jnp.repeat(_fixed_count_vector(n_in, sparsity, dtype)[:, None],
                      shape[-1], axis=1)
    shuffled = jax.random.permutation(
        jax.random.fold_in(key, i), base, axis=0, independent=True)
    out[path] = shuffled.reshape(shape)
  return out


def _wrapped_diagonal(n_rows: int, n_cols: int, dtype=jnp.float32):
  """Ones on the (wrapped) diagonal: every row gets >= 1 one even if tall."""
  rows = jnp.arange(n_rows)
  cols = rows % n_cols
  return jnp.zeros((n_rows, n_cols), dtype).at[rows, cols].set(1)


def per_neuron_no_input_ablation_mask(key: jax.Array, shapes: ShapeDict,
                                      sparsity: float,
                                      dtype=jnp.float32) -> MaskDict:
  """Per-neuron mask unioned with a wrapped diagonal, so every *input* unit
  keeps at least one outgoing connection (no input is silently dropped)."""
  _check_sparsity(sparsity)
  base = per_neuron_mask(key, shapes, sparsity, dtype)
  out: MaskDict = {}
  for i, (path, shape) in enumerate(shapes.items()):
    n_in = int(np.prod(shape[:-1]))
    m2d = base[path].reshape(n_in, shape[-1])
    diag = _wrapped_diagonal(n_in, shape[-1], dtype)
    # Shuffle the diagonal's column assignment so the guaranteed edges are
    # not systematically the first outputs.
    perm = jax.random.permutation(
        jax.random.fold_in(jax.random.fold_in(key, i), 1), shape[-1])
    diag = diag[:, perm]
    out[path] = jnp.maximum(m2d, diag).reshape(shape)
  return out


MASK_GENERATORS = {
    'shuffled': shuffled_mask,
    'random': bernoulli_mask,
    'symmetric': symmetric_mask,
    'per_neuron': per_neuron_mask,
    'per_neuron_no_input_ablation': per_neuron_no_input_ablation_mask,
}


def generate_mask(mask_type: str, key: jax.Array, shapes: ShapeDict,
                  sparsity: float, dtype=jnp.float32) -> MaskDict:
  """Registry dispatch (parity with pruning/mask_factory.py:35-68).
  'nm_<n>_<m>' dispatches to N:M structured masks (structured.py)."""
  from rigl_tpu.sparsity import structured
  nm = structured.parse_n_m(mask_type)
  if nm is not None:
    return structured.make_n_m_generator(*nm)(key, shapes, sparsity, dtype)
  if mask_type not in MASK_GENERATORS:
    raise ValueError(
        f'Unknown mask type {mask_type!r}; available: '
        f"{sorted(MASK_GENERATORS)} + 'nm_<n>_<m>'")
  return MASK_GENERATORS[mask_type](key, shapes, sparsity, dtype)


def propagate_masks(masks: MaskDict) -> MaskDict:
  """Forward-propagates effective ablation through consecutive layers.

  The MaskDict is ordered (insertion = definition = execution order for the
  sequential models this analysis targets).  An output unit of layer i with
  zero surviving incoming weights ablates the corresponding input slice of
  layer i+1.  Convs are handled channel-wise: a channel is alive if any
  spatial weight survives.
  """
  paths = list(masks.keys())
  out = dict(masks)
  for i in range(1, len(paths)):
    prev, cur = out[paths[i - 1]], out[paths[i]]
    prev2d = prev.reshape(-1, prev.shape[-1])
    alive_in = (jnp.sum(prev2d, axis=0) != 0)
    if cur.ndim > 2:
      # Conv: channel alive if any spatial weight is nonzero.
      spatial = tuple(range(cur.ndim - 2))
      chan = jnp.max(cur, axis=spatial)           # (cin, cout)
      new2d = alive_in[:, None] * chan
      new = jnp.tile(new2d, cur.shape[:-2] + (1, 1))
    else:
      if prev.ndim > 2:
        raise ValueError(
            'propagate_masks requires knowledge of the spatial dimensions '
            'of the previous layer; use an equivalent conv layer instead of '
            'dense after conv.')
      new = alive_in[:, None] * cur
    out[paths[i]] = new.reshape(cur.shape).astype(cur.dtype)
  return out
