"""Mask pytrees: creation, application, and accounting.

TPU-native re-design of the reference's mask handling.  Where the reference
stores masks as TF graph variables discovered through global collections
(``tensorflow.contrib.model_pruning``; see rigl/sparse_optimizers.py:46-56),
here a *mask set* is a flat ``{param_path: jnp.ndarray}`` dict aligned with a
standard flax param pytree.  Masking is a pure functional overlay: any flax
model becomes a sparse model via ``apply_masks(params, masks)`` — no special
layers required, and XLA fuses the elementwise multiply into the consumer
matmul/conv.

Random-mask semantics (deterministic population counts, ``floor`` arithmetic)
match rigl/sparse_utils.py:48-68.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rigl_tpu.sparsity import distributions

PyTree = Any
MaskDict = Dict[str, jnp.ndarray]
# Rule deciding which params get masks: (path_str, leaf) -> bool.
MaskRule = Callable[[str, Any], bool]


def path_str(path) -> str:
  """Formats a jax key path ('params', 'Dense_0', 'kernel') -> 'Dense_0/kernel'."""
  parts = []
  for p in path:
    if hasattr(p, 'key'):
      parts.append(str(p.key))
    elif hasattr(p, 'idx'):
      parts.append(str(p.idx))
    elif hasattr(p, 'name'):
      parts.append(str(p.name))
    else:
      parts.append(str(p))
  # Strip the flax top-level 'params' collection name if present.
  if parts and parts[0] == 'params':
    parts = parts[1:]
  return '/'.join(parts)


def default_mask_rule(path: str, leaf: Any) -> bool:
  """Masks >=2D 'kernel'/'w'/'embedding' leaves — the matmul/conv weights.

  Biases and normalization scales stay dense, matching the reference where
  only ``masked_conv2d``/``masked_fully_connected`` kernels carry masks.
  """
  name = path.rsplit('/', 1)[-1]
  return name in ('kernel', 'w', 'embedding') and np.ndim(leaf) >= 2


def mask_shapes(params: PyTree,
                rule: MaskRule = default_mask_rule) -> Dict[str, Tuple[int, ...]]:
  """Returns ``{path: shape}`` for every maskable parameter, in path order."""
  out: Dict[str, Tuple[int, ...]] = {}
  leaves = jax.tree_util.tree_flatten_with_path(params)[0]
  for path, leaf in leaves:
    p = path_str(path)
    if rule(p, leaf):
      out[p] = tuple(np.shape(leaf))
  return out


def random_mask(key: jax.Array,
                shape: Tuple[int, ...],
                sparsity: float,
                dtype=jnp.float32) -> jnp.ndarray:
  """Random mask with an exact zero count of ``floor(sparsity * size)``.

  Matches the deterministic-count semantics of sparse_utils.py:48-68 (fill
  ``n_zeros`` zeros then shuffle), realized as a uniform random permutation.
  """
  size = int(np.prod(shape))
  n_zeros = distributions.get_n_zeros(size, sparsity)
  flat = jnp.concatenate(
      [jnp.zeros((n_zeros,), dtype), jnp.ones((size - n_zeros,), dtype)])
  return jax.random.permutation(key, flat).reshape(shape)


def random_mask_numpy(shape, sparsity: float,
                      random_state: Optional[np.random.RandomState] = None
                      ) -> np.ndarray:
  """Host-side variant with the reference's exact shuffle procedure."""
  flat = np.ones(int(np.prod(shape)))
  n_zeros = distributions.get_n_zeros(flat.size, sparsity)
  flat[:n_zeros] = 0.0
  (random_state or np.random).shuffle(flat)
  return flat.reshape(shape)


def make_mask_dict(
    key: jax.Array,
    params: PyTree,
    method: str = 'erdos_renyi_kernel',
    default_sparsity: float = 0.8,
    custom_sparsity_map: Optional[Mapping[str, float]] = None,
    rule: MaskRule = default_mask_rule,
    erk_power_scale: float = distributions.DEFAULT_ERK_SCALE,
    dtype=jnp.float32,
) -> MaskDict:
  """Builds the initial random mask dict for a param pytree.

  One fold_in per layer keeps masks independent of layer count changes
  elsewhere and identical across data-parallel replicas.
  """
  shapes = mask_shapes(params, rule)
  sparsities = distributions.get_sparsities(
      shapes, method, default_sparsity, custom_sparsity_map,
      erk_power_scale=erk_power_scale)
  # Host-side shuffles: deterministic in (key, layer index), identical on
  # every replica, and avoids compiling one permutation program per layer
  # shape (mask init happens exactly once).
  key_ints = np.asarray(jax.random.key_data(key)).flatten().tolist()
  masks: MaskDict = {}
  for i, (path, shape) in enumerate(shapes.items()):
    rs = np.random.default_rng(np.random.SeedSequence(key_ints + [i]))
    size = int(np.prod(shape))
    n_zeros = distributions.get_n_zeros(size, sparsities[path])
    flat = np.ones(size, np.float32)
    flat[:n_zeros] = 0.0
    rs.shuffle(flat)
    masks[path] = jnp.asarray(flat.reshape(shape), dtype)
  return masks


def apply_masks(params: PyTree, masks: Mapping[str, jnp.ndarray]) -> PyTree:
  """Returns effective params: masked leaves multiplied, others untouched.

  The trainer differentiates the loss w.r.t. *this* tree, which yields dense
  gradients at masked leaves in a single backward pass (the reference needed
  a second ``compute_gradients`` call w.r.t. the masked-weight tensors,
  sparse_optimizers_base.py:478-485).
  """
  def f(path, w):
    m = masks.get(path_str(path))
    return w if m is None else w * m.astype(w.dtype)

  return jax.tree_util.tree_map_with_path(f, params)


def mask_grads(grads: PyTree, masks: Mapping[str, jnp.ndarray]) -> PyTree:
  """Projects dense gradients onto the active set (chain rule through mask*w)."""
  return apply_masks(grads, masks)


def select_masked(tree: PyTree, masks: Mapping[str, jnp.ndarray]) -> MaskDict:
  """Extracts the masked leaves of ``tree`` into a flat dict keyed like masks."""
  out: MaskDict = {}

  def f(path, leaf):
    p = path_str(path)
    if p in masks:
      out[p] = leaf
    return leaf

  jax.tree_util.tree_map_with_path(f, tree)
  return out


def update_masked(tree: PyTree, updates: Mapping[str, jnp.ndarray]) -> PyTree:
  """Writes flat-dict leaf updates back into a full pytree."""
  def f(path, leaf):
    p = path_str(path)
    return updates[p] if p in updates else leaf

  return jax.tree_util.tree_map_with_path(f, tree)


def calculate_sparsity(masks: Mapping[str, jnp.ndarray]) -> jnp.ndarray:
  """Global fraction of zeros across all masks (sparse_utils.py:39-45)."""
  total = sum(int(np.prod(m.shape)) for m in masks.values())
  ones = sum(jnp.sum(m.astype(jnp.float32)) for m in masks.values())
  return 1.0 - ones / total


def per_layer_sparsity(masks: Mapping[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
  return {
      p: 1.0 - jnp.mean(m.astype(jnp.float32)) for p, m in masks.items()
  }
