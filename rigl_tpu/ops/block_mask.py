"""Block-granular masks: the bridge between RigL and the MXU.

Unstructured masks cannot skip work on a 128x128 systolic array — a random
80%-sparse mask leaves essentially every hardware tile partially occupied.
Constraining the mask to (block_rows x block_cols) blocks makes sparsity
*executable*: whole weight tiles are zero and a block-sparse kernel can skip
their matmuls entirely.  The reference reserved `block_width/block_height`
flags for this but never implemented them (imagenet_train_eval.py:271-272);
here block granularity is a first-class option of the drop/grow update.

Mechanics: scores are sum-pooled over blocks, the drop/grow kernel runs on
the (R/br x C/bc) block grid with counts in block units, and the resulting
block mask broadcasts back to element granularity.  Sparsity is preserved
exactly in block units (floor arithmetic as everywhere else).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def block_shape_for(shape: Tuple[int, ...],
                    block: Tuple[int, int]) -> Tuple[int, int]:
  """Maps an ND kernel shape to its 2D matmul view (rows=inputs, cols=outputs).

  Conv kernels (kh, kw, cin, cout) flatten to (cin*kh*kw, cout) — the
  im2col row order the conv-as-matmul actually consumes
  (lax.conv_general_dilated_patches emits features ordered (cin, kh, kw)),
  so trained block structure is directly executable by ops/conv.py.
  """
  rows = int(np.prod(shape[:-1]))
  cols = int(shape[-1])
  return rows, cols


def _to_2d(x: jnp.ndarray) -> jnp.ndarray:
  """The canonical 2D matmul view (see block_shape_for)."""
  if x.ndim == 4:
    kh, kw, cin, cout = x.shape
    return jnp.transpose(x, (2, 0, 1, 3)).reshape(cin * kh * kw, cout)
  return x.reshape(-1, x.shape[-1])


def _from_2d(v: jnp.ndarray, shape: Tuple[int, ...]) -> jnp.ndarray:
  """Inverse of _to_2d."""
  if len(shape) == 4:
    kh, kw, cin, cout = shape
    return jnp.transpose(v.reshape(cin, kh, kw, cout), (1, 2, 0, 3))
  return v.reshape(shape)


def pool_to_blocks(x: jnp.ndarray, block: Tuple[int, int],
                   reduce: str = 'sum') -> jnp.ndarray:
  """Sum/max-pools a 2D-viewed tensor into block cells.

  Requires block dims to divide the 2D view (pad upstream if not).
  """
  rows, cols = block_shape_for(x.shape, block)
  br, bc = block
  if rows % br or cols % bc:
    raise ValueError(f'block {block} does not divide 2D view ({rows},{cols})')
  v = _to_2d(x).reshape(rows // br, br, cols // bc, bc)
  if reduce == 'sum':
    return v.sum(axis=(1, 3))
  if reduce == 'max':
    return v.max(axis=(1, 3))
  if reduce == 'mean':
    return v.mean(axis=(1, 3))
  raise ValueError(reduce)


def expand_from_blocks(block_mask: jnp.ndarray, shape: Tuple[int, ...],
                       block: Tuple[int, int]) -> jnp.ndarray:
  """Broadcasts a block mask back to the element-granular kernel shape."""
  br, bc = block
  m = jnp.repeat(jnp.repeat(block_mask, br, axis=0), bc, axis=1)
  return _from_2d(m, shape)


# ------------------------------------------------------------ tap layout --
# Spatial convs get per-tap block granularity: the block cell is
# (1, 1, bk, bn) on the (kh, kw, cin, cout) kernel, giving a
# (kh*kw, cin/bk, cout/bn) occupancy.  This is the layout the direct
# block-sparse conv kernel executes (ops/pallas/block_sparse_conv.py): a
# stride-1 SAME conv is a sum over kh*kw constant row shifts of the
# spatially padded activations, each tap a block-sparse (Cin x Cout) matmul.
# (The earlier im2col row layout mixed taps within a block, which is only
# executable by materializing kh*kw x the activations.)


def is_tap_layer(shape: Tuple[int, ...], block: Tuple[int, int]) -> bool:
  """True if `shape` is a spatial conv kernel divisible into tap blocks."""
  if len(shape) != 4 or tuple(shape[:2]) == (1, 1):
    return False
  br, bc = block
  return shape[2] % br == 0 and shape[3] % bc == 0


def pool_to_tap_blocks(x: jnp.ndarray, block: Tuple[int, int],
                       reduce: str = 'sum') -> jnp.ndarray:
  """(kh, kw, cin, cout) -> (kh*kw, cin/bk, cout/bn) block cells."""
  kh, kw, cin, cout = x.shape
  br, bc = block
  v = x.reshape(kh * kw, cin // br, br, cout // bc, bc)
  if reduce == 'sum':
    return v.sum(axis=(2, 4))
  if reduce == 'max':
    return v.max(axis=(2, 4))
  if reduce == 'mean':
    return v.mean(axis=(2, 4))
  raise ValueError(reduce)


def expand_from_tap_blocks(tap_mask: jnp.ndarray, shape: Tuple[int, ...],
                           block: Tuple[int, int]) -> jnp.ndarray:
  """Broadcasts a (kh*kw, cin/bk, cout/bn) mask back to (kh, kw, cin, cout)."""
  kh, kw, cin, cout = shape
  br, bc = block
  m = jnp.repeat(jnp.repeat(tap_mask, br, axis=1), bc, axis=2)
  return m.reshape(shape)


def random_tap_block_mask(key: jax.Array, shape: Tuple[int, ...],
                          sparsity: float, block: Tuple[int, int],
                          dtype=jnp.float32) -> jnp.ndarray:
  """Random spatial-conv mask with exact tap-block-level sparsity."""
  from rigl_tpu.sparsity import masks as masks_lib
  kh, kw, cin, cout = shape
  br, bc = block
  bm = masks_lib.random_mask(key, (kh * kw, cin // br, cout // bc), sparsity,
                             dtype)
  return expand_from_tap_blocks(bm, shape, block)


def blockwise_drop_grow(mask, weights, score_drop, score_grow, drop_fraction,
                        block: Tuple[int, int], grow_tensor=None,
                        reinit_when_same: bool = False):
  """Drop/grow at block granularity.

  Scores pool by sum over blocks; the element mask is the broadcast of the
  block decision.  Newly grown blocks' weights re-initialize from
  `grow_tensor` (zeros default), and new_connections marks every element of
  a grown block.  Spatial conv kernels pool per tap (is_tap_layer); 2D
  kernels and 1x1 convs pool over the 2D matmul view.
  """
  from rigl_tpu.sparsity import update as update_lib

  shape = mask.shape
  if is_tap_layer(shape, block):
    pool, expand = pool_to_tap_blocks, expand_from_tap_blocks
  else:
    pool, expand = pool_to_blocks, expand_from_blocks
  block_mask = pool(mask.astype(jnp.float32), block, 'max')
  bd = pool(jnp.asarray(score_drop, jnp.float32), block, 'sum')
  bg = pool(jnp.asarray(score_grow, jnp.float32), block, 'sum')

  res = update_lib.drop_grow_update(
      block_mask, jnp.zeros_like(block_mask), bd, bg, drop_fraction,
      grow_tensor=jnp.zeros_like(block_mask),
      reinit_when_same=reinit_when_same)

  new_mask = expand(res.mask, shape, block).astype(mask.dtype)
  new_conn = expand(
      res.new_connections.astype(jnp.float32), shape, block) == 1.0
  if grow_tensor is None:
    grow_tensor = jnp.zeros_like(weights)
  new_weights = jnp.where(new_conn, grow_tensor.astype(weights.dtype),
                          weights)
  return update_lib.DropGrowResult(new_mask, new_weights, new_conn)


def block_executable_layers(masks, block: Tuple[int, int],
                            conv3x3: bool = False):
  """Mask paths whose layers can execute on the block-skipping kernels.

  Eligible: 2D kernels and 1x1 conv kernels whose (rows, cols) matmul view
  the block divides (matmul kernels), plus — with `conv3x3=True` — spatial
  conv kernels whose channel dims the block divides (tap layout, executed
  by the direct shift-and-matmul conv kernel,
  ops/pallas/block_sparse_conv.py; stride-1 layers only, the layer itself
  falls back to a dense XLA conv otherwise).
  """
  out = []
  br, bc = block
  for path, m in masks.items():
    shape = tuple(np.shape(m))
    if len(shape) == 4 and tuple(shape[:2]) != (1, 1):
      if conv3x3 and is_tap_layer(shape, block):
        out.append(path)
      continue
    if len(shape) not in (2, 4):
      continue
    rows, cols = block_shape_for(shape, block)
    if rows % br == 0 and cols % bc == 0:
      out.append(path)
  return out


def block_mask_collection(masks, block: Tuple[int, int], paths=None,
                          conv3x3: bool = False, static_counts=None):
  """Builds the 'block_masks' flax variable collection from a MaskDict.

  Each entry describes the layer's active blocks, nested at the same path
  as the kernel param — so ``model.apply({'params': ..., 'block_masks':
  col}, ...)`` lets block-executing layers (models/common.py
  ConvFixedPad(block=...)) find their occupancy without any stateful sync.
  Derived from the masks in SparseState every step; under jit this is a
  trivial fused reshape+reduce (+ one small argsort for packed layers).

  Entry forms (ops/conv.py dispatches on them):
    * (rows/br, cols/bc) int32 occupancy -> v3 matmul kernel;
    * {'cols', 'rows'} flat column-major packing -> v4 matmul kernel,
      emitted when `static_counts` (SparseTraining.static_block_counts)
      pins the layer's active count;
    * (kh*kw, cin/bk, cout/bn) tap occupancy / {'cols','rows','taps'}
      packing -> direct block-sparse conv kernel (spatial convs).
  """
  if paths is None:
    paths = block_executable_layers(masks, block, conv3x3=conv3x3)
  static_counts = static_counts or {}
  entries = {}
  for path in paths:
    shape = tuple(np.shape(masks[path]))
    if is_tap_layer(shape, block):
      occ = (pool_to_tap_blocks(masks[path].astype(jnp.float32), block,
                                'max') > 0).astype(jnp.int32)
      # The tap conv kernel sizes its grid by the active count, which must
      # be static: either pinned by the caller (static_block_counts) or
      # read off a concrete (untraced) mask; traced masks without a pinned
      # count are not executable and are skipped.
      if path in static_counts:
        n_act = static_counts[path]
      else:
        try:
          n_act = int(occ.sum())
        except jax.errors.ConcretizationTypeError:
          continue
      from rigl_tpu.ops.pallas.block_sparse_conv import pack_tap_active
      cols_a, rows_a, taps_a = pack_tap_active(occ, n_act)
      entries[path] = {'cols': cols_a, 'rows': rows_a, 'taps': taps_a}
      continue
    occ = (pool_to_blocks(masks[path].astype(jnp.float32), block, 'max')
           > 0).astype(jnp.int32)
    if path in static_counts:
      from rigl_tpu.ops.pallas.block_sparse_v4 import pack_flat_active
      cols_a, rows_a = pack_flat_active(occ, static_counts[path])
      entries[path] = {'cols': cols_a, 'rows': rows_a}
    else:
      entries[path] = occ
  return nest_entries(entries)


def nest_entries(entries):
  """{'a/b/kernel': entry} -> nested {'a': {'b': {'kernel': entry}}}."""
  col: dict = {}
  for path, entry in entries.items():
    node = col
    parts = path.split('/')
    for k in parts[:-1]:
      node = node.setdefault(k, {})
    node[parts[-1]] = entry
  return col


def random_block_mask(key: jax.Array, shape: Tuple[int, ...],
                      sparsity: float, block: Tuple[int, int],
                      dtype=jnp.float32) -> jnp.ndarray:
  """Random mask with exact block-level sparsity (tap layout for spatial
  convs, 2D matmul-view layout otherwise)."""
  from rigl_tpu.sparsity import masks as masks_lib
  if is_tap_layer(shape, block):
    return random_tap_block_mask(key, shape, sparsity, block, dtype)
  rows, cols = block_shape_for(shape, block)
  br, bc = block
  bm = masks_lib.random_mask(key, (rows // br, cols // bc), sparsity, dtype)
  return expand_from_blocks(bm, shape, block)
