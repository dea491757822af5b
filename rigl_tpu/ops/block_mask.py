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

  Conv kernels (kh, kw, cin, cout) flatten to (kh*kw*cin, cout) — the shape
  the MXU actually multiplies after im2col.
  """
  rows = int(np.prod(shape[:-1]))
  cols = int(shape[-1])
  return rows, cols


def pool_to_blocks(x: jnp.ndarray, block: Tuple[int, int],
                   reduce: str = 'sum') -> jnp.ndarray:
  """Sum/max-pools a 2D-viewed tensor into block cells.

  Requires block dims to divide the 2D view (pad upstream if not).
  """
  rows, cols = block_shape_for(x.shape, block)
  br, bc = block
  if rows % br or cols % bc:
    raise ValueError(f'block {block} does not divide 2D view ({rows},{cols})')
  v = x.reshape(rows // br, br, cols // bc, bc)
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
  rows, cols = block_shape_for(shape, block)
  m = jnp.repeat(jnp.repeat(block_mask, br, axis=0), bc, axis=1)
  return m.reshape(shape)


def blockwise_drop_grow(mask, weights, score_drop, score_grow, drop_fraction,
                        block: Tuple[int, int], grow_tensor=None,
                        reinit_when_same: bool = False):
  """Drop/grow at block granularity.

  Scores pool by sum over blocks; the element mask is the broadcast of the
  block decision.  Newly grown blocks' weights re-initialize from
  `grow_tensor` (zeros default), and new_connections marks every element of
  a grown block.
  """
  from rigl_tpu.sparsity import update as update_lib

  shape = mask.shape
  block_mask = (pool_to_blocks(mask.astype(jnp.float32), block, 'max'))
  bd = pool_to_blocks(jnp.asarray(score_drop, jnp.float32), block, 'sum')
  bg = pool_to_blocks(jnp.asarray(score_grow, jnp.float32), block, 'sum')

  res = update_lib.drop_grow_update(
      block_mask, jnp.zeros_like(block_mask), bd, bg, drop_fraction,
      grow_tensor=jnp.zeros_like(block_mask),
      reinit_when_same=reinit_when_same)

  new_mask = expand_from_blocks(res.mask, shape, block).astype(mask.dtype)
  new_conn = expand_from_blocks(
      res.new_connections.astype(jnp.float32), shape, block) == 1.0
  if grow_tensor is None:
    grow_tensor = jnp.zeros_like(weights)
  new_weights = jnp.where(new_conn, grow_tensor.astype(weights.dtype),
                          weights)
  return update_lib.DropGrowResult(new_mask, new_weights, new_conn)


def random_block_mask(key: jax.Array, shape: Tuple[int, ...],
                      sparsity: float, block: Tuple[int, int],
                      dtype=jnp.float32) -> jnp.ndarray:
  """Random mask with exact block-level sparsity."""
  from rigl_tpu.sparsity import masks as masks_lib
  rows, cols = block_shape_for(shape, block)
  br, bc = block
  bm = masks_lib.random_mask(key, (rows // br, cols // bc), sparsity, dtype)
  return expand_from_blocks(bm, shape, block)
