"""Gather-style block-sparse matmul: skips DMA *and* compute.

v1 (block_sparse.py) predicates only the MXU work — the auto-pipeline still
streams every weight tile from HBM, so at high sparsity the kernel stays
bandwidth-bound.  This kernel owns its DMA:

  * the block mask is reduced on-device to, per output block-column j,
    `count[j]` and a front-packed index list `idx[j, s]` of active k-blocks;
  * grid is (M/bm, N/bn); for each output tile a `fori_loop` runs over the
    *actual* active count with double-buffered async copies of exactly the
    needed x/w tiles (pallas_guide.md double-buffering pattern);
  * inactive blocks cost nothing: no DMA issued, no MXU work, loop trip
    count shrinks with density.

x and w stay HBM-resident (memory_space=ANY, full-array blocks — the only
form Mosaic accepts for ANY); the kernel slices tiles with pl.ds using the
grid position and the gathered k indices.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_block_indices(block_mask: jnp.ndarray):
  """(K/bk, N/bn) mask -> (counts[n], idx[n, s]) with active k first.

  Stable argsort keeps active k ascending; padding entries repeat inactive
  indices but are never visited (loop bound = count).
  """
  m = block_mask.astype(jnp.int32)
  counts = jnp.sum(m, axis=0).astype(jnp.int32)            # (N/bn,)
  order = jnp.argsort(-m, axis=0, stable=True)             # (K/bk, N/bn)
  return counts, order.T.astype(jnp.int32)                 # (N/bn, K/bk)


def _gather_kernel(counts_ref, idx_ref, x_hbm, w_hbm, o_ref, acc_ref,
                   x_buf, w_buf, sems, *, bm, bk, bn):
  i = pl.program_id(0)
  j = pl.program_id(1)
  count = counts_ref[j]
  row = pl.multiple_of(i * bm, bm)
  col = pl.multiple_of(j * bn, bn)

  def get_copies(s, slot):
    k = idx_ref[j, s] * bk
    cx = pltpu.make_async_copy(
        x_hbm.at[pl.ds(row, bm), pl.ds(k, bk)], x_buf.at[slot],
        sems.at[slot, 0])
    cw = pltpu.make_async_copy(
        w_hbm.at[pl.ds(k, bk), pl.ds(col, bn)], w_buf.at[slot],
        sems.at[slot, 1])
    return cx, cw

  @pl.when(count > 0)
  def _():
    cx, cw = get_copies(0, 0)
    cx.start()
    cw.start()

  def body(s, acc):
    slot = jax.lax.rem(s, 2)
    next_slot = 1 - slot

    @pl.when(s + 1 < count)
    def _():
      cx, cw = get_copies(s + 1, next_slot)
      cx.start()
      cw.start()

    cx, cw = get_copies(s, slot)
    cx.wait()
    cw.wait()
    return acc + jnp.dot(x_buf[slot], w_buf[slot],
                         preferred_element_type=jnp.float32)

  acc = jax.lax.fori_loop(0, count, body,
                          jnp.zeros((bm, bn), jnp.float32))
  o_ref[:] = acc.astype(o_ref.dtype)


def block_sparse_matmul_gather(x, w, block_mask,
                               block: Tuple[int, int] = (512, 512),
                               bm: int = 512,
                               interpret: Optional[bool] = None):
  """y = x @ (expanded(block_mask) * w); DMA-skipping gather kernel.

  Shapes must divide by the tile sizes (pad upstream).  `block_mask` is
  (K/bk, N/bn); tile sizes default to 512 to amortize per-block overhead —
  use rigl_tpu.ops.block_mask to maintain masks at this granularity.
  """
  if interpret is None:
    interpret = jax.default_backend() == 'cpu'
  m, kdim = x.shape
  _, n = w.shape
  bk, bn = block
  if m % bm or kdim % bk or n % bn:
    raise ValueError(f'shapes ({m},{kdim},{n}) must divide tiles '
                     f'bm={bm}, block={block}')
  counts, idx = pack_block_indices(block_mask)

  kernel = functools.partial(_gather_kernel, bm=bm, bk=bk, bn=bn)
  return pl.pallas_call(
      kernel,
      grid_spec=pltpu.PrefetchScalarGridSpec(
          num_scalar_prefetch=2,
          grid=(m // bm, n // bn),
          in_specs=[
              pl.BlockSpec(memory_space=pl.ANY),   # x stays in HBM
              pl.BlockSpec(memory_space=pl.ANY),   # w stays in HBM
          ],
          out_specs=pl.BlockSpec((bm, bn), lambda i, j, c, ix: (i, j)),
          scratch_shapes=[
              pltpu.VMEM((bm, bn), jnp.float32),
              pltpu.VMEM((2, bm, bk), x.dtype),
              pltpu.VMEM((2, bk, bn), w.dtype),
              pltpu.SemaphoreType.DMA((2, 2)),
          ],
      ),
      out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
      interpret=interpret,
  )(counts, idx, x, w)
