"""Block-sparse matmul v4: flat-packed active blocks, overhead-free skips.

v3's grid is (M/bm, N/bn) with a fori_loop over each column's active
k-blocks: empty columns still burn a grid step, the per-column loop restarts
DMA pipelining (first tile of every column waits un-overlapped), and at
(128, 128) blocks the per-step fixed costs dominated the e2e ResNet-50 step
(PERF.md round-1 block-execution measurements).

v4 removes the wasted work structurally: the *active blocks themselves* are
the grid.

  * Drop/grow preserves each layer's active count exactly (floor
    arithmetic, sparsity/update.py), so `n_active` is a static, compile-time
    constant — SparseTraining.static_block_counts().  The packing
    (cols[s], rows[s]) sorts active blocks column-major on device each step
    (one small argsort), shapes stay static.
  * Grid is (M/bm, n_active): every step does exactly one w-tile DMA
    (double-buffered ACROSS column boundaries — the pipeline never flushes)
    and one MXU dot.  Zero steps are spent on inactive blocks or empty
    columns.
  * Output tiles accumulate in VMEM while the column index is unchanged
    (column-major order makes each column one contiguous run) and flush on
    change; columns with no active blocks are zeroed by a cheap
    column-occupancy multiply outside the kernel.

dx reuses the kernel with transposed packing (recomputed in the VJP from
the forward packing); dw uses the v3 strategies ('auto': XLA dense pass
times the expanded mask, or the gather kernel).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_flat_active(block_mask: jnp.ndarray, n_active: int):
  """(K/bk, N/bn) occupancy -> (cols, rows) of the n_active active blocks,
  column-major, each padded with one sentinel entry (-1 / 0).

  `n_active` must equal the true active count (static through training for
  drop/grow-family block masks); stable argsort puts active blocks first in
  column-major order.
  """
  nk = block_mask.shape[0]
  flat_cm = block_mask.astype(jnp.int32).T.reshape(-1)
  order = jnp.argsort(-flat_cm, stable=True)[:n_active].astype(jnp.int32)
  cols = order // nk
  rows = order % nk
  cols = jnp.concatenate([cols, jnp.full((1,), -1, jnp.int32)])
  rows = jnp.concatenate([rows, jnp.zeros((1,), jnp.int32)])
  return cols, rows


def _v4_kernel(cols_ref, rows_ref, x_ref, w_hbm, o_ref, acc_ref, w_buf,
               sems, *, bk, bn):
  s = pl.program_id(1)
  ns = pl.num_programs(1)
  j = cols_ref[s]

  def w_copy(si, slot):
    return pltpu.make_async_copy(
        w_hbm.at[pl.ds(rows_ref[si] * bk, bk), pl.ds(cols_ref[si] * bn, bn)],
        w_buf.at[slot], sems.at[slot])

  @pl.when(s == 0)
  def _():
    w_copy(0, 0).start()

  slot = jax.lax.rem(s, 2)

  @pl.when(s + 1 < ns)
  def _():
    w_copy(s + 1, 1 - slot).start()

  w_copy(s, slot).wait()
  k = rows_ref[s]
  x_tile = x_ref[:, pl.ds(k * bk, bk)]
  prod = jnp.dot(x_tile, w_buf[slot], preferred_element_type=jnp.float32)

  prev_j = cols_ref[jax.lax.max(s - 1, 0)]
  is_first = (s == 0) | (prev_j != j)
  # select, not multiply-by-flag: the scratch is uninitialized on the first
  # visit of a column and 0 * garbage would still poison the accumulator.
  acc_ref[:] = jnp.where(is_first, prod, acc_ref[:] + prod)

  next_j = cols_ref[s + 1]  # sentinel makes this safe at s == ns-1
  is_last = (s + 1 == ns) | (next_j != j)

  @pl.when(is_last)
  def _():
    o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _v4_matmul(x, w, cols, rows, block, bm, interpret):
  """Core pallas call; returns y WITHOUT the empty-column zeroing."""
  m, kdim = x.shape
  _, n = w.shape
  bk, bn = block
  n_active = cols.shape[0] - 1
  kernel = functools.partial(_v4_kernel, bk=bk, bn=bn)
  return pl.pallas_call(
      kernel,
      grid_spec=pltpu.PrefetchScalarGridSpec(
          num_scalar_prefetch=2,
          grid=(m // bm, n_active),
          in_specs=[
              # x row panel resident in VMEM across the s sweep.
              pl.BlockSpec((bm, kdim), lambda i, s, c, r: (i, 0)),
              pl.BlockSpec(memory_space=pl.ANY),   # w stays in HBM
          ],
          out_specs=pl.BlockSpec((bm, bn), lambda i, s, c, r: (i, c[s])),
          scratch_shapes=[
              pltpu.VMEM((bm, bn), jnp.float32),
              pltpu.VMEM((2, bk, bn), w.dtype),
              pltpu.SemaphoreType.DMA((2,)),
          ],
      ),
      out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
      interpret=interpret,
  )(cols, rows, x, w)


def _occupancy(cols, rows, nk, nn):
  """Reconstructs the (K/bk, N/bn) occupancy from the packing."""
  occ = jnp.zeros((nk, nn), jnp.int32)
  return occ.at[rows[:-1], cols[:-1]].set(1)


def _v4_impl(x, w, cols, rows, block, bm, interpret):
  if interpret is None:
    interpret = jax.default_backend() == 'cpu'
  m, kdim = x.shape
  _, n = w.shape
  bk, bn = block
  if m % bm or kdim % bk or n % bn:
    raise ValueError(f'shapes ({m},{kdim},{n}) must divide tiles '
                     f'bm={bm}, block={block}')
  if cols.shape[0] <= 1:  # no active blocks: the whole layer is zero
    return jnp.zeros((m, n), x.dtype)
  y = _v4_matmul(x, w, cols, rows, block, bm, interpret)
  # Columns with no active block are never visited by the kernel, so their
  # output tiles hold garbage — select (not multiply: 0 * garbage-NaN stays
  # NaN) zeros there.
  col_active = _occupancy(cols, rows, kdim // bk, n // bn).max(axis=0)
  return jnp.where(jnp.repeat(col_active, bn)[None, :] != 0, y, 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def block_sparse_matmul_v4(x, w, cols, rows,
                           block: Tuple[int, int] = (128, 128),
                           bm: int = 512,
                           interpret: Optional[bool] = None,
                           dw_mode: str = 'auto'):
  """y = x @ (mask * w) where mask's active blocks are (rows[s], cols[s]).

  cols/rows: int32 (n_active + 1,) column-major packing with one sentinel
  entry (pack_flat_active).  n_active is static via the array shape.
  """
  return _v4_impl(x, w, cols, rows, block, bm, interpret)


def _v4_fwd(x, w, cols, rows, block, bm, interpret, dw_mode):
  return _v4_impl(x, w, cols, rows, block, bm, interpret), (x, w, cols, rows)


def _v4_bwd(block, bm, interpret, dw_mode, residuals, gy):
  from rigl_tpu.ops.block_mask import expand_from_blocks
  from rigl_tpu.ops.pallas.block_sparse_v3 import (_AUTO_DENSITY,
                                                   _dw_blocksparse_v2)
  x, w, cols, rows = residuals
  if interpret is None:
    interpret = jax.default_backend() == 'cpu'
  bk, bn = block
  kdim, n = w.shape
  nk, nn = kdim // bk, n // bn
  occ = _occupancy(cols, rows, nk, nn)
  n_active = cols.shape[0] - 1

  # dx = gy @ w^T with the transposed packing (same static count).
  cols_t, rows_t = pack_flat_active(occ.T, n_active)
  dx = _v4_impl(gy, w.T, cols_t, rows_t, (bn, bk), bm, interpret)

  if dw_mode == 'auto':
    gather_bytes = _AUTO_DENSITY * nk * nn * (bk + bn)
    dw_mode = 'gather' if gather_bytes < (kdim + n) else 'dense'
  if dw_mode == 'dense':
    dw = jax.lax.dot_general(
        x, gy, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dw = (dw * expand_from_blocks(occ, (kdim, n), block)).astype(w.dtype)
  else:
    dw = _dw_blocksparse_v2(x, gy, occ, block, bm, w.dtype, interpret)
  return dx, dw, None, None


block_sparse_matmul_v4.defvjp(_v4_fwd, _v4_bwd)
