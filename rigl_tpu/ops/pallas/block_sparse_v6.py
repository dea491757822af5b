"""Block-sparse matmul v6: fully auto-pipelined via scalar-prefetch index
maps — no manual DMA, no semaphores, no fori loops.

v2-v4 hand-rolled the weight gather (make_async_copy + double buffering);
measured per-grid-step fixed costs swamped the skipped work (PERF.md).  The
idiomatic TPU structure instead lets Mosaic's pipeliner do the gather: the
grid enumerates (row tile, packed active entry), and BlockSpec index_maps
read the packed coordinates from scalar-prefetch operands, so every w tile
is fetched with the same overlapped double-buffered pipeline a dense matmul
uses — the kernel body is just a dot-accumulate.

Key structure (cf. the official Pallas block-sparse example pattern):
  grid = (M/bm, n_entries);  entries sorted column-major
  x:   (bm, K) row panel, index (i, 0)           — resident across entries
  w:   (bk, bn) tile, index (rows[s], cols[s])   — auto-gathered
  out: (bm, bn) tile, index (i, cols[s])         — revisited consecutively;
       accumulator resets on column change, flushes on the last entry
Empty columns: packing appends one dummy entry per output column
(valid=0), so every output tile is visited and zero-filled — and the entry
count n_active + nn stays STATIC as the mask evolves (drop/grow preserves
the active-block count; which columns are empty may change).

Reference semantics: y = x @ (expand(block_mask) * w), gradients restricted
to active blocks — identical to sparse_optimizers_base.py's dense-math-
under-masks, executed sparsely.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_columns(block_mask: jnp.ndarray, n_active: int):
  """(nk, nn) occupancy -> (cols, rows, valid), each (n_active + nn,).

  Column-major actives plus exactly one dummy (valid=0, row 0) per output
  column, placed at the END of its column run.  n_active must equal the
  true active count (static through drop/grow training).  Traceable: pure
  argsort/cumsum, no host sync.
  """
  nk, nn = block_mask.shape
  occ = block_mask.astype(jnp.int32)
  n_entries = n_active + nn
  # Real entries keyed (col, row); dummies keyed (col, nk) sort to the end
  # of their column run.
  key_real = (jax.lax.broadcasted_iota(jnp.int32, (nk, nn), 1) * (nk + 1)
              + jax.lax.broadcasted_iota(jnp.int32, (nk, nn), 0))
  key_real = jnp.where(occ > 0, key_real, (nn + 1) * (nk + 1)).T.reshape(-1)
  key_dummy = jnp.arange(nn, dtype=jnp.int32) * (nk + 1) + nk
  keys = jnp.concatenate([key_real, key_dummy])
  order = jnp.argsort(keys, stable=True)[:n_entries]
  keys = keys[order]
  cols = keys // (nk + 1)
  rows = jnp.where(keys % (nk + 1) == nk, 0, keys % (nk + 1))
  valid = (keys % (nk + 1) != nk).astype(jnp.int32)
  return (cols.astype(jnp.int32), rows.astype(jnp.int32), valid)


def _v6_kernel(cols_ref, rows_ref, valid_ref, x_ref, w_ref, o_ref, acc_ref,
               *, bk, transpose_w):
  s = pl.program_id(1)
  ns = pl.num_programs(1)
  first = jnp.logical_or(s == 0, cols_ref[s] != cols_ref[jnp.maximum(s - 1,
                                                                     0)])

  @pl.when(first)
  def _():
    acc_ref[:] = jnp.zeros_like(acc_ref)

  @pl.when(valid_ref[s] != 0)
  def _():
    k = rows_ref[s] * bk
    xt = x_ref[:, pl.ds(k, bk)]
    if transpose_w:
      acc_ref[:] += jax.lax.dot_general(
          xt, w_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
          preferred_element_type=jnp.float32)
    else:
      acc_ref[:] += jnp.dot(xt, w_ref[:],
                            preferred_element_type=jnp.float32)

  last = jnp.logical_or(s == ns - 1,
                        cols_ref[jnp.minimum(s + 1, ns - 1)] != cols_ref[s])

  @pl.when(last)
  def _():
    o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _v6_call(x, w, cols, rows, valid, block, bm, interpret, transpose_w,
             n_out):
  m, kdim = x.shape
  bk, bn = block
  n_entries = cols.shape[0]
  kernel = functools.partial(_v6_kernel, bk=bk, transpose_w=transpose_w)
  if transpose_w:
    # w stored (n_out_blocks... ) — tiles are (bn_rows, bk) of w whose
    # contraction axis is its SECOND dim; index (cols→w rows) swaps below.
    w_spec = pl.BlockSpec((bn, bk), lambda i, s, c, r, v: (c[s], r[s]))
  else:
    w_spec = pl.BlockSpec((bk, bn), lambda i, s, c, r, v: (r[s], c[s]))
  return pl.pallas_call(
      kernel,
      grid_spec=pltpu.PrefetchScalarGridSpec(
          num_scalar_prefetch=3,
          grid=(m // bm, n_entries),
          in_specs=[
              pl.BlockSpec((bm, kdim), lambda i, s, c, r, v: (i, 0)),
              w_spec,
          ],
          out_specs=pl.BlockSpec((bm, bn),
                                 lambda i, s, c, r, v: (i, c[s])),
          scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
      ),
      out_shape=jax.ShapeDtypeStruct((m, n_out), x.dtype),
      interpret=interpret,
  )(cols, rows, valid, x, w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def block_sparse_matmul_v6(x, w, packing,
                           block: Tuple[int, int] = (512, 512),
                           bm: int = 512,
                           interpret: Optional[bool] = None,
                           dw_mode: str = 'dense'):
  """y = x @ (expand(block_mask) * w) via the auto-pipelined entry grid.

  packing: dict with 'fwd' and 'bwd' = (cols, rows, valid) from
  pack_columns(occ) and pack_columns(occ.T) respectively (build once per
  mask update, not per step).
  """
  return _v6_fwd(x, w, packing, block, bm, interpret, dw_mode)[0]


def _v6_fwd(x, w, packing, block, bm, interpret, dw_mode):
  if interpret is None:
    interpret = jax.default_backend() == 'cpu'
  cols, rows, valid = packing['fwd']
  y = _v6_call(x, w, cols, rows, valid, block, bm, interpret, False,
               w.shape[1])
  return y, (x, w, packing)


def _v6_bwd(block, bm, interpret, dw_mode, residuals, gy):
  x, w, packing = residuals
  if interpret is None:
    interpret = jax.default_backend() == 'cpu'
  bk, bn = block
  # dx = gy @ w^T over the transposed packing — w tiles fetched in their
  # stored orientation, contracted on their N axis (no w.T materialization).
  cols_t, rows_t, valid_t = packing['bwd']
  dx = _v6_call(gy, w, cols_t, rows_t, valid_t, (bn, bk), bm, interpret,
                True, w.shape[0])
  # dw: contraction axis (M) carries no sparsity — one MXU-bound dense pass
  # masked to active blocks wins at these shapes (PERF.md); grads only at
  # active blocks, matching the latent-weight reference semantics.
  kdim, n = w.shape
  cols, rows, valid = packing['fwd']
  dw = jax.lax.dot_general(
      x, gy, dimension_numbers=(((0,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)
  occ = jnp.zeros((kdim // bk, n // bn), jnp.float32).at[
      rows, cols].max(valid.astype(jnp.float32))
  mask = jnp.repeat(jnp.repeat(occ, bk, axis=0), bn, axis=1)
  dw = (dw * mask).astype(w.dtype)
  return dx, dw, None


block_sparse_matmul_v6.defvjp(_v6_fwd, _v6_bwd)


def make_packing(block_mask: jnp.ndarray, n_active: int):
  """Both orientations of pack_columns for block_sparse_matmul_v6."""
  return {'fwd': pack_columns(block_mask, n_active),
          'bwd': pack_columns(block_mask.T, n_active)}
