"""Block-sparse matmul Pallas kernels for TPU.

The executable-sparsity path (BASELINE.json north star: "masked conv2d/matmul
forward-backward runs as block-sparse Pallas kernels ... rather than
dense-times-mask").  Works with block-granular masks from
rigl_tpu.ops.block_mask: the mask is constant over (bk x bn) weight blocks,
so whole MXU tiles are zero and can be skipped.

Three kernels cover a training step of y = x @ (mask * w):

  forward   y  = x @ w_masked        — skip k-tiles where mask[k, n] == 0
  dx        dx = g @ w_masked^T      — same skip, transposed mask indexing
  dw        dw = x^T @ g, *output*-masked — entire (k, n) output tiles whose
              mask block is zero are never computed (saves both MXU time and
              HBM writes; the dense-grad values at inactive blocks are only
              needed by RigL at update steps, where the trainer falls back to
              the dense path)

All kernels: fp32 accumulation scratch in VMEM, block mask prefetched to SMEM
(PrefetchScalarGridSpec), grid iterates k innermost so the accumulator lives
across the contraction.  `interpret=True` under CPU tests.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _is_cpu() -> bool:
  return jax.default_backend() == 'cpu'


def _fwd_kernel(mask_ref, x_ref, w_ref, o_ref, acc_ref):
  k = pl.program_id(2)
  j = pl.program_id(1)

  @pl.when(k == 0)
  def _():
    acc_ref[:] = jnp.zeros_like(acc_ref)

  @pl.when(mask_ref[k, j] != 0)
  def _():
    acc_ref[:] += jnp.dot(x_ref[:], w_ref[:],
                          preferred_element_type=jnp.float32)

  @pl.when(k == pl.num_programs(2) - 1)
  def _():
    o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _matmul_blocksparse(x, w, block_mask, block: Tuple[int, int],
                        bm: int, out_dtype, interpret: bool):
  """y[M,N] = x[M,K] @ w[K,N], skipping w-blocks where block_mask == 0.

  block_mask has shape (K/bk, N/bn) and indexes w blocks.
  """
  m, kdim = x.shape
  _, n = w.shape
  bk, bn = block
  grid = (m // bm, n // bn, kdim // bk)
  return pl.pallas_call(
      _fwd_kernel,
      grid_spec=pltpu.PrefetchScalarGridSpec(
          num_scalar_prefetch=1,
          grid=grid,
          in_specs=[
              pl.BlockSpec((bm, bk), lambda i, j, k, mref: (i, k)),
              pl.BlockSpec((bk, bn), lambda i, j, k, mref: (k, j)),
          ],
          out_specs=pl.BlockSpec((bm, bn), lambda i, j, k, mref: (i, j)),
          scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
      ),
      out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
      interpret=interpret,
  )(block_mask, x, w)


def _dw_kernel(mask_ref, x_ref, g_ref, o_ref, acc_ref):
  """dw[K,N] = x^T[K,M] @ g[M,N]; output tile (i=k-block, j=n-block) is
  skipped entirely when its mask block is zero."""
  mstep = pl.program_id(2)
  i = pl.program_id(0)
  j = pl.program_id(1)
  active = mask_ref[i, j] != 0

  @pl.when(mstep == 0)
  def _():
    acc_ref[:] = jnp.zeros_like(acc_ref)

  @pl.when(active)
  def _():
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], g_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

  @pl.when(mstep == pl.num_programs(2) - 1)
  def _():
    o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _dw_blocksparse(x, g, block_mask, block: Tuple[int, int], bm: int,
                    out_dtype, interpret: bool):
  m, kdim = x.shape
  _, n = g.shape
  bk, bn = block
  grid = (kdim // bk, n // bn, m // bm)
  return pl.pallas_call(
      _dw_kernel,
      grid_spec=pltpu.PrefetchScalarGridSpec(
          num_scalar_prefetch=1,
          grid=grid,
          in_specs=[
              pl.BlockSpec((bm, bk), lambda i, j, ms, mref: (ms, i)),
              pl.BlockSpec((bm, bn), lambda i, j, ms, mref: (ms, j)),
          ],
          out_specs=pl.BlockSpec((bk, bn), lambda i, j, ms, mref: (i, j)),
          scratch_shapes=[pltpu.VMEM((bk, bn), jnp.float32)],
      ),
      out_shape=jax.ShapeDtypeStruct((kdim, n), out_dtype),
      interpret=interpret,
  )(block_mask, x, g)


def _pad_to(x, multiple, axis):
  size = x.shape[axis]
  rem = size % multiple
  if rem == 0:
    return x, size
  pad = multiple - rem
  widths = [(0, 0)] * x.ndim
  widths[axis] = (0, pad)
  return jnp.pad(x, widths), size


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def block_sparse_matmul(x, w, block_mask, block: Tuple[int, int] = (128, 128),
                        bm: int = 128, interpret: Optional[bool] = None):
  """y = x @ (expanded(block_mask) * w) with block-skipping kernels.

  Args:
    x: (M, K) activations (M padded internally to a multiple of bm).
    w: (K, N) dense-stored weights; only blocks with block_mask != 0
      contribute.
    block_mask: (K//bk, N//bn) int32/float — nonzero = active block.
    block: (bk, bn) weight block size; multiples of the dtype tile
      (bf16: (16,128)); 128x128 aligns with the MXU.
    bm: activation row tile.
    interpret: force pallas interpreter (defaults to True on CPU).
  """
  return _fwd(x, w, block_mask, block, bm, interpret)[0]


def _fwd(x, w, block_mask, block, bm, interpret):
  interpret = _is_cpu() if interpret is None else interpret
  kdim, n = w.shape
  bk, bn = block
  if kdim % bk or n % bn:
    raise ValueError(
        f'w shape ({kdim},{n}) must divide block {block}; pad upstream')
  block_mask = block_mask.astype(jnp.int32)
  xp, m0 = _pad_to(x, bm, 0)
  y = _matmul_blocksparse(xp, w, block_mask, block, bm, x.dtype, interpret)
  return y[:m0], (x, w, block_mask)


def _bwd(block, bm, interpret, residuals, gy):
  x, w, block_mask = residuals
  interpret = _is_cpu() if interpret is None else interpret
  bk, bn = block
  gp, m0 = _pad_to(gy, bm, 0)
  xp, _ = _pad_to(x, bm, 0)
  # dx = gy @ w^T: contraction over N; mask indexed (n-block, k-block).
  dx = _matmul_blocksparse(
      gp, w.T, block_mask.T.astype(jnp.int32), (bn, bk), bm, x.dtype,
      interpret)[:m0]
  # dw = x^T @ gy, output-masked.
  dw = _dw_blocksparse(xp, gp, block_mask, block, bm, w.dtype, interpret)
  return dx, dw, None


block_sparse_matmul.defvjp(
    lambda x, w, bmk, block, bm, interp: _fwd(x, w, bmk, block, bm, interp),
    _bwd)


def dense_reference(x, w, block_mask, block: Tuple[int, int]):
  """Dense-times-expanded-mask reference for testing."""
  from rigl_tpu.ops.block_mask import expand_from_blocks
  mask = expand_from_blocks(block_mask.astype(w.dtype), w.shape, block)
  return x @ (mask * w)
