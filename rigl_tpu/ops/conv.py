"""Conv routing onto the block-sparse matmul kernels.

1x1 convolutions ARE matmuls over the channel dims — and they carry most of
a bottleneck ResNet's prunable parameters (conv1/conv3/projections).  This
module routes them through the block-sparse Pallas path; 3x3 convs remain
XLA convs (dense-times-mask) until the im2col block-sparse path lands
(NEXT.md).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from rigl_tpu.ops.pallas.block_sparse_v3 import block_sparse_matmul_v3


def _dispatch_matmul(x2d, kernel2d, block_mask, block, bm, interpret):
  """Occupancy array -> v3 kernel; {'cols','rows'} packing -> v4."""
  if isinstance(block_mask, dict):
    from rigl_tpu.ops.pallas.block_sparse_v4 import block_sparse_matmul_v4
    return block_sparse_matmul_v4(x2d, kernel2d, block_mask['cols'],
                                  block_mask['rows'], block, bm, interpret)
  return block_sparse_matmul_v3(x2d, kernel2d, block_mask, block, bm,
                                interpret)


def _matmul_2d(x4d, kernel2d, block_mask, block, bm, interpret,
               differentiable):
  """(N,H,W,Ci) -> (N,H,W,Co) through the block matmul, row-padded to bm."""
  n, h, w_dim, cin = x4d.shape
  cout = kernel2d.shape[-1]
  x2d = x4d.reshape(-1, cin)
  rows = x2d.shape[0]
  pad = (-rows) % bm
  if pad:
    x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
  if differentiable:
    y = _dispatch_matmul(x2d, kernel2d, block_mask, block, bm, interpret)
  elif isinstance(block_mask, dict):
    from rigl_tpu.ops.pallas.block_sparse_v4 import _v4_impl
    y = _v4_impl(x2d, kernel2d, block_mask['cols'], block_mask['rows'],
                 block, bm, interpret)
  else:
    from rigl_tpu.ops.pallas.block_sparse_v3 import _v3_impl
    y = _v3_impl(x2d, kernel2d, block_mask, block, bm, interpret)
  return y[:rows].reshape(n, h, w_dim, cout)


def _occupancy_of(block_mask, nk, nn):
  if isinstance(block_mask, dict):
    from rigl_tpu.ops.pallas.block_sparse_v4 import _occupancy
    return _occupancy(block_mask['cols'], block_mask['rows'], nk, nn)
  return block_mask


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _conv1x1_core(x, kernel2d, block_mask, block, bm, interpret):
  """1x1 NHWC conv (stride already applied) on the block-skipping matmul.

  custom_vjp at the *conv* level, not the matmul level: dw is emitted as a
  conv-backward-filter (`conv_general_dilated` with batch<->feature swapped
  dimension numbers) on the 4D tensors — the same op XLA autodiff produces
  for the dense arm.  A dot_general formulation of dw was measured to force
  layout conversions around the big activation operands inside conv models
  (PERF.md round-1: in-model dots doubled the ResNet-50 step).
  """
  return _matmul_2d(x, kernel2d, block_mask, block, bm, interpret,
                    differentiable=True)


def _conv1x1_fwd(x, kernel2d, block_mask, block, bm, interpret):
  y = _matmul_2d(x, kernel2d, block_mask, block, bm, interpret,
                 differentiable=False)
  return y, (x, kernel2d, block_mask)


def _conv1x1_bwd(block, bm, interpret, residuals, gy):
  from rigl_tpu.ops.block_mask import expand_from_blocks
  x, kernel2d, block_mask = residuals
  bk, bn = block
  cin, cout = kernel2d.shape
  nk, nn = cin // bk, cout // bn
  occ = _occupancy_of(block_mask, nk, nn)

  # dx = gy @ w^T with the transposed mask/packing (block skipping).
  if isinstance(block_mask, dict):
    from rigl_tpu.ops.pallas.block_sparse_v4 import pack_flat_active
    n_active = block_mask['cols'].shape[0] - 1
    cols_t, rows_t = pack_flat_active(occ.T, n_active)
    mask_t = {'cols': cols_t, 'rows': rows_t}
  else:
    mask_t = block_mask.T.astype(jnp.int32)
  dx = _matmul_2d(gy, kernel2d.T, mask_t, (bn, bk), bm, interpret,
                  differentiable=False)

  # dw[ci, co] = sum_{n,h,w} x[n,h,w,ci] * gy[n,h,w,co], emitted as a conv
  # whose batch/feature dims are swapped (XLA's native backward-filter form,
  # HBM-roofline on TPU for these shapes) — NOT a dot_general.
  dw4 = jax.lax.conv_general_dilated(
      x, gy, window_strides=(1, 1), padding='VALID',
      dimension_numbers=('CHWN', 'IHWO', 'NHWC'),
      preferred_element_type=jnp.float32)
  dw = dw4[:, 0, 0, :]
  dw = (dw * expand_from_blocks(occ, (cin, cout), block)).astype(
      kernel2d.dtype)
  return dx, dw, None


_conv1x1_core.defvjp(_conv1x1_fwd, _conv1x1_bwd)


def block_sparse_conv1x1(x: jnp.ndarray, kernel: jnp.ndarray,
                         block_mask: jnp.ndarray,
                         stride: int = 1,
                         block: Tuple[int, int] = (512, 512),
                         bm: int = 512,
                         interpret: Optional[bool] = None) -> jnp.ndarray:
  """NHWC 1x1 conv via the block-skipping matmul.

  Args:
    x: (N, H, W, Cin).
    kernel: (1, 1, Cin, Cout) or (Cin, Cout).
    block_mask: (Cin/bk, Cout/bn) occupancy, or {'cols','rows'} v4 packing.
    stride: spatial stride (exact for 1x1 kernels: subsample then matmul).
  """
  if kernel.ndim == 4:
    if kernel.shape[:2] != (1, 1):
      raise ValueError(f'not a 1x1 kernel: {kernel.shape}')
    kernel = kernel[0, 0]
  if stride > 1:
    # Outside the custom_vjp so autodiff scatters dx back to full resolution.
    x = x[:, ::stride, ::stride, :]
  if interpret is None:
    interpret = jax.default_backend() == 'cpu'
  return _conv1x1_core(x, kernel, block_mask, block, bm, interpret)


def block_sparse_conv2d(x: jnp.ndarray, kernel: jnp.ndarray,
                        block_mask: jnp.ndarray,
                        stride: int = 1,
                        padding: str = 'SAME',
                        block: Tuple[int, int] = (512, 512),
                        bm: int = 512,
                        interpret: Optional[bool] = None) -> jnp.ndarray:
  """General NHWC conv via patch extraction + block-sparse matmul.

  The kernel's 2D matmul view is (cin*kh*kw, cout) in im2col row order —
  the SAME view rigl_tpu.ops.block_mask pools over (_to_2d transposes conv
  kernels to (cin, kh, kw) rows), so a blockwise-trained conv mask plugs in
  directly.  Patch extraction (im2col) costs kh*kw x activation memory;
  profitable only when the layer's density is low enough that the skipped
  matmul work dominates — measure before enabling (block_mask_collection
  conv3x3 flag).

  Args:
    x: (N, H, W, Cin).
    kernel: (kh, kw, Cin, Cout).
    block_mask: (kh*kw*Cin/bk, Cout/bn) over (Cin, kh, kw)-ordered rows.
  """
  import jax.lax as lax
  kh, kw, cin, cout = kernel.shape
  if kh == 1 and kw == 1:
    return block_sparse_conv1x1(x, kernel, block_mask, stride, block, bm,
                                interpret)
  patches = lax.conv_general_dilated_patches(
      x, (kh, kw), (stride, stride), padding,
      dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
  n, oh, ow, patch_dim = patches.shape
  # conv_general_dilated_patches emits features ordered (Cin, kh, kw);
  # reorder the kernel's (kh, kw, Cin) rows to match.
  k2d = jnp.transpose(kernel, (2, 0, 1, 3)).reshape(patch_dim, cout)
  x2d = patches.reshape(-1, patch_dim)
  rows = x2d.shape[0]
  pad = (-rows) % bm
  if pad:
    x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
  y = _dispatch_matmul(x2d, k2d, block_mask, block, bm, interpret)
  return y[:rows].reshape(n, oh, ow, cout)
