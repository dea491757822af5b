"""Conv routing onto the block-sparse matmul kernels.

1x1 convolutions ARE matmuls over the channel dims — and they carry most of
a bottleneck ResNet's prunable parameters (conv1/conv3/projections).  This
module routes them through the block-sparse Pallas path; 3x3 convs remain
XLA convs (dense-times-mask) until the im2col block-sparse path lands
(NEXT.md).
"""

from __future__ import annotations

from typing import Optional, Tuple

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
    block_mask: (Cin/bk, Cout/bn).
    stride: spatial stride (exact for 1x1 kernels: subsample then matmul).
  """
  if kernel.ndim == 4:
    if kernel.shape[:2] != (1, 1):
      raise ValueError(f'not a 1x1 kernel: {kernel.shape}')
    kernel = kernel[0, 0]
  if stride > 1:
    x = x[:, ::stride, ::stride, :]
  n, h, w_dim, cin = x.shape
  cout = kernel.shape[-1]
  x2d = x.reshape(-1, cin)
  rows = x2d.shape[0]
  pad = (-rows) % bm
  if pad:
    x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
  y = _dispatch_matmul(x2d, kernel, block_mask, block, bm, interpret)
  return y[:rows].reshape(n, h, w_dim, cout)


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
