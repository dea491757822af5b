"""Dense layer executing through the block-sparse Pallas kernel.

Drop-in alternative to MaskedDense when the mask is block-granular
(SparseTraining(block=...)): the forward/backward matmuls skip inactive
weight blocks' DMA and MXU work instead of multiplying by the mask.  The
element-level mask lives in the 'masks' collection exactly like MaskedDense
(so the same drop/grow machinery updates it); the kernel consumes its
block-pooled view.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from rigl_tpu.ops import block_mask as bm_lib
from rigl_tpu.ops.pallas.block_sparse_v3 import block_sparse_matmul_v3


class BlockSparseDense(nn.Module):
  """y = x @ (mask * kernel) + b with block-skipping execution.

  Requirements: kernel dims divisible by `block`, batch (flattened leading
  dims) handled by internal padding to `bm`.
  """
  features: int
  block: Tuple[int, int] = (512, 512)
  bm: int = 512
  use_bias: bool = True
  dtype: Any = jnp.float32
  kernel_init: Callable = nn.initializers.lecun_normal()
  bias_init: Callable = nn.initializers.zeros

  @nn.compact
  def __call__(self, x):
    in_features = x.shape[-1]
    bk, bn = self.block
    if in_features % bk or self.features % bn:
      raise ValueError(
          f'kernel ({in_features}, {self.features}) must divide block '
          f'{self.block}')
    kernel = self.param('kernel', self.kernel_init,
                        (in_features, self.features))
    mask = self.variable('masks', 'kernel', jnp.ones, kernel.shape,
                         jnp.float32)
    block_mask = (bm_lib.pool_to_blocks(mask.value, self.block, 'max')
                  > 0).astype(jnp.int32)

    lead = x.shape[:-1]
    x2d = x.reshape((-1, in_features)).astype(self.dtype)
    n_rows = x2d.shape[0]
    pad = (-n_rows) % self.bm
    if pad:
      x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
    y = block_sparse_matmul_v3(
        x2d, (kernel * mask.value).astype(self.dtype), block_mask,
        self.block, self.bm)
    y = y[:n_rows].reshape(lead + (self.features,))
    if self.use_bias:
      y = y + self.param('bias', self.bias_init,
                         (self.features,)).astype(self.dtype)
    return y
