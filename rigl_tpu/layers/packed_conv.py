"""PackedConv1x1: a 1x1 convolution whose kernel IS packed block-sparse
storage.

A 1x1 conv is a matmul over the channel dim ((B*H*W, Cin) @ (Cin, Cout)),
so it rides the same packed engine as PackedDense: weights, grads, and
optimizer slots all (n_active, bk, bn) — O(density) memory for the conv
families the reference sparsifies (ResNet bottleneck 1x1s are ~58% of
RN50's parameters; reference keeps dense latents for all of them,
sparse_optimizers_base.py).  Wall-clock on RN50 stays activation-bound
(PERF.md roofline) — the win here is memory: weights + momentum at
density x dense lets a chip hold bigger batches / deeper models.

Drop/grow goes through transforms/packed_training.py, identical semantics
to PackedDense (block-pooled |w| drop, pooled |dense grad| grow).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from rigl_tpu.layers.packed_dense import random_occupancy
from rigl_tpu.ops.pallas.block_sparse_packed import (make_packing,
                                                     packed_matmul)
from rigl_tpu.sparsity.distributions import get_n_zeros


class PackedConv1x1(nn.Module):
  """y[b,h,w,:] = x[b,h,w,:] @ W + b with W stored packed at `sparsity`.

  Strides/padding are trivial for 1x1 SAME convs; `strides` subsamples the
  spatial grid before the matmul (equivalent to conv with that stride).
  """
  features: int
  sparsity: float = 0.8
  block: Tuple[int, int] = (128, 128)
  bm: int = 512
  strides: Tuple[int, int] = (1, 1)
  use_bias: bool = False
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x):
    cin = x.shape[-1]
    bk, bn = self.block
    if cin % bk or self.features % bn:
      raise ValueError(f'({cin}, {self.features}) must divide '
                       f'block {self.block}')
    sh, sw = self.strides
    if sh != 1 or sw != 1:
      x = x[:, ::sh, ::sw, :]
    nk, nn_ = cin // bk, self.features // bn
    n_total = nk * nn_
    n_active = n_total - get_n_zeros(n_total, self.sparsity)

    packing = self.variable(
        'packing', 'kernel',
        lambda: make_packing(
            random_occupancy(self.make_rng('params'), nk, nn_, n_active),
            n_active))
    kernel = self.param(
        'kernel',
        lambda key, shape: (jax.random.normal(key, shape)
                            / np.sqrt(cin)).astype(jnp.float32),
        (n_active, bk, bn))

    b, h, w, _ = x.shape
    x2d = x.reshape(b * h * w, cin).astype(self.dtype)
    n_rows = x2d.shape[0]
    pad = (-n_rows) % self.bm
    if pad:
      x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
    y = packed_matmul(x2d, kernel.astype(self.dtype), packing.value,
                      self.block, self.bm)
    y = y[:n_rows].reshape(b, h, w, self.features)
    if self.use_bias:
      y = y + self.param('bias', nn.initializers.zeros,
                         (self.features,)).astype(self.dtype)
    return y
