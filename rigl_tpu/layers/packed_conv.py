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

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from rigl_tpu.layers.packed_dense import packed_kernel_matmul


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
  # Tensor parallelism: see packed_kernel_matmul (tp_shards stacked
  # column-group storage; tp_axis only on the instance inside shard_map).
  tp_shards: int = 1
  tp_axis: Optional[str] = None

  @nn.compact
  def __call__(self, x):
    cin = x.shape[-1]
    sh, sw = self.strides
    if sh != 1 or sw != 1:
      x = x[:, ::sh, ::sw, :]
    b, h, w, _ = x.shape
    x2d = x.reshape(b * h * w, cin).astype(self.dtype)
    y = packed_kernel_matmul(
        self, x2d, self.features, sparsity=self.sparsity, block=self.block,
        bm=self.bm, dtype=self.dtype, tp_shards=self.tp_shards,
        tp_axis=self.tp_axis)
    y = y.reshape(b, h, w, self.features)
    if self.use_bias:
      y = y + self.param('bias', nn.initializers.zeros,
                         (self.features,)).astype(self.dtype)
    return y
