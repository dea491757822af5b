"""ImageNet ResNet v1 family (18/34/50/101/152/200) — parity with
rigl/imagenet_resnet/resnet_model.py: conv-BN-relu ordering, bottleneck
blocks with zero-init'able final BN, projection shortcuts, width multiplier,
and first/last-layer pruning switches (resnet_model.py:628,722).

Depth table from resnet_model.py:771-796."""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from rigl_tpu.models import common

# depth -> (use_bottleneck, blocks per group)
DEPTHS = {
    18: (False, (2, 2, 2, 2)),
    34: (False, (3, 4, 6, 3)),
    50: (True, (3, 4, 6, 3)),
    101: (True, (3, 4, 23, 3)),
    152: (True, (3, 8, 36, 3)),
    200: (True, (3, 24, 36, 3)),
}


class _ResidualBlock(nn.Module):
  """Two 3x3 convs; projection shortcut on the first block of a group."""
  features: int
  stride: int
  use_projection: bool
  dtype: Any = jnp.float32
  block: Any = None
  block_bm: int = 512
  block_tap_bm: int | None = None

  @nn.compact
  def __call__(self, x, train: bool):
    shortcut = x
    if self.use_projection:
      shortcut = common.ConvFixedPad(self.features, 1, self.stride,
                                     dtype=self.dtype, block=self.block,
                                     block_bm=self.block_bm,
                                     block_tap_bm=self.block_tap_bm,
                                     name='proj')(x)
      shortcut = common.batch_norm(train, dtype=self.dtype,
                                   name='proj_bn')(shortcut)
    y = common.ConvFixedPad(self.features, 3, self.stride, dtype=self.dtype,
                            block=self.block, block_bm=self.block_bm,
                            block_tap_bm=self.block_tap_bm,
                            name='conv1')(x)
    y = common.batch_norm(train, dtype=self.dtype, name='bn1')(y)
    y = nn.relu(y)
    y = common.ConvFixedPad(self.features, 3, 1, dtype=self.dtype,
                            block=self.block, block_bm=self.block_bm,
                            block_tap_bm=self.block_tap_bm,
                            name='conv2')(y)
    # Final BN of each block initialized with gamma=0 so residual branches
    # start as identity (the reference relies on the TPU estimator's
    # equivalent trick for stable large-batch training).
    y = common.batch_norm(train, dtype=self.dtype, name='bn2',
                          scale_init=nn.initializers.zeros)(y)
    return nn.relu(y + shortcut)


class _BottleneckBlock(nn.Module):
  """1x1 reduce, 3x3, 1x1 expand (4x); projection on group entry."""
  features: int
  stride: int
  use_projection: bool
  dtype: Any = jnp.float32
  block: Any = None
  block_bm: int = 512
  block_tap_bm: int | None = None

  @nn.compact
  def __call__(self, x, train: bool):
    out_features = 4 * self.features
    shortcut = x
    if self.use_projection:
      shortcut = common.ConvFixedPad(out_features, 1, self.stride,
                                     dtype=self.dtype, block=self.block,
                                     block_bm=self.block_bm,
                                     block_tap_bm=self.block_tap_bm,
                                     name='proj')(x)
      shortcut = common.batch_norm(train, dtype=self.dtype,
                                   name='proj_bn')(shortcut)
    y = common.ConvFixedPad(self.features, 1, 1, dtype=self.dtype,
                            block=self.block, block_bm=self.block_bm,
                            block_tap_bm=self.block_tap_bm,
                            name='conv1')(x)
    y = common.batch_norm(train, dtype=self.dtype, name='bn1')(y)
    y = nn.relu(y)
    y = common.ConvFixedPad(self.features, 3, self.stride, dtype=self.dtype,
                            block=self.block, block_bm=self.block_bm,
                            block_tap_bm=self.block_tap_bm,
                            name='conv2')(y)
    y = common.batch_norm(train, dtype=self.dtype, name='bn2')(y)
    y = nn.relu(y)
    y = common.ConvFixedPad(out_features, 1, 1, dtype=self.dtype,
                            block=self.block, block_bm=self.block_bm,
                            block_tap_bm=self.block_tap_bm,
                            name='conv3')(y)
    y = common.batch_norm(train, dtype=self.dtype, name='bn3',
                          scale_init=nn.initializers.zeros)(y)
    return nn.relu(y + shortcut)


class ResNet(nn.Module):
  """ResNet v1.  `width` scales every group's channel count
  (resnet_model.py width_multiplier).

  `block`: optional (rows, cols) block-sparsity shape.  When set AND the
  caller provides a 'block_masks' collection (ops/block_mask.py), 1x1 convs
  whose channel dims the block divides execute through the block-skipping
  Pallas matmul instead of dense-times-mask — the executable-sparsity path
  the reference reserved flags for but never built
  (imagenet_train_eval.py:271-272).  Params are identical either way.
  """
  depth: int = 50
  num_classes: int = 1000
  width: float = 1.0
  dtype: Any = jnp.float32
  block: Any = None
  block_bm: int = 512
  block_tap_bm: int | None = None

  @nn.compact
  def __call__(self, x, train: bool = False):
    if self.depth not in DEPTHS:
      raise ValueError(f'Not a valid resnet_depth: {self.depth}')
    use_bottleneck, layers = DEPTHS[self.depth]
    block = _BottleneckBlock if use_bottleneck else _ResidualBlock

    x = x.astype(self.dtype)
    x = common.ConvFixedPad(int(64 * self.width), 7, 2, dtype=self.dtype,
                            name='initial_conv')(x)
    x = common.batch_norm(train, dtype=self.dtype, name='initial_bn')(x)
    x = nn.relu(x)
    x = common.fixed_padding(x, 3)
    x = nn.max_pool(x, (3, 3), strides=(2, 2), padding='VALID')

    for group, n_blocks in enumerate(layers):
      feats = int(64 * (2 ** group) * self.width)
      for i in range(n_blocks):
        stride = 2 if (group > 0 and i == 0) else 1
        x = block(feats, stride, use_projection=(i == 0), dtype=self.dtype,
                  block=self.block, block_bm=self.block_bm,
                  block_tap_bm=self.block_tap_bm,
                  name=f'group{group + 1}_block{i}')(x, train)

    x = jnp.mean(x, axis=(1, 2))
    x = nn.Dense(self.num_classes, dtype=self.dtype, name='final_dense')(x)
    return x

  def first_last_layer_map(self, prune_first_layer: bool,
                           prune_last_layer: bool):
    """custom_sparsity_map entries pinning first/last layers dense, the
    reference's prune_first_layer/prune_last_layer flags."""
    out = {}
    if not prune_first_layer:
      out['initial_conv/conv/kernel'] = 0.0
    if not prune_last_layer:
      out['final_dense/kernel'] = 0.0
    return out


def resnet(depth: int = 50, **kwargs) -> ResNet:
  return ResNet(depth=depth, **kwargs)
