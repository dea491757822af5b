"""Wide ResNet (6n+4, width k) for CIFAR — parity with
rigl/cifar_resnet/resnet_model.py (WideResNetModel.build at :70-126):
3x3 init conv (16), three groups of n pre-activation residual blocks at
16k/32k/64k channels with stride 1/2/2, final BN+relu, 8x8 average pool,
linear classifier.  Optional dropout inside blocks (droprate flag)."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from rigl_tpu.models import common


class _ResidualBlock(nn.Module):
  features: int
  stride: int = 1
  droprate: float = 0.0
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x, train: bool):
    # Pre-activation ordering (BN-relu-conv), as in the reference blocks.
    y = common.batch_norm(train, dtype=self.dtype, name='bn1')(x)
    y = nn.relu(y)
    shortcut = x
    if self.stride > 1 or x.shape[-1] != self.features:
      # Projection taken from the pre-activated tensor.
      shortcut = common.ConvFixedPad(
          self.features, 1, self.stride, dtype=self.dtype,
          name='proj')(y)
    y = common.ConvFixedPad(self.features, 3, self.stride, dtype=self.dtype,
                            name='conv1')(y)
    y = common.batch_norm(train, dtype=self.dtype, name='bn2')(y)
    y = nn.relu(y)
    if self.droprate > 0:
      y = nn.Dropout(self.droprate, deterministic=not train)(y)
    y = common.ConvFixedPad(self.features, 3, 1, dtype=self.dtype,
                            name='conv2')(y)
    return y + shortcut


class WideResNet(nn.Module):
  """depth must be 6n+4 (resnet_model.py:90-93); width is the multiplier k."""
  depth: int = 22
  width: int = 2
  num_classes: int = 10
  droprate: float = 0.0
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x, train: bool = False):
    if (self.depth - 4) % 6 != 0:
      raise ValueError('Depth of ResNet specified not sufficient.')
    n_blocks = (self.depth - 4) // 6
    x = x.astype(self.dtype)
    x = common.ConvFixedPad(16, 3, 1, dtype=self.dtype, name='init_conv')(x)
    for group, feats in enumerate((16 * self.width, 32 * self.width,
                                   64 * self.width)):
      for block in range(n_blocks):
        stride = 2 if (group > 0 and block == 0) else 1
        x = _ResidualBlock(
            feats, stride, self.droprate, dtype=self.dtype,
            name=f'group{group + 1}_block{block}')(x, train)
    x = common.batch_norm(train, dtype=self.dtype, name='final_bn')(x)
    x = nn.relu(x)
    x = jnp.mean(x, axis=(1, 2))
    x = nn.Dense(self.num_classes, dtype=self.dtype, name='logits')(x)
    return x
