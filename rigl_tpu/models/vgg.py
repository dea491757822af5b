"""VGG-A/16/19 — parity with rigl/imagenet_resnet/vgg.py: config table at
vgg.py:57-62, fully-convolutional head (7x7 'fc6' conv + two 1x1 convs) with
dropout, as in vgg_net at vgg.py:64-201."""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax.numpy as jnp

from rigl_tpu.models import common

# convs per block, at widths (64, 128, 256, 512, 512).
_CONFIGS: Dict[str, Sequence[int]] = {
    'vgg_a': (1, 1, 2, 2, 2),
    'vgg_16': (2, 2, 3, 3, 3),
    'vgg_19': (2, 2, 4, 4, 4),
}
_WIDTHS = (64, 128, 256, 512, 512)


class VGG(nn.Module):
  variant: str = 'vgg_16'
  num_classes: int = 1000
  dropout_rate: float = 0.5
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x, train: bool = False):
    if self.variant not in _CONFIGS:
      raise ValueError(f'Unknown VGG variant: {self.variant}')
    cfg = _CONFIGS[self.variant]
    x = x.astype(self.dtype)
    for block, (n_convs, width) in enumerate(zip(cfg, _WIDTHS)):
      for i in range(n_convs):
        x = nn.Conv(width, (3, 3), padding='SAME', dtype=self.dtype,
                    kernel_init=common.conv_kernel_init(),
                    name=f'conv{block + 1}_{i + 1}')(x)
        x = nn.relu(x)
      x = nn.max_pool(x, (2, 2), strides=(2, 2))
    # Fully-convolutional classifier head.
    x = nn.Conv(4096, (7, 7), padding='VALID', dtype=self.dtype,
                name='fc6')(x)
    x = nn.relu(x)
    x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
    x = nn.Conv(4096, (1, 1), dtype=self.dtype, name='fc7')(x)
    x = nn.relu(x)
    x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
    x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name='fc8')(x)
    return jnp.squeeze(x, axis=(1, 2))
