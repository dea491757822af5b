"""LeNet-5 and small CNNs — parity with rigl_tf2/networks.py:25-53 (lenet5)
and the JAX branch's MNISTCNN/CIFAR10CNN (experimental/jax/models/)."""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from rigl_tpu.models import common


class LeNet5(nn.Module):
  """Conv(6,5x5)-pool-Conv(16,5x5)-pool-Dense(120)-Dense(84)-Dense(classes);
  VALID convs as in the Keras reference, optional BN."""
  num_classes: int = 10
  hidden_sizes: Sequence[int] = (6, 16, 120, 84)
  use_batch_norm: bool = False
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x, train: bool = False):
    h = self.hidden_sizes
    x = x.astype(self.dtype)

    def maybe_bn(x, name):
      if self.use_batch_norm:
        x = common.batch_norm(train, dtype=self.dtype, name=name)(x)
      return x

    x = nn.Conv(h[0], (5, 5), padding='VALID', dtype=self.dtype,
                name='conv1')(x)
    x = nn.relu(x)
    x = nn.max_pool(x, (2, 2), strides=(2, 2))
    x = maybe_bn(x, 'bn1')
    x = nn.Conv(h[1], (5, 5), padding='VALID', dtype=self.dtype,
                name='conv2')(x)
    x = nn.relu(x)
    x = nn.max_pool(x, (2, 2), strides=(2, 2))
    x = maybe_bn(x, 'bn2')
    x = x.reshape((x.shape[0], -1))
    x = nn.relu(nn.Dense(h[2], dtype=self.dtype, name='dense1')(x))
    x = maybe_bn(x, 'bn3')
    x = nn.relu(nn.Dense(h[3], dtype=self.dtype, name='dense2')(x))
    x = maybe_bn(x, 'bn4')
    return nn.Dense(self.num_classes, dtype=self.dtype, name='logits')(x)


class SmallCNN(nn.Module):
  """The JAX branch's MNISTCNN/CIFAR10CNN shape: conv stacks + dense head."""
  num_classes: int = 10
  conv_features: Sequence[int] = (32, 64)
  dense_features: Sequence[int] = (256,)
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x, train: bool = False):
    x = x.astype(self.dtype)
    for i, feats in enumerate(self.conv_features):
      x = nn.Conv(feats, (3, 3), padding='SAME', dtype=self.dtype,
                  name=f'conv{i + 1}')(x)
      x = nn.relu(x)
      x = nn.max_pool(x, (2, 2), strides=(2, 2))
    x = x.reshape((x.shape[0], -1))
    for i, feats in enumerate(self.dense_features):
      x = nn.relu(nn.Dense(feats, dtype=self.dtype, name=f'dense{i + 1}')(x))
    return nn.Dense(self.num_classes, dtype=self.dtype, name='logits')(x)
