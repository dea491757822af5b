"""MNIST MLPs: the 300-100-10 network of the original RigL MNIST experiments
(rigl/mnist/mnist_train_eval.py:112-160) and the parameter-budget MLP of the
JAX branch (experimental/jax/models/mnist_fc.py)."""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class MnistMLP(nn.Module):
  """300-100-10 fully-connected MNIST net.

  The reference's per-layer sparsity convention (mnist_train_eval.py:269-272):
  layer2 gets ``end_sparsity * sparsity_scale``, layer3 (output) stays dense —
  expose via ``custom_sparsity_map``.
  """
  features: Sequence[int] = (300, 100)
  num_classes: int = 10
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x, train: bool = False):
    x = x.reshape((x.shape[0], -1)).astype(self.dtype)
    for i, feat in enumerate(self.features):
      x = nn.Dense(feat, dtype=self.dtype, name=f'layer{i + 1}')(x)
      x = nn.relu(x)
    x = nn.Dense(self.num_classes, dtype=self.dtype,
                 name=f'layer{len(self.features) + 1}')(x)
    return x

  def custom_sparsity_map(self, end_sparsity: float,
                          sparsity_scale: float = 0.9) -> Dict[str, float]:
    n = len(self.features) + 1
    return {
        f'layer{n - 1}/kernel': end_sparsity * sparsity_scale,
        f'layer{n}/kernel': 0.0,
    }


def width_for_param_budget(param_count: int, depth: int, input_size: int = 784,
                           num_classes: int = 10) -> int:
  """Closed-form hidden width giving ~`param_count` params at `depth` hidden
  layers (parity with experimental/jax/models/mnist_fc.py:32-78)."""
  if depth == 0:
    raise ValueError('depth must be >= 1')
  # params = in*w + w + (depth-1)*(w^2 + w) + w*classes + classes
  a = depth - 1
  b = input_size + depth + num_classes
  c = num_classes - param_count
  if a == 0:
    return max(1, int(round(-c / b)))
  disc = b * b - 4 * a * c
  return max(1, int(round((-b + np.sqrt(disc)) / (2 * a))))


class BudgetMLP(nn.Module):
  """Depth-N MLP whose width is solved from a parameter budget."""
  param_count: int = 266200  # the 300-100 MLP's budget
  depth: int = 2
  num_classes: int = 10
  input_size: int = 784
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x, train: bool = False):
    x = x.reshape((x.shape[0], -1)).astype(self.dtype)
    width = width_for_param_budget(self.param_count, self.depth,
                                   self.input_size, self.num_classes)
    for i in range(self.depth):
      x = nn.Dense(width, dtype=self.dtype, name=f'layer{i + 1}')(x)
      x = nn.relu(x)
    return nn.Dense(self.num_classes, dtype=self.dtype,
                    name=f'layer{self.depth + 1}')(x)
