"""Module-level masking: flax layers carrying masks in a 'masks' collection.

The framework's primary masking path is the *functional overlay*
(rigl_tpu.sparsity.masks.apply_masks) — any flax model becomes sparse without
special layers.  These modules are the complementary capability of the
reference's layer-level masking (tensorflow model_pruning masked layers;
flax MaskedModule in experimental/jax/pruning/masked.py:55-112): the mask
lives with the module in a separate variable collection, is multiplied in
the forward pass, and checkpoints/inspects like any flax variable.

Usage:
  model = MaskedDense(100)
  vars = model.init(key, x)                 # vars['masks'] all-ones
  y = model.apply({'params': p, 'masks': m}, x)
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class MaskedDense(nn.Module):
  """Dense layer computing ``x @ (mask * kernel) + bias``."""
  features: int
  use_bias: bool = True
  dtype: Dtype = jnp.float32
  kernel_init: Callable = nn.initializers.lecun_normal()
  bias_init: Callable = nn.initializers.zeros

  @nn.compact
  def __call__(self, x):
    kernel = self.param('kernel', self.kernel_init,
                        (x.shape[-1], self.features))
    mask = self.variable('masks', 'kernel', jnp.ones, kernel.shape,
                         jnp.float32)
    y = jnp.dot(x.astype(self.dtype),
                (kernel * mask.value).astype(self.dtype))
    if self.use_bias:
      bias = self.param('bias', self.bias_init, (self.features,))
      y = y + bias.astype(self.dtype)
    return y


class MaskedConv(nn.Module):
  """Conv layer with a masked kernel (NHWC, HWIO kernel)."""
  features: int
  kernel_size: Tuple[int, int] = (3, 3)
  strides: Union[int, Tuple[int, int]] = 1
  padding: str = 'SAME'
  use_bias: bool = True
  feature_group_count: int = 1
  dtype: Dtype = jnp.float32
  kernel_init: Callable = nn.initializers.lecun_normal()
  bias_init: Callable = nn.initializers.zeros

  @nn.compact
  def __call__(self, x):
    strides = (self.strides,) * 2 if isinstance(self.strides, int) \
        else self.strides
    kshape = self.kernel_size + (x.shape[-1] // self.feature_group_count,
                                 self.features)
    kernel = self.param('kernel', self.kernel_init, kshape)
    mask = self.variable('masks', 'kernel', jnp.ones, kshape, jnp.float32)
    import jax.lax as lax
    y = lax.conv_general_dilated(
        x.astype(self.dtype), (kernel * mask.value).astype(self.dtype),
        window_strides=strides,
        padding=self.padding,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=self.feature_group_count)
    if self.use_bias:
      bias = self.param('bias', self.bias_init, (self.features,))
      y = y + bias.astype(self.dtype)
    return y


def masks_to_dict(variables) -> dict:
  """Flattens a model's 'masks' collection into the framework MaskDict."""
  import jax
  from rigl_tpu.sparsity.masks import path_str
  out = {}
  for path, leaf in jax.tree_util.tree_flatten_with_path(
      variables['masks'])[0]:
    out[path_str(path)] = leaf
  return out


def dict_to_masks(variables, mask_dict) -> dict:
  """Writes a MaskDict back into a 'masks' collection pytree."""
  import jax
  from rigl_tpu.sparsity.masks import path_str

  def f(path, leaf):
    return mask_dict.get(path_str(path), leaf)

  masks = jax.tree_util.tree_map_with_path(f, variables['masks'])
  return {**variables, 'masks': masks}
