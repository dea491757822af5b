"""Shared building blocks for the model zoo.

TPU conventions: NHWC layout (XLA's native conv layout on TPU), bfloat16
activations with float32 params/BN statistics (matching the reference's
bfloat16 scope, imagenet_train_eval.py:549-552), static shapes throughout.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

# Reference BN hyperparams: imagenet_resnet/resnet_model.py:37-38.
BATCH_NORM_DECAY = 0.9
BATCH_NORM_EPSILON = 1e-5

Dtype = Any


class TrainableModel(nn.Module):
  """Mixin-ish base: models expose mask-policy metadata for the trainer.

  `dense_layers()` lists param paths that stay dense by convention (e.g.
  MobileNet-v1 depthwise kernels, mobilenetv1_model.py:43), which the trainer
  turns into a custom_sparsity_map of zeros or excludes from masking.
  """

  def dense_layers(self) -> Sequence[str]:
    return ()


def batch_norm(train: bool, dtype=jnp.float32, name: Optional[str] = None,
               scale_init=nn.initializers.ones) -> nn.BatchNorm:
  return nn.BatchNorm(
      use_running_average=not train,
      momentum=BATCH_NORM_DECAY,
      epsilon=BATCH_NORM_EPSILON,
      dtype=dtype,
      name=name,
      scale_init=scale_init,
  )


def conv_kernel_init(scale: float = 2.0):
  """He/variance-scaling fan_out init, the reference's conv default
  (resnet_model.py uses variance_scaling with the truncated normal)."""
  return nn.initializers.variance_scaling(scale, 'fan_out', 'normal')


def fixed_padding(x: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
  """Explicit SAME-style padding independent of input size, matching
  conv2d_fixed_padding (imagenet_resnet/resnet_model.py:234-304): total pad
  = kernel_size - 1, asymmetric (beg = pad//2) for strided convs."""
  pad_total = kernel_size - 1
  pad_beg = pad_total // 2
  pad_end = pad_total - pad_beg
  return jnp.pad(x, [(0, 0), (pad_beg, pad_end), (pad_beg, pad_end), (0, 0)])


class ConvFixedPad(nn.Module):
  """Conv with the reference's fixed padding for strided convs."""
  features: int
  kernel_size: int
  strides: int = 1
  dtype: Dtype = jnp.float32
  use_bias: bool = False
  kernel_init: Callable = conv_kernel_init()

  @nn.compact
  def __call__(self, x):
    if self.strides > 1:
      x = fixed_padding(x, self.kernel_size)
      padding = 'VALID'
    else:
      padding = 'SAME'
    return nn.Conv(
        self.features, (self.kernel_size, self.kernel_size),
        strides=(self.strides, self.strides),
        padding=padding,
        use_bias=self.use_bias,
        dtype=self.dtype,
        kernel_init=self.kernel_init,
        name='conv')(x)
