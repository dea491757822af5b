"""MobileNet v1/v2 — parity with rigl/imagenet_resnet/mobilenetv1_model.py and
mobilenetv2_model.py.  Convention preserved from the reference: 3x3 depthwise
kernels are NEVER pruned (depthwise_conv2d_fixed_padding has no pruning arg,
mobilenetv1_model.py:43); only 1x1 pointwise/expansion convs and the
classifier carry masks.  `dense_layer_paths()` exposes that policy."""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from rigl_tpu.models import common

# MobileNet-v1 blocks: (pointwise features, stride) after the stem.
_V1_BLOCKS: Sequence[Tuple[int, int]] = (
    (64, 1), (128, 2), (128, 1), (256, 2), (256, 1), (512, 2),
    (512, 1), (512, 1), (512, 1), (512, 1), (512, 1), (1024, 2), (1024, 1),
)

# MobileNet-v2 inverted residual config: (expansion t, channels c, repeats n,
# stride s) — mobilenetv2_model.py generator.
_V2_BLOCKS: Sequence[Tuple[int, int, int, int]] = (
    (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
    (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
)


def _depthwise(x, stride: int, dtype, name: str):
  features = x.shape[-1]
  if stride > 1:
    x = common.fixed_padding(x, 3)
    padding = 'VALID'
  else:
    padding = 'SAME'
  return nn.Conv(
      features, (3, 3), strides=(stride, stride), padding=padding,
      feature_group_count=features, use_bias=False, dtype=dtype,
      kernel_init=common.conv_kernel_init(), name=name)(x)


class MobileNetV1(nn.Module):
  width: float = 1.0
  num_classes: int = 1000
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x, train: bool = False):
    w = self.width
    x = x.astype(self.dtype)
    x = common.ConvFixedPad(int(32 * w), 3, 2, dtype=self.dtype,
                            name='initial_conv')(x)
    x = common.batch_norm(train, dtype=self.dtype, name='initial_bn')(x)
    x = nn.relu6(x)
    for i, (feats, stride) in enumerate(_V1_BLOCKS):
      x = _depthwise(x, stride, self.dtype, name=f'block{i}_depthwise')
      x = common.batch_norm(train, dtype=self.dtype, name=f'block{i}_dw_bn')(x)
      x = nn.relu6(x)
      x = nn.Conv(int(feats * w), (1, 1), use_bias=False, dtype=self.dtype,
                  kernel_init=common.conv_kernel_init(),
                  name=f'block{i}_pointwise')(x)
      x = common.batch_norm(train, dtype=self.dtype, name=f'block{i}_pw_bn')(x)
      x = nn.relu6(x)
    x = jnp.mean(x, axis=(1, 2))
    x = nn.Dense(self.num_classes, dtype=self.dtype, name='conv_preds')(x)
    return x

  def dense_layer_paths(self) -> List[str]:
    """Depthwise kernels stay dense (reference convention)."""
    return [f'block{i}_depthwise/kernel' for i in range(len(_V1_BLOCKS))]


class _InvertedResidual(nn.Module):
  expansion: int
  features: int
  stride: int
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x, train: bool):
    in_feats = x.shape[-1]
    y = x
    if self.expansion != 1:
      y = nn.Conv(in_feats * self.expansion, (1, 1), use_bias=False,
                  dtype=self.dtype, kernel_init=common.conv_kernel_init(),
                  name='expand')(y)
      y = common.batch_norm(train, dtype=self.dtype, name='expand_bn')(y)
      y = nn.relu6(y)
    y = _depthwise(y, self.stride, self.dtype, name='depthwise')
    y = common.batch_norm(train, dtype=self.dtype, name='dw_bn')(y)
    y = nn.relu6(y)
    y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                kernel_init=common.conv_kernel_init(), name='project')(y)
    y = common.batch_norm(train, dtype=self.dtype, name='project_bn')(y)
    if self.stride == 1 and in_feats == self.features:
      y = y + x
    return y


class MobileNetV2(nn.Module):
  width: float = 1.0
  num_classes: int = 1000
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x, train: bool = False):
    w = self.width
    x = x.astype(self.dtype)
    x = common.ConvFixedPad(int(32 * w), 3, 2, dtype=self.dtype,
                            name='initial_conv')(x)
    x = common.batch_norm(train, dtype=self.dtype, name='initial_bn')(x)
    x = nn.relu6(x)
    idx = 0
    for t, c, n, s in _V2_BLOCKS:
      for i in range(n):
        x = _InvertedResidual(t, int(c * w), s if i == 0 else 1,
                              dtype=self.dtype, name=f'block{idx}')(x, train)
        idx += 1
    x = nn.Conv(int(1280 * max(1.0, w)), (1, 1), use_bias=False,
                dtype=self.dtype, kernel_init=common.conv_kernel_init(),
                name='head_conv')(x)
    x = common.batch_norm(train, dtype=self.dtype, name='head_bn')(x)
    x = nn.relu6(x)
    x = jnp.mean(x, axis=(1, 2))
    x = nn.Dense(self.num_classes, dtype=self.dtype, name='conv_preds')(x)
    return x

  def dense_layer_paths(self) -> List[str]:
    n_blocks = sum(n for _, _, n, _ in _V2_BLOCKS)
    return [f'block{i}/depthwise/kernel' for i in range(n_blocks)]
