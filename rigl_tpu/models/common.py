"""Shared building blocks for the model zoo.

TPU conventions: NHWC layout (XLA's native conv layout on TPU), bfloat16
activations with float32 params/BN statistics (matching the reference's
bfloat16 scope, imagenet_train_eval.py:549-552), static shapes throughout.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
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


class _BlockConv(nn.Module):
  """Conv core that can execute through the block-sparse Pallas matmul.

  Drop-in replacement for the inner ``nn.Conv`` (same module name 'conv',
  same 'kernel' param shape/init, so param trees and checkpoints are
  identical).  Execution is chosen per call: if the caller supplied a
  'block_masks' collection entry for this layer (see
  ops/block_mask.py::block_mask_collection), a 1x1 kernel runs as the
  block-skipping matmul — inactive weight blocks cost neither HBM DMA nor
  MXU work.  Otherwise it is a plain XLA conv (dense-times-mask execution,
  the masked-weight semantics of the reference's masked_conv2d).
  """
  features: int
  kernel_size: int
  strides: int
  padding: str
  dtype: Dtype = jnp.float32
  use_bias: bool = False
  kernel_init: Callable = conv_kernel_init()
  block: Optional[Tuple[int, int]] = None
  block_bm: int = 512
  # Row tile for the tap kernel; None = default_tap_bm() (RIGL_TAP_BM).
  # Separate from block_bm: the tap grid needs a much larger bm, and a
  # caller must be able to pin either independently (incl. tap bm=512).
  block_tap_bm: Optional[int] = None

  @nn.compact
  def __call__(self, x):
    in_features = x.shape[-1]
    k = self.kernel_size
    kernel = self.param('kernel', self.kernel_init,
                        (k, k, in_features, self.features))
    x = x.astype(self.dtype)
    kernel = kernel.astype(self.dtype)
    block_mask = self.get_variable('block_masks', 'kernel', None)
    is_tap = isinstance(block_mask, dict) and 'taps' in block_mask
    if is_tap and k > 1:
      from rigl_tpu.ops.pallas.block_sparse_conv import tap_batch_ok
      # Spatial tap execution needs an aligned batch (the constant-shift
      # identity) and odd k (the kernel's symmetric ph=k//2 padding differs
      # from SAME for even k); 1x1s have no shifts, so neither applies.
      if not tap_batch_ok(x.shape[0]) or k % 2 == 0:
        block_mask = None  # dense fallback (mask already in the weights)
    if block_mask is not None and self.block is not None:
      if is_tap:
        # The direct shift-and-matmul tap kernel (1x1 = T=1 fast path).
        # Its row tile is independent of the matmul kernels' block_bm (tap
        # grid steps are (bm, 128, 128) dots — they need a much larger bm
        # to amortize per-step costs; default_tap_bm / RIGL_TAP_BM).
        from rigl_tpu.ops.pallas.block_sparse_conv import block_sparse_conv_tap
        xx = x[:, ::self.strides, ::self.strides, :] \
            if (k == 1 and self.strides > 1) else x
        y = block_sparse_conv_tap(
            xx, kernel, jax.lax.stop_gradient(block_mask), block=self.block,
            bm=self.block_tap_bm)
        if k > 1 and self.strides > 1:
          # Strided spatial conv: the input is already fixed-padded
          # (padding == 'VALID'), so the stride-1 SAME conv above computes
          # every window center; the strided output is every s-th center
          # starting at k//2.  The slice's autodiff scatters gy back to
          # the full grid (dilated), which the tap backward consumes as-is
          # — zero rows contribute zero terms in dx and dw.
          s = self.strides
          oh = (x.shape[1] - k) // s + 1
          ow = (x.shape[2] - k) // s + 1
          c = k // 2
          y = y[:, c:c + s * (oh - 1) + 1:s, c:c + s * (ow - 1) + 1:s, :]
      else:
        from rigl_tpu.ops import conv as bs_conv
        # Occupancy/v4-packed 1x1 entries route to the block-skipping
        # matmul kernels.
        y = bs_conv.block_sparse_conv1x1(
            x, kernel, jax.lax.stop_gradient(block_mask),
            stride=self.strides, block=self.block, bm=self.block_bm)
    else:
      # NOTE: a dense-1x1-as-dot formulation was tried here and beat the
      # conv form in isolation (scripts/bench_conv1x1_vs_dot.py, 1.04-2.4x)
      # but DOUBLED the full ResNet-50 step time for both training arms
      # (PERF.md) — inside the model, XLA's layout assignment for dots vs
      # convs forces conversions around every 1x1.  Keep XLA convs for
      # dense execution.
      y = jax.lax.conv_general_dilated(
          x, kernel, (self.strides, self.strides), self.padding,
          dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    if self.use_bias:
      y = y + self.param('bias', nn.initializers.zeros,
                         (self.features,)).astype(self.dtype)
    return y


class ConvFixedPad(nn.Module):
  """Conv with the reference's fixed padding for strided convs.

  `block`: optional (rows, cols) block shape enabling block-sparse
  execution for 1x1 kernels when the caller provides a 'block_masks'
  collection (models stay bit-identical in params either way).
  """
  features: int
  kernel_size: int
  strides: int = 1
  dtype: Dtype = jnp.float32
  use_bias: bool = False
  kernel_init: Callable = conv_kernel_init()
  block: Optional[Tuple[int, int]] = None
  block_bm: int = 512
  block_tap_bm: Optional[int] = None

  @nn.compact
  def __call__(self, x):
    if self.strides > 1:
      x = fixed_padding(x, self.kernel_size)
      padding = 'VALID'
    else:
      padding = 'SAME'
    if self.block is not None:
      return _BlockConv(
          self.features, self.kernel_size, self.strides, padding,
          dtype=self.dtype, use_bias=self.use_bias,
          kernel_init=self.kernel_init, block=self.block,
          block_bm=self.block_bm, block_tap_bm=self.block_tap_bm,
          name='conv')(x)
    return nn.Conv(
        self.features, (self.kernel_size, self.kernel_size),
        strides=(self.strides, self.strides),
        padding=padding,
        use_bias=self.use_bias,
        dtype=self.dtype,
        kernel_init=self.kernel_init,
        name='conv')(x)
