"""Packed block-sparse convolutions: 1x1 (matmul engine) and spatial KxK.

PackedConv1x1: a 1x1 conv is a matmul over the channel dim
((B*H*W, Cin) @ (Cin, Cout)), so it rides the same packed engine as
PackedDense: weights, grads, and optimizer slots all (n_active, bk, bn) —
O(density) memory for the conv families the reference sparsifies (ResNet
bottleneck 1x1s are ~58% of RN50's parameters; reference keeps dense
latents for all of them, sparse_optimizers_base.py).

PackedConv: spatial KxK convs — the reference's flagship layer family
(resnet_model.py:306-501; 3x3s are 48% of RN50 conv FLOPs at ERK-80) —
with the SAME O(density) persistent state.  The kernel is packed storage
over the conv's (kh*kw*Cin, Cout) 2D matmul view (cin-minor row order,
identical to ops/block_mask._to_2d), so drop/grow, optimizer-slot
permutation, and checkpointing reuse the generic packed machinery
unchanged (transforms/packed_training.flax_packed_rigl_update).

Execution engines:
  * 'xla' (default): unpack the packed blocks to a TRANSIENT dense
    (kh,kw,Cin,Cout) view each step and run XLA's native conv.  Persistent
    memory — weights, gradients (the unpack vjp gathers straight back to
    packed), momentum — is O(density); the dense view is workspace only.
    This is the measured-routing answer: on activation-HBM-bound ResNet
    shapes XLA's fused dense conv beats every sparse-execution kernel
    end-to-end (PERF.md), so the honest default converts the MEMORY, not
    the already-roofline-bound wall clock.
  * 'tap': the shift-and-matmul block-sparse tap kernel
    (ops/pallas/block_sparse_conv.py) fed from the same packed storage
    (tap grid derived from the 2D packing; weights unpacked transiently
    for the kernel's per-active-block DMAs) — MXU work scales with
    density; for the compute-bound shapes where the tap kernel wins
    isolated (PERF.md v5 notes).

Wall-clock on RN50 stays activation-bound (PERF.md roofline) — the win
here is memory: weights + momentum at density x dense lets a chip hold
bigger batches / deeper models.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from rigl_tpu.layers.packed_dense import (packed_kernel_matmul,
                                          random_occupancy)
from rigl_tpu.ops.pallas.block_sparse_packed import (make_packing,
                                                     unpack_dense)
from rigl_tpu.sparsity.distributions import get_n_zeros
from rigl_tpu.sparsity.layer_sparsity import resolve_sparsity


class PackedConv1x1(nn.Module):
  """y[b,h,w,:] = x[b,h,w,:] @ W + b with W stored packed at `sparsity`.

  Strides/padding are trivial for 1x1 SAME convs; `strides` subsamples the
  spatial grid before the matmul (equivalent to conv with that stride).

  `sparsity`: float (uniform) or SparsityMap (per-layer, resolved by
  this module's path — sparsity/layer_sparsity.py).
  """
  features: int
  sparsity: Any = 0.8
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


class _KernelHolder(nn.Module):
  """Declares the dense-twin 'kernel' (K, N); see DenseConvTwin."""
  k: int
  n: int

  @nn.compact
  def __call__(self):
    return self.param('kernel', nn.initializers.zeros, (self.k, self.n))


def _conv2d(x, w4d, strides, dtype):
  return jax.lax.conv_general_dilated(
      x.astype(dtype), w4d.astype(dtype), window_strides=strides,
      padding='SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


class PackedConv(nn.Module):
  """KxK SAME conv whose kernel IS packed block-sparse storage over the
  (kh*kw*Cin, Cout) 2D view (module docstring).  Requires
  Cin % block[0] == 0 (blocks stay within one tap — what the tap engine
  and the conv's natural 2D view both need) and Cout % block[1] == 0.
  """
  features: int
  kernel_size: Tuple[int, int] = (3, 3)
  sparsity: Any = 0.8              # float or SparsityMap (layer_sparsity)
  block: Tuple[int, int] = (16, 16)
  bm: int = 2048                 # tap engine row tile; unused by 'xla'
  strides: Tuple[int, int] = (1, 1)
  use_bias: bool = False
  dtype: Any = jnp.float32
  engine: str = 'xla'            # 'xla' | 'tap'

  @nn.compact
  def __call__(self, x):
    cin = x.shape[-1]
    kh, kw = self.kernel_size
    bk, bn = self.block
    if cin % bk or self.features % bn:
      raise ValueError(f'channels ({cin},{self.features}) must divide '
                       f'block {self.block}')
    sparsity = resolve_sparsity(self.sparsity, self.path)
    k2d = kh * kw * cin
    nk, nn_ = k2d // bk, self.features // bn
    n_total = nk * nn_
    n_active = n_total - get_n_zeros(n_total, sparsity)

    packing = self.variable(
        'packing', 'kernel',
        lambda: make_packing(
            random_occupancy(self.make_rng('params'), nk, nn_, n_active),
            n_active))
    # Active positions get the per-element scale a dense lecun-normal conv
    # kernel would (stddev 1/sqrt(kh*kw*cin)).
    kernel = self.param(
        'kernel',
        lambda key, shape: (jax.random.normal(key, shape)
                            / np.sqrt(k2d)).astype(jnp.float32),
        (n_active, bk, bn))

    # TRANSIENT dense view: the unpack is a scatter whose vjp gathers the
    # dense cotangent straight back to packed layout, so gradient and
    # optimizer state never materialize densely.
    w2d = unpack_dense(kernel, packing.value, self.block, dtype=self.dtype)
    w4d = w2d.reshape(kh, kw, cin, self.features)
    if self.engine == 'tap' and self.strides == (1, 1) and (kh, kw) != (1, 1):
      from rigl_tpu.ops.pallas.block_sparse_conv import (
          block_sparse_conv_tap, pack_tap_active)
      from rigl_tpu.transforms.packed_training import occupancy_grid
      # Tap grid from the SAME 2D packing: 2D row r = tap * (cin/bk) + row.
      occ3 = occupancy_grid(packing.value).reshape(kh * kw, cin // bk, nn_)
      cols_t, rows_t, taps_t = pack_tap_active(occ3, n_active)
      y = block_sparse_conv_tap(
          x.astype(self.dtype), w4d,
          {'cols': cols_t, 'rows': rows_t, 'taps': taps_t},
          self.block, self.bm)
    else:
      y = _conv2d(x, w4d, self.strides, self.dtype)
    if self.use_bias:
      y = y + self.param('bias', nn.initializers.zeros,
                         (self.features,)).astype(self.dtype)
    return y


class DenseConvTwin(nn.Module):
  """Dense twin of PackedConv: identical conv math on a (kh*kw*Cin, Cout)
  'd/kernel' param — the unpack_dense view dense_twin_params produces —
  so packed (..., 'kernel') maps to the twin's (..., 'd', 'kernel') like
  every other packed layer family (train/packed_lm.dense_twin_params)."""
  features: int
  kernel_size: Tuple[int, int] = (3, 3)
  strides: Tuple[int, int] = (1, 1)
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x):
    cin = x.shape[-1]
    kh, kw = self.kernel_size
    w2d = _KernelHolder(kh * kw * cin, self.features, name='d')()
    w4d = w2d.reshape(kh, kw, cin, self.features)
    return _conv2d(x, w4d, self.strides, self.dtype)
