"""PackedDense: a dense layer whose kernel IS packed block-sparse storage.

Unlike MaskedDense / BlockSparseDense (dense latent kernel + mask
multiply), the parameter tensor here is (n_active, bk, bn): memory,
gradient traffic, and optimizer state all scale with density, and the
premask invariant holds by construction.  The packing lives in the
'packing' variable collection; drop/grow updates go through
transforms/packed_training.py (which preserves n_active, so every shape is
static across the run).

Reference contrast: sparse_optimizers_base.py keeps full dense variables
for weights AND optimizer slots at any sparsity; size savings there exist
only at export.  Measured on v5e (PERF.md round-2 session 3): a 3x4096 MLP
train step on this path runs 3.3x (s=0.8) / 4.4x (s=0.9) faster than
dense, gross.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from rigl_tpu.ops.pallas.block_sparse_packed import (make_packing,
                                                     packed_matmul)
from rigl_tpu.sparsity.distributions import get_n_zeros
from rigl_tpu.sparsity.layer_sparsity import resolve_sparsity


def random_occupancy(key: jax.Array, nk: int, nn_: int,
                     n_active: int) -> jnp.ndarray:
  """Exact-count random (nk, nn) occupancy grid."""
  scores = jax.random.uniform(key, (nk * nn_,))
  order = jnp.argsort(-scores)
  grid = jnp.zeros((nk * nn_,), jnp.int32).at[order[:n_active]].set(1)
  return grid.reshape(nk, nn_)


def _pad_rows(x2d, bm: int):
  """Pad rows up to a multiple of the row tile.  For row counts below bm
  (decode-time batches, tiny eval batches) the tile shrinks to the
  16-aligned row count instead — padding a batch-8 decode step up to the
  512-row training tile would multiply the MXU work 64x for zero output."""
  n_rows = x2d.shape[0]
  bm = min(bm, max(16, -(-n_rows // 16) * 16))
  pad = (-n_rows) % bm
  if pad:
    x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
  return x2d, bm, n_rows


def packed_kernel_matmul(mod: nn.Module, x2d, features: int, *,
                         sparsity, block: Tuple[int, int], bm: int,
                         dtype, tp_shards: int = 1,
                         tp_axis: Optional[str] = None):
  """Declares a packed 'kernel' param + 'packing' variable on `mod`
  (an nn.Module in compact scope) and returns x2d @ W, rows padded to the
  row-panel size internally and cropped back.

  `sparsity` is a float (uniform) or a SparsityMap / {path: float} dict
  resolved by this layer's module path — the per-layer (ERK/custom)
  plumbing the reference wires at imagenet_train_eval.py:308-316; see
  sparsity/layer_sparsity.py.

  The single shared engine behind PackedDense and PackedConv1x1.  Active
  positions get the per-element scale a dense lecun-normal kernel would
  (stddev 1/sqrt(dense fan-in)) — matches the premasked-dense convention
  without materializing a dense tensor.

  Tensor parallelism (`tp_shards=n`): the kernel is stored as n stacked
  output-column groups `(n, cap, bk, bn)` with exactly cap = n_active/n
  active blocks per group (parallel/packed_tp.py's balanced layout; the
  count is rounded to a multiple of n).  Outside shard_map the groups are
  computed in sequence and concatenated — bit-identical math to a
  single-group layer with the same occupancy.  Inside a shard_map whose
  `tp_axis` mesh axis shards the leading group axis, each device computes
  only its group's columns and the output is all-gathered
  (slice-backward: packed_tp.gather_columns_for_tp); dx cotangents are
  psum'd via replicate_for_tp (identity fwd).  Set `tp_axis` ONLY on the
  model instance applied inside shard_map.
  """
  sparsity = resolve_sparsity(sparsity, mod.path)
  in_features = x2d.shape[-1]
  bk, bn = block
  if in_features % bk or features % bn:
    raise ValueError(f'({in_features}, {features}) must divide '
                     f'block {block}')
  nk, nn_ = in_features // bk, features // bn
  n_total = nk * nn_
  n_active = n_total - get_n_zeros(n_total, sparsity)

  if tp_shards > 1:
    return _tp_kernel_matmul(mod, x2d, features, nk, nn_, n_active,
                             block=block, bm=bm, dtype=dtype,
                             tp_shards=tp_shards, tp_axis=tp_axis)

  packing = mod.variable(
      'packing', 'kernel',
      lambda: make_packing(
          random_occupancy(mod.make_rng('params'), nk, nn_, n_active),
          n_active))
  kernel = mod.param(
      'kernel',
      lambda key, shape: (jax.random.normal(key, shape)
                          / np.sqrt(in_features)).astype(jnp.float32),
      (n_active, bk, bn))

  x2d, bm, n_rows = _pad_rows(x2d, bm)
  y = packed_matmul(x2d, kernel.astype(dtype), packing.value, block, bm)
  return y[:n_rows]


def _tp_kernel_matmul(mod, x2d, features, nk, nn_, n_active, *, block, bm,
                      dtype, tp_shards, tp_axis):
  from rigl_tpu.parallel import packed_tp as tp

  in_features = x2d.shape[-1]
  nm = tp_shards
  if nn_ % nm:
    raise ValueError(f'{features}/{block[1]}={nn_} block '
                     f'columns must divide tp_shards={nm}')
  nn_local = nn_ // nm
  # Balanced layout: the per-group count is the static shard shape, so
  # n_active rounds to the nearest multiple of tp_shards (>= tp_shards).
  n_active = min(nk * nn_, max(nm, int(round(n_active / nm)) * nm))
  cap = n_active // nm
  # Inside shard_map the leading group axis is sharded over tp_axis:
  # params/packings arrive (and must be declared) with the LOCAL count.
  nm_store = nm if tp_axis is None else nm // jax.lax.axis_size(tp_axis)

  def init_packing():
    keys = jax.random.split(mod.make_rng('params'), nm_store)
    return tp.stack_packings([
        make_packing(random_occupancy(keys[g], nk, nn_local, cap), cap)
        for g in range(nm_store)])

  packing = mod.variable('packing', 'kernel', init_packing)
  kernel = mod.param(
      'kernel',
      lambda key, shape: (jax.random.normal(key, shape)
                          / np.sqrt(in_features)).astype(jnp.float32),
      (nm_store, cap) + tuple(block))

  x2d, bm, n_rows = _pad_rows(x2d, bm)
  if tp_axis is not None:
    x2d = tp.replicate_for_tp(x2d, tp_axis)
  nm_local = kernel.shape[0]         # 1 inside shard_map, tp_shards outside
  ys = [packed_matmul(x2d, kernel[g].astype(dtype),
                      tp.local_packing(packing.value, g), block, bm)
        for g in range(nm_local)]
  y = ys[0] if nm_local == 1 else jnp.concatenate(ys, axis=1)
  if tp_axis is not None:
    y = tp.gather_columns_for_tp(y, tp_axis, axis=1)
  return y[:n_rows]


class PackedDense(nn.Module):
  """y = x @ W + b with W stored packed at `sparsity`.

  Requires in_features % block[0] == 0 and features % block[1] == 0.
  The active-block count uses the same floor arithmetic as every mask in
  this package (distributions.get_n_zeros).

  Tensor parallelism: see packed_kernel_matmul (tp_shards stacked
  column-group storage; tp_axis only on the instance inside shard_map).

  `sparsity`: float (uniform) or SparsityMap (per-layer, resolved by
  this module's path — sparsity/layer_sparsity.py).
  """
  features: int
  sparsity: Any = 0.8
  block: Tuple[int, int] = (512, 512)
  bm: int = 512
  use_bias: bool = True
  dtype: Any = jnp.float32
  bias_init: Any = nn.initializers.zeros
  tp_shards: int = 1
  tp_axis: Optional[str] = None

  @nn.compact
  def __call__(self, x):
    in_features = x.shape[-1]
    lead = x.shape[:-1]
    x2d = x.reshape((-1, in_features)).astype(self.dtype)
    y = packed_kernel_matmul(
        self, x2d, self.features, sparsity=self.sparsity, block=self.block,
        bm=self.bm, dtype=self.dtype, tp_shards=self.tp_shards,
        tp_axis=self.tp_axis)
    y = y.reshape(lead + (self.features,))
    if self.use_bias:
      y = y + self.param('bias', self.bias_init,
                         (self.features,)).astype(self.dtype)
    return y
