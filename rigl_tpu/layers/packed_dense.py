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


def random_occupancy(key: jax.Array, nk: int, nn_: int,
                     n_active: int) -> jnp.ndarray:
  """Exact-count random (nk, nn) occupancy grid."""
  scores = jax.random.uniform(key, (nk * nn_,))
  order = jnp.argsort(-scores)
  grid = jnp.zeros((nk * nn_,), jnp.int32).at[order[:n_active]].set(1)
  return grid.reshape(nk, nn_)


class PackedDense(nn.Module):
  """y = x @ W + b with W stored packed at `sparsity`.

  Requires in_features % block[0] == 0 and features % block[1] == 0.
  The active-block count uses the same floor arithmetic as every mask in
  this package (distributions.get_n_zeros).

  Tensor parallelism: `tp_shards=n` stores the kernel as n stacked
  output-column groups `(n, cap, bk, bn)` with exactly cap = n_active/n
  active blocks per group (parallel/packed_tp.py's balanced layout; the
  count is rounded to a multiple of n).  Outside shard_map the groups are
  computed in sequence and concatenated — bit-identical math to a
  single-group layer with the same occupancy.  Inside a shard_map whose
  `tp_axis` mesh axis shards the leading group axis, each device computes
  only its group's columns and the output is all-gathered; dx cotangents
  are psum'd via replicate_for_tp (identity fwd).  Set `tp_axis` ONLY on
  the model instance applied inside shard_map.
  """
  features: int
  sparsity: float = 0.8
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
    bk, bn = self.block
    if in_features % bk or self.features % bn:
      raise ValueError(f'({in_features}, {self.features}) must divide '
                       f'block {self.block}')
    nk, nn_ = in_features // bk, self.features // bn
    n_total = nk * nn_
    n_active = n_total - get_n_zeros(n_total, self.sparsity)

    if self.tp_shards > 1:
      return self._tp_call(x, nk, nn_, n_active)

    packing = self.variable(
        'packing', 'kernel',
        lambda: make_packing(
            random_occupancy(self.make_rng('params'), nk, nn_, n_active),
            n_active))
    # Active positions get the same per-element scale a dense lecun-normal
    # kernel would (stddev 1/sqrt(dense fan-in)) — matches the premasked-
    # dense convention without materializing a dense tensor.
    kernel = self.param(
        'kernel',
        lambda key, shape: (jax.random.normal(key, shape)
                            / np.sqrt(in_features)).astype(jnp.float32),
        (n_active, bk, bn))

    lead = x.shape[:-1]
    x2d = x.reshape((-1, in_features)).astype(self.dtype)
    n_rows = x2d.shape[0]
    pad = (-n_rows) % self.bm
    if pad:
      x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
    y = packed_matmul(x2d, kernel.astype(self.dtype), packing.value,
                      self.block, self.bm)
    y = y[:n_rows].reshape(lead + (self.features,))
    if self.use_bias:
      y = y + self.param('bias', self.bias_init,
                         (self.features,)).astype(self.dtype)
    return y

  def _tp_call(self, x, nk: int, nn_: int, n_active: int):
    from rigl_tpu.parallel import packed_tp as tp

    in_features = x.shape[-1]
    nm = self.tp_shards
    if nn_ % nm:
      raise ValueError(f'{self.features}/{self.block[1]}={nn_} block '
                       f'columns must divide tp_shards={nm}')
    nn_local = nn_ // nm
    # Balanced layout: the per-group count is the static shard shape, so
    # n_active rounds to the nearest multiple of tp_shards (>= tp_shards).
    n_active = min(nk * nn_, max(nm, int(round(n_active / nm)) * nm))
    cap = n_active // nm
    # Inside shard_map the leading group axis is sharded over tp_axis:
    # params/packings arrive (and must be declared) with the LOCAL count.
    nm_store = nm if self.tp_axis is None else (
        nm // jax.lax.axis_size(self.tp_axis))

    def init_packing():
      keys = jax.random.split(self.make_rng('params'), nm_store)
      return tp.stack_packings([
          make_packing(random_occupancy(keys[g], nk, nn_local, cap), cap)
          for g in range(nm_store)])

    packing = self.variable('packing', 'kernel', init_packing)
    kernel = self.param(
        'kernel',
        lambda key, shape: (jax.random.normal(key, shape)
                            / np.sqrt(in_features)).astype(jnp.float32),
        (nm_store, cap) + tuple(self.block))

    lead = x.shape[:-1]
    x2d = x.reshape((-1, in_features)).astype(self.dtype)
    n_rows = x2d.shape[0]
    pad = (-n_rows) % self.bm
    if pad:
      x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
    if self.tp_axis is not None:
      x2d = tp.replicate_for_tp(x2d, self.tp_axis)
    nm_local = kernel.shape[0]       # 1 inside shard_map, tp_shards outside
    ys = [packed_matmul(x2d, kernel[g].astype(self.dtype),
                        tp.local_packing(packing.value, g), self.block,
                        self.bm) for g in range(nm_local)]
    y = ys[0] if nm_local == 1 else jnp.concatenate(ys, axis=1)
    if self.tp_axis is not None:
      y = tp.gather_columns_for_tp(y, self.tp_axis, axis=1)
    y = y[:n_rows].reshape(lead + (self.features,))
    if self.use_bias:
      y = y + self.param('bias', self.bias_init,
                         (self.features,)).astype(self.dtype)
    return y
