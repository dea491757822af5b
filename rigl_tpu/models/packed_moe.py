"""Mixture-of-Experts transformer on PACKED block-sparse expert storage.

Every block's FFN is a Switch-Transformer top-1 MoE whose E experts store
their fc1/fc2 kernels as stacked packed blocks `(E, cap, bk, bn)` —
O(density) weight/grad/optimizer memory per expert — while attention
projections stay per-token PackedDense and routing/LayerNorms stay dense.
Expert parallelism shards the leading expert axis over an 'expert' mesh
axis with one all_to_all each way (parallel/packed_ep.py has the layout
and gradient-completeness notes).

The reference has no MoE family; this extends its architecture-agnostic
RigL/SET drop/grow semantics (sparse_optimizers_base.py:276-343, run
per expert) to the canonical expert-parallel TPU workload.

`DenseMoETransformer` is the equal-architecture dense twin: identical
router/dispatch math, expert kernels dense (E, K, N) — used by parity
tests and as the dense-view backward for RigL grow scores.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from rigl_tpu.layers.packed_dense import PackedDense, random_occupancy
from rigl_tpu.models.packed_transformer import _Attention, _Dense2D
from rigl_tpu.ops.pallas.block_sparse_packed import (make_packing,
                                                     packed_matmul)
from rigl_tpu.parallel import packed_ep as ep
from rigl_tpu.sparsity.distributions import get_n_zeros
from rigl_tpu.sparsity.layer_sparsity import resolve_sparsity


def moe_layer_shapes(d_model: int, d_ff: int, num_experts: int):
  """Dense kernel shapes of one MoE block's packed matmuls (canonical
  blockless keys — see transformer_layer_shapes for why one block is
  exact for the whole stack).  Expert stacks enter the ERK solve as the
  rank-3 (E, K, N) tensors they are; the reference's ERK probability for
  any-rank kernels is sum(shape)/prod(shape) (sparse_utils.py:163-169),
  so experts scale like any higher-rank kernel would."""
  return {
      'attn/qkv/kernel': (d_model, 3 * d_model),
      'attn/out/kernel': (d_model, d_model),
      'moe/fc1/kernel': (num_experts, d_model, d_ff),
      'moe/fc2/kernel': (num_experts, d_ff, d_model),
  }


class _PackedExperts(nn.Module):
  """E experts' kernels as stacked packed block-sparse storage.

  __call__ maps (E_local, C, d_in) -> (E_local, C, features), running one
  packed matmul per LOCAL expert (E_local is inferred from the input, so
  the same module works globally and inside an expert-sharded shard_map,
  where params/packings arrive with the local leading axis).

  `sparsity`: float or SparsityMap (per-layer, resolved by this module's
  path — all experts of one layer share the layer's sparsity)."""
  features: int
  num_experts: int               # experts to DECLARE (local count)
  sparsity: Any = 0.8
  block: Tuple[int, int] = (16, 16)
  bm: int = 128
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, xe):
    d_in = xe.shape[-1]
    bk, bn = self.block
    if d_in % bk or self.features % bn:
      raise ValueError(f'({d_in}, {self.features}) must divide '
                       f'block {self.block}')
    nk, nn_ = d_in // bk, self.features // bn
    n_total = nk * nn_
    n_active = n_total - get_n_zeros(
        n_total, resolve_sparsity(self.sparsity, self.path))
    E = self.num_experts

    def init_packing():
      keys = jax.random.split(self.make_rng('params'), E)
      return ep.stack_expert_packings([
          make_packing(random_occupancy(keys[e], nk, nn_, n_active),
                       n_active) for e in range(E)])

    packing = self.variable('packing', 'kernel', init_packing)
    kernel = self.param(
        'kernel',
        lambda key, shape: (jax.random.normal(key, shape)
                            / np.sqrt(d_in)).astype(jnp.float32),
        (E, n_active, bk, bn))

    e_local, c, _ = xe.shape
    pad = (-c) % self.bm
    if pad:
      xe = jnp.pad(xe, ((0, 0), (0, pad), (0, 0)))
    ys = [packed_matmul(xe[e], kernel[e].astype(self.dtype),
                        ep.local_expert_packing(packing.value, e),
                        self.block, self.bm)
          for e in range(e_local)]
    return jnp.stack(ys)[:, :c]


class _ExpertKernel(nn.Module):
  """Dense (E, d_in, features) expert kernels; einsum batched matmul."""
  features: int
  num_experts: int
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, xe):
    d_in = xe.shape[-1]
    w = self.param(
        'kernel',
        lambda key, shape: (jax.random.normal(key, shape)
                            / np.sqrt(d_in)).astype(jnp.float32),
        (self.num_experts, d_in, self.features))
    return jnp.einsum('ecd,edf->ecf', xe, w.astype(self.dtype))


class _DenseExperts(nn.Module):
  """Dense twin of _PackedExperts; kernel nested one level ('d') so the
  path mapping packed (..., name, 'kernel') -> twin
  (..., name, 'd', 'kernel') matches the PackedDense/_Dense2D convention
  (train/packed_lm.py:dense_twin_params)."""
  features: int
  num_experts: int
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, xe):
    return _ExpertKernel(self.features, self.num_experts, self.dtype,
                         name='d')(xe)


class _MoEFFN(nn.Module):
  """Switch top-1 MoE FFN (shared by the packed model and its dense twin
  via the make_experts factory, so routing math is identical).

  Dropped tokens (beyond an expert's capacity) pass through on the
  residual connection only.  The load-balance aux loss is sown into
  'intermediates' as 'moe_aux' (trainer adds aux_weight * sum)."""
  d_ff: int
  num_experts: int               # GLOBAL expert count E (router width)
  make_experts: Any              # (features, name) -> experts module
  capacity_factor: float = 2.0
  dtype: Any = jnp.float32
  ep_axis: Optional[str] = None
  token_axes: Tuple[str, ...] = ()
  # Serving mode: DROP-FREE routing (capacity = step token count), the
  # standard inference policy — with no drops the top-1 MoE is pointwise
  # per token, so incremental KV-cache decode equals the full forward
  # exactly (tests/test_decode.py).  Train-mode capacity dropping is a
  # load-shaping device for training batches, not a serving semantic.
  decode: bool = False

  @nn.compact
  def __call__(self, x):
    b, s, d = x.shape
    t = b * s
    x2d = x.reshape(t, d)
    logits = nn.Dense(self.num_experts, use_bias=False, dtype=jnp.float32,
                      param_dtype=jnp.float32,
                      name='router')(x2d.astype(jnp.float32))
    if self.decode:
      capacity = t
    else:
      capacity = max(int(np.ceil(t / self.num_experts
                                 * self.capacity_factor)), 1)
    # Gather-form dispatch: top-1 routing assigns each token at most one
    # (expert, slot), so the Switch one-hot (T,E,C) dispatch/combine
    # einsums — O(cf * T^2 * d) f32 MXU work that rivals the expert FFN
    # compute at bench token counts — reduce to one gather each way,
    # O(T*d) data movement.  Values are bit-identical to the einsum form
    # (each output element is the same single product; tested against the
    # top1_dispatch oracle in tests/test_packed_moe.py).
    src, flat_ec, kept, gate, aux = ep.top1_gather_dispatch(
        logits, capacity, self.token_axes)
    self.sow('intermediates', 'moe_aux', aux)
    x_pad = jnp.concatenate(
        [x2d.astype(jnp.float32), jnp.zeros((1, d), jnp.float32)])
    E = self.num_experts
    xe = x_pad[src].reshape(E, capacity, d).astype(self.dtype)
    if self.ep_axis is not None:
      xe = ep.dispatch_to_experts(xe, self.ep_axis)
    h = self.make_experts(self.d_ff, 'fc1')(xe)
    h = jax.nn.gelu(h)
    ye = self.make_experts(d, 'fc2')(h)
    if self.ep_axis is not None:
      ye = ep.return_from_experts(ye, self.ep_axis)
    y_tok = ye.astype(jnp.float32).reshape(E * capacity, d)[flat_ec]
    y2d = jnp.where(kept, gate, 0.0)[:, None] * y_tok
    return y2d.astype(self.dtype).reshape(b, s, d)


class _MoEBlock(nn.Module):
  num_heads: int
  d_ff: int
  num_experts: int
  make_proj: Any
  make_experts: Any
  capacity_factor: float = 2.0
  dtype: Any = jnp.float32
  ep_axis: Optional[str] = None
  token_axes: Tuple[str, ...] = ()
  decode: bool = False
  max_decode_len: int = 0
  kv_chunk: int = 0

  @nn.compact
  def __call__(self, x):
    h = nn.LayerNorm(dtype=self.dtype, name='ln1')(x)
    x = x + _Attention(self.num_heads, self.make_proj, self.dtype,
                       decode=self.decode,
                       max_decode_len=self.max_decode_len,
                       kv_chunk=self.kv_chunk, name='attn')(h)
    h = nn.LayerNorm(dtype=self.dtype, name='ln2')(x)
    return x + _MoEFFN(self.d_ff, self.num_experts, self.make_experts,
                       self.capacity_factor, self.dtype, self.ep_axis,
                       self.token_axes, self.decode, name='moe')(h)


class PackedMoETransformer(nn.Module):
  """Decoder stack: packed attention projections + packed MoE FFNs.

  vocab_size == 0 means pre-embedded inputs (bench mode).  Set `ep_axis`
  ONLY on the instance applied inside a shard_map whose 'expert' mesh
  axis shards the expert storage (num_experts must divide the axis size;
  params are then declared/received with the LOCAL expert count)."""
  num_layers: int = 2
  d_model: int = 256
  d_ff: int = 1024
  num_heads: int = 8
  vocab_size: int = 0
  num_experts: int = 8
  capacity_factor: float = 2.0
  sparsity: Any = 0.8            # float or SparsityMap (moe_layer_shapes)
  block: Tuple[int, int] = (16, 16)
  bm: int = 128
  dtype: Any = jnp.float32
  ep_axis: Optional[str] = None
  # Mesh axes the TOKEN set shards over inside a shard_map (e.g.
  # ('data', 'expert')): the MoE aux-loss statistics pmean over these so
  # the sharded aux matches the global-token aux exactly.
  token_axes: Tuple[str, ...] = ()
  # Autoregressive serving: KV-cache attention + drop-free MoE routing
  # (see _Attention.decode, _MoEFFN.decode, rigl_tpu/serve/decode.py).
  decode: bool = False
  max_decode_len: int = 0
  kv_chunk: int = 0

  @nn.compact
  def __call__(self, x):
    sparsity, block, bm, dtype = (self.sparsity, self.block, self.bm,
                                  self.dtype)
    e_store = self.num_experts
    if self.ep_axis is not None:
      e_store //= jax.lax.axis_size(self.ep_axis)

    def proj(features, name):
      return PackedDense(features, sparsity=sparsity, block=block, bm=bm,
                         use_bias=False, dtype=dtype, name=name)

    def experts(features, name):
      return _PackedExperts(features, e_store, sparsity=sparsity,
                            block=block, bm=bm, dtype=dtype, name=name)

    if self.vocab_size:
      x = nn.Embed(self.vocab_size, self.d_model,
                   dtype=self.dtype, name='embed')(x)
    for i in range(self.num_layers):
      x = _MoEBlock(self.num_heads, self.d_ff, self.num_experts, proj,
                    experts, self.capacity_factor, self.dtype,
                    self.ep_axis, self.token_axes, self.decode,
                    self.max_decode_len, self.kv_chunk,
                    name=f'block{i}')(x)
    x = nn.LayerNorm(dtype=self.dtype, name='ln_f')(x)
    if self.vocab_size:
      x = nn.Dense(self.vocab_size, use_bias=False, dtype=self.dtype,
                   name='head')(x)
    return x


class DenseMoETransformer(nn.Module):
  """Equal-architecture dense twin (identical routing; expert kernels
  dense (E, K, N))."""
  num_layers: int = 2
  d_model: int = 256
  d_ff: int = 1024
  num_heads: int = 8
  vocab_size: int = 0
  num_experts: int = 8
  capacity_factor: float = 2.0
  dtype: Any = jnp.float32
  decode: bool = False
  max_decode_len: int = 0
  kv_chunk: int = 0

  @nn.compact
  def __call__(self, x):
    dtype = self.dtype
    e = self.num_experts

    def proj(features, name):
      return _Dense2D(features, dtype, name=name)

    def experts(features, name):
      return _DenseExperts(features, e, dtype, name=name)

    if self.vocab_size:
      x = nn.Embed(self.vocab_size, self.d_model,
                   dtype=self.dtype, name='embed')(x)
    for i in range(self.num_layers):
      x = _MoEBlock(self.num_heads, self.d_ff, self.num_experts, proj,
                    experts, self.capacity_factor, self.dtype,
                    decode=self.decode, max_decode_len=self.max_decode_len,
                    kv_chunk=self.kv_chunk, name=f'block{i}')(x)
    x = nn.LayerNorm(dtype=self.dtype, name='ln_f')(x)
    if self.vocab_size:
      x = nn.Dense(self.vocab_size, use_bias=False, dtype=self.dtype,
                   name='head')(x)
    return x
