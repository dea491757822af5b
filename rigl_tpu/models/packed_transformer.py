"""Transformer blocks on PACKED block-sparse storage.

Every parameter matmul (fused QKV, attention output projection, both FFN
matmuls) is a PackedDense: weights, gradients, and optimizer slots live as
`(n_active, bk, bn)` packed blocks — O(density) memory — and execute on
the packed pallas kernels that skip inactive blocks' DMA and MXU work.
Attention math (logits/softmax/weighted sum) and LayerNorms stay dense:
sparsity here is WEIGHT sparsity, as in the reference (the reference has
no transformer family; this extends its RigL/SET algorithms — which are
architecture-agnostic, sparse_optimizers_base.py — to the model class
where the compute-bound packed win applies directly, PERF.md round-2
session 4).

Blocks are sized so every matmul's (in, out) divides `block`; with the
defaults (128,128) that means d_model and d_ff multiples of 128.

`DenseTransformer` is the equal-architecture, equal-dtype dense twin used
by parity tests and the benchmark's baseline arm.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from rigl_tpu.layers.packed_dense import PackedDense


def transformer_layer_shapes(d_model: int, d_ff: int):
  """Dense kernel shapes of one block's packed matmuls, keyed by the
  CANONICAL (blockless) layer paths that sparsity/layer_sparsity.py's
  suffix lookup resolves from any apply context.

  Feeding one block to the ERK solver is exact for the whole stack:
  every layer type appears once per block, so the epsilon solve's
  rhs/divisor both scale by depth L and eps is unchanged (the reference
  solves over the full layer list, sparse_utils.py:118-207 — same
  result for uniform-depth stacks).
  """
  return {
      'attn/qkv/kernel': (d_model, 3 * d_model),
      'attn/out/kernel': (d_model, d_model),
      'fc1/kernel': (d_model, d_ff),
      'fc2/kernel': (d_ff, d_model),
  }


def _flash_attention(q, k, v, sm_scale):
  """Fused causal attention via the TPU pallas flash kernel (jax's
  shipped op — tiled online-softmax, no (s, s) logits materialization).
  TPU-only: no interpret mode, so callers gate on backend; the unfused
  einsum path below is the CPU/test/seq-parallel fallback and the
  numerical reference (parity checked on-chip by
  scripts/check_fused_attention_tpu.py)."""
  from jax.experimental.pallas.ops.tpu import flash_attention as fa
  return fa.flash_attention(q, k, v, causal=True, sm_scale=sm_scale)


class _Attention(nn.Module):
  """Multi-head self-attention with pluggable projection layer factory.

  Sequence parallelism (`seq_axis`, set ONLY on the instance applied
  inside a shard_map whose `seq_axis` mesh axis shards the sequence):
  x holds this device's contiguous token shard; q stays local, k/v are
  all-gathered over the axis (context parallelism — every tokenwise op
  around the attention keeps running on the local shard), and the causal
  mask compares GLOBAL positions (shard offset = axis_index * s_local).

  `fused`: run the softmax(QK^T)V core through the TPU flash-attention
  pallas kernel (both the packed model and the dense twin take it, so
  benchmarks stay honest: it shrinks the SHARED attention mass).  Ignored
  under sequence parallelism (the kernel has no shifted-causal support).

  `decode` + `max_decode_len`: autoregressive serving mode.  k/v land in a
  ring-less 'cache' collection at the running index; the incoming x holds
  the NEW tokens only (prompt prefill: s_in = prompt length at index 0;
  decode: s_in = 1), the causal mask compares global positions
  (query offset = cache index).  See rigl_tpu/serve/decode.py."""
  num_heads: int
  make_proj: Any            # (features, name) -> nn.Module
  dtype: Any = jnp.float32
  seq_axis: Optional[str] = None
  fused: bool = False
  decode: bool = False
  max_decode_len: int = 0
  # kv_chunk > 0: flash-decoding-style CHUNKED cache attention — the
  # cache is visited in static kv_chunk-sized pieces combined by online
  # softmax, and chunks entirely beyond the live prefix are skipped via
  # lax.cond (their k/v are never read from HBM).  Decode KV traffic then
  # scales with the LIVE length (prompt + tokens so far), not the
  # allocated max_decode_len — the decode step is KV+weight-bandwidth
  # bound at batch>=8 (PERF.md round 5), so over-allocated caches
  # otherwise pay for their padding every step.
  kv_chunk: int = 0

  @nn.compact
  def __call__(self, x):
    b, s, d = x.shape
    h = self.num_heads
    hd = d // h
    qkv = self.make_proj(3 * d, 'qkv')(x.reshape(b * s, d))
    q, k, v = jnp.split(qkv.reshape(b, s, 3 * d), 3, axis=-1)
    q = q.reshape(b, s, h, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, s, h, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, s, h, hd).transpose(0, 2, 1, 3)
    if self.decode:
      return self._decode_attend(q, k, v, b, s, d, h, hd)
    if self.fused and self.seq_axis is None:
      o = _flash_attention(q, k, v, sm_scale=float(1.0 / np.sqrt(hd)))
      o = o.transpose(0, 2, 1, 3).reshape(b * s, d)
      return self.make_proj(d, 'out')(o).reshape(b, s, d)
    if self.seq_axis is None:
      q_pos = jnp.arange(s)
      k_pos = jnp.arange(s)
    else:
      # Gather the full key/value sequence; tiled all_gather concatenates
      # shards in axis order, i.e. original token order.
      k = jax.lax.all_gather(k, self.seq_axis, axis=2, tiled=True)
      v = jax.lax.all_gather(v, self.seq_axis, axis=2, tiled=True)
      q_pos = jax.lax.axis_index(self.seq_axis) * s + jnp.arange(s)
      k_pos = jnp.arange(s * jax.lax.axis_size(self.seq_axis))
    logits = jnp.einsum('bhqd,bhkd->bhqk', q, k) / np.sqrt(hd)
    # Causal mask: this family benches/trains as a decoder stack.
    mask = k_pos[None, :] <= q_pos[:, None]
    logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(v.dtype)
    o = jnp.einsum('bhqk,bhkd->bhqd', probs, v)
    o = o.transpose(0, 2, 1, 3).reshape(b * s, d)
    return self.make_proj(d, 'out')(o).reshape(b, s, d)

  def _decode_attend(self, q, k, v, b, s, d, h, hd):
    """KV-cache attention: insert the s_in new k/v at the running index,
    attend q against the whole cache with a global-position causal mask.
    At init time (cache variables not yet materialized) falls back to the
    plain local causal product so shapes/params trace identically.

    Variable-length batched prompts: prompts are LEFT-padded to a common
    length (so every row's last prompt token sits at the same position and
    decode appends at one shared index); the per-row 'pad_len' cache entry
    (number of leading pad positions, default 0) masks the pad positions'
    k/v out of every attention — serve/decode.py sets it from the caller's
    prompt_lens before prefill."""
    L = self.max_decode_len
    if L < 1:
      raise ValueError('decode=True requires max_decode_len >= 1')
    is_init = not self.has_variable('cache', 'cached_key')
    ck = self.variable('cache', 'cached_key',
                       lambda: jnp.zeros((b, h, L, hd), k.dtype))
    cv = self.variable('cache', 'cached_value',
                       lambda: jnp.zeros((b, h, L, hd), v.dtype))
    idx = self.variable('cache', 'index',
                        lambda: jnp.zeros((), jnp.int32))
    pad = self.variable('cache', 'pad_len',
                        lambda: jnp.zeros((b,), jnp.int32))
    if is_init:
      k_all, v_all = k, v
      q_pos = jnp.arange(s)
      k_pos = jnp.arange(s)
    else:
      start = idx.value
      ck.value = jax.lax.dynamic_update_slice(ck.value, k, (0, 0, start, 0))
      cv.value = jax.lax.dynamic_update_slice(cv.value, v, (0, 0, start, 0))
      idx.value = start + s
      k_all, v_all = ck.value, cv.value
      q_pos = start + jnp.arange(s)
      k_pos = jnp.arange(L)
      if self.kv_chunk > 0:
        o = self._chunked_cache_attend(q, k_all, v_all, q_pos, pad.value,
                                       L, hd)
        o = o.transpose(0, 2, 1, 3).reshape(b * s, d)
        return self.make_proj(d, 'out')(o).reshape(b, s, d)
    logits = jnp.einsum('bhqd,bhkd->bhqk', q, k_all) / np.sqrt(hd)
    mask = ((k_pos[None, :] <= q_pos[:, None])[None, None]
            & (k_pos[None, :] >= pad.value[:, None])[:, None, None, :])
    logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(v.dtype)
    o = jnp.einsum('bhqk,bhkd->bhqd', probs, v_all)
    o = o.transpose(0, 2, 1, 3).reshape(b * s, d)
    return self.make_proj(d, 'out')(o).reshape(b, s, d)

  def _chunked_cache_attend(self, q, k_all, v_all, q_pos, pad, L, hd):
    """Online-softmax cache attention over static kv_chunk pieces; chunks
    past the live prefix are skipped via lax.cond (no HBM read).  Same
    f32 softmax math as the single-pass branch, associatively re-ordered
    (flash-attention recurrence) — parity within f32 tolerance, oracle
    in tests/test_decode.py."""
    chunk = self.kv_chunk
    if L % chunk:
      raise ValueError(f'kv_chunk={chunk} must divide '
                       f'max_decode_len={L}')
    b, h, s = q.shape[0], q.shape[1], q.shape[2]
    qf = q.astype(jnp.float32)
    scale = float(1.0 / np.sqrt(hd))
    neg = jnp.finfo(jnp.float32).min
    live_end = q_pos[-1] + 1            # positions < live_end may be valid
    m0 = jnp.full((b, h, s), neg, jnp.float32)
    l0 = jnp.zeros((b, h, s), jnp.float32)
    a0 = jnp.zeros((b, h, s, hd), jnp.float32)
    carry = (m0, l0, a0)
    for c in range(L // chunk):
      lo = c * chunk

      def visit(carry, lo=lo):
        m, l, acc = carry
        kc = jax.lax.slice_in_dim(k_all, lo, lo + chunk, axis=2)
        vc = jax.lax.slice_in_dim(v_all, lo, lo + chunk, axis=2)
        kpos = lo + jnp.arange(chunk)
        lg = jnp.einsum('bhqd,bhkd->bhqk', qf,
                        kc.astype(jnp.float32)) * scale
        mask = ((kpos[None, :] <= q_pos[:, None])[None, None]
                & (kpos[None, :] >= pad[:, None])[:, None, None, :])
        lg = jnp.where(mask, lg, neg)
        mc = jnp.maximum(m, jnp.max(lg, axis=-1))
        # p masked explicitly: in a chunk that is all-masked for some row
        # (a left-pad region), mc stays `neg` there and exp(neg - neg)
        # would be 1, not 0.
        p = jnp.where(mask, jnp.exp(lg - mc[..., None]), 0.0)
        corr = jnp.exp(m - mc)
        l = l * corr + jnp.sum(p, axis=-1)
        acc = (acc * corr[..., None]
               + jnp.einsum('bhqk,bhkd->bhqd', p,
                            vc.astype(jnp.float32)))
        return (mc, l, acc)

      carry = jax.lax.cond(live_end > lo, visit, lambda cr: cr, carry)
    m, l, acc = carry
    # l == 0 only for queries at LEFT-PAD positions (their own position is
    # excluded by the pad mask): their output is garbage-by-design (never
    # read — pad logits are discarded, pad k/v masked out of every later
    # attention), but it must be FINITE or NaN leaks into later layers'
    # pad k/v and 0 * NaN poisons the einsum.  The unchunked branch gives
    # uniform-softmax garbage there; this gives zeros.
    return (acc / jnp.maximum(l, 1e-30)[..., None]).astype(v_all.dtype)


class _Block(nn.Module):
  num_heads: int
  d_ff: int
  make_proj: Any
  dtype: Any = jnp.float32
  seq_axis: Optional[str] = None
  fused: bool = False
  decode: bool = False
  max_decode_len: int = 0
  kv_chunk: int = 0

  @nn.compact
  def __call__(self, x):
    b, s, d = x.shape
    h = nn.LayerNorm(dtype=self.dtype, name='ln1')(x)
    x = x + _Attention(self.num_heads, self.make_proj, self.dtype,
                       self.seq_axis, self.fused, self.decode,
                       self.max_decode_len, self.kv_chunk, name='attn')(h)
    h = nn.LayerNorm(dtype=self.dtype, name='ln2')(x)
    h2 = self.make_proj(self.d_ff, 'fc1')(h.reshape(b * s, d))
    h2 = jax.nn.gelu(h2)
    h2 = self.make_proj(d, 'fc2')(h2)
    return x + h2.reshape(b, s, d)


class PackedTransformer(nn.Module):
  """Decoder stack whose parameter matmuls are packed block-sparse.

  vocab_size == 0 means "pre-embedded inputs" (bench mode): __call__ takes
  (B, S, d_model) floats and returns (B, S, d_model).

  `sparsity`: float (uniform) or SparsityMap over the canonical layer
  paths (transformer_layer_shapes) — per-layer ERK/custom sparsity on
  packed storage.
  """
  num_layers: int = 2
  d_model: int = 512
  d_ff: int = 2048
  num_heads: int = 8
  vocab_size: int = 0
  sparsity: Any = 0.8
  block: Tuple[int, int] = (128, 128)
  bm: int = 512
  dtype: Any = jnp.float32
  # Tensor parallelism: store every packed kernel as tp_shards balanced
  # output-column groups (see PackedDense).  tp_axis is set ONLY on the
  # model instance applied inside a shard_map over that mesh axis.
  tp_shards: int = 1
  tp_axis: Optional[str] = None
  # Sequence (context) parallelism: set ONLY inside a shard_map whose
  # `seq_axis` mesh axis shards the sequence — inputs/outputs/labels are
  # local token shards; attention gathers k/v (see _Attention).
  seq_axis: Optional[str] = None
  # Fused flash-attention core (TPU only; see _Attention.fused).
  fused_attention: bool = False
  # Autoregressive serving: KV-cache decode (see _Attention.decode and
  # rigl_tpu/serve/decode.py).  Same params/packing as the train-mode
  # model — construct a decode twin with .replace(decode=True, ...).
  decode: bool = False
  max_decode_len: int = 0
  # Chunked cache attention for decode (see _Attention.kv_chunk).
  kv_chunk: int = 0

  @nn.compact
  def __call__(self, x):
    # A plain closure, NOT a bound Module method: flax re-enters the
    # owning module's scope for any Module-method call, which would make
    # every projection a (name-colliding) child of this module.
    sparsity, block, bm, dtype = (self.sparsity, self.block, self.bm,
                                  self.dtype)
    tp_shards, tp_axis = self.tp_shards, self.tp_axis

    def proj(features, name):
      return PackedDense(features, sparsity=sparsity, block=block, bm=bm,
                         use_bias=False, dtype=dtype, tp_shards=tp_shards,
                         tp_axis=tp_axis, name=name)

    if self.vocab_size:
      x = nn.Embed(self.vocab_size, self.d_model,
                   dtype=self.dtype, name='embed')(x)
    for i in range(self.num_layers):
      x = _Block(self.num_heads, self.d_ff, proj, self.dtype,
                 self.seq_axis, self.fused_attention, self.decode,
                 self.max_decode_len, self.kv_chunk, name=f'block{i}')(x)
    x = nn.LayerNorm(dtype=self.dtype, name='ln_f')(x)
    if self.vocab_size:
      # Untied dense head (kept dense like the MLP drivers' classifier).
      x = nn.Dense(self.vocab_size, use_bias=False, dtype=self.dtype,
                   name='head')(x)
    return x


class DenseTransformer(nn.Module):
  """Equal-architecture dense twin (param_dtype matches compute dtype so
  optimizer traffic is comparable in benchmarks)."""
  num_layers: int = 2
  d_model: int = 512
  d_ff: int = 2048
  num_heads: int = 8
  vocab_size: int = 0
  dtype: Any = jnp.float32
  fused_attention: bool = False
  decode: bool = False
  max_decode_len: int = 0
  kv_chunk: int = 0

  @nn.compact
  def __call__(self, x):
    dtype = self.dtype

    def proj(features, name):
      return _Dense2D(features, dtype, name=name)

    if self.vocab_size:
      x = nn.Embed(self.vocab_size, self.d_model,
                   dtype=self.dtype, name='embed')(x)
    for i in range(self.num_layers):
      x = _Block(self.num_heads, self.d_ff, proj, self.dtype,
                 fused=self.fused_attention, decode=self.decode,
                 max_decode_len=self.max_decode_len,
                 kv_chunk=self.kv_chunk, name=f'block{i}')(x)
    x = nn.LayerNorm(dtype=self.dtype, name='ln_f')(x)
    if self.vocab_size:
      x = nn.Dense(self.vocab_size, use_bias=False, dtype=self.dtype,
                   name='head')(x)
    return x


class _Dense2D(nn.Module):
  features: int
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x):
    return nn.Dense(self.features, use_bias=False, dtype=self.dtype,
                    param_dtype=self.dtype, name='d')(x)
