"""Autoregressive decoding on the packed/dense transformer family.

The train-mode model and its decode twin share parameters (and packing):
`decode_twin(model, L)` flips the module's decode flag, `generate` runs a
jitted prefill + lax.scan token loop against the 'cache' collection that
_Attention._decode_attend maintains (models/packed_transformer.py).

Reference contrast: google-research/rigl has no serving surface at all —
its sparse training produces masked dense checkpoints and export stops at
mask-baked SavedModel artifacts (rigl/imagenet_resnet/export_model.py).
Here the packed representation pays off twice: O(density) checkpoint AND
O(density) decode-step weight traffic.

Shapes: prompt (B, P) int32, generated tokens (B, steps) int32.  The
whole generation (prefill + all steps) is ONE jitted program per
(model, batch, prompt_len, steps) signature — no per-token host round
trips (critical over the remote-TPU tunnel, CLAUDE.md).
"""

from __future__ import annotations

import functools
from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp


def decode_twin(model, max_decode_len: int, kv_chunk: int = 0):
  """The decode-mode twin of a train-mode PackedTransformer /
  DenseTransformer: same architecture fields (so params/packing trees
  line up), decode branch active with an L-token KV cache.

  kv_chunk > 0: chunked cache attention — per-step KV reads scale with
  the LIVE prefix instead of max_decode_len (lax.cond chunk skipping;
  models/packed_transformer._Attention.kv_chunk)."""
  if not getattr(model, 'vocab_size', 0):
    raise ValueError('decoding requires vocab_size > 0 (token inputs)')
  return model.clone(decode=True, max_decode_len=max_decode_len,
                     kv_chunk=kv_chunk, parent=None)


def init_cache(model, batch: int):
  """Zeroed 'cache' collection for `batch` sequences (model must be a
  decode twin).  Cheap: one s=1 forward at init."""
  x0 = jnp.zeros((batch, 1), jnp.int32)
  return jax.jit(model.init)(jax.random.key(0), x0)['cache']


def _sample(logits, key, temperature: float, top_k: int = 0,
            top_p: float = 1.0):
  """Greedy (temperature 0) or categorical sampling with optional top-k
  truncation and/or top-p (nucleus) filtering — temperature scales first,
  then the filters stack (the standard serving order)."""
  logits = logits.astype(jnp.float32)
  if temperature == 0.0:
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)
  logits = logits / temperature
  neg = jnp.finfo(jnp.float32).min
  if top_k and top_k < logits.shape[-1]:
    kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
    logits = jnp.where(logits >= kth, logits, neg)
  if top_p < 1.0:
    # Nucleus: keep the smallest prefix of the sorted distribution whose
    # mass reaches top_p (the crossing token included).  The top token is
    # ALWAYS kept (keep[..., 0] forced True): with top_p <= 0 the cumsum
    # predicate would otherwise hold nowhere, min_kept would be +inf, and
    # every logit would mask to -inf — degenerate uniform sampling.
    sorted_logits = jnp.flip(jnp.sort(logits, axis=-1), axis=-1)
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    keep = jnp.cumsum(probs, axis=-1) - probs < top_p
    keep = keep.at[..., 0].set(True)
    min_kept = jnp.min(jnp.where(keep, sorted_logits, jnp.inf), axis=-1,
                       keepdims=True)
    logits = jnp.where(logits >= min_kept, logits, neg)
  return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def _set_pad_lens(cache, pad):
  """Stamp the per-row left-pad count into every attention's 'pad_len'
  cache entry (see _Attention._decode_attend)."""
  import flax.traverse_util as traverse
  flat = traverse.flatten_dict(cache)
  flat = {k: (jnp.broadcast_to(pad, v.shape) if k[-1] == 'pad_len' else v)
          for k, v in flat.items()}
  return traverse.unflatten_dict(flat)


@functools.cache
def make_generate_fn(model, steps: int, temperature: float = 0.0,
                     top_k: int = 0, top_p: float = 1.0):
  """Jitted (variables, prompt, key[, prompt_lens]) -> (B, steps) tokens.

  `model` is a decode twin (hashable flax module — the cache key).  The
  returned program prefills the prompt, samples the first token from the
  last prompt logit, then scans `steps - 1` single-token decode steps with
  the KV cache in the scan carry.

  Variable-length batched prompts: LEFT-pad each row to the common length
  and pass `prompt_lens` (B,) real lengths — pad positions' k/v are masked
  out of every attention (this family has no positional encoding, so the
  left-shifted rows decode exactly as they would unpadded; oracle-tested).
  """
  if steps < 1:
    raise ValueError('steps must be >= 1')

  @jax.jit
  def run(variables: Mapping[str, Any], prompt, key, prompt_lens=None):
    b, p = prompt.shape
    if p + steps > model.max_decode_len:
      raise ValueError(f'prompt {p} + steps {steps} exceeds '
                       f'max_decode_len {model.max_decode_len}')
    base = {k: v for k, v in variables.items() if k != 'cache'}
    cache = init_cache(model, b)
    if prompt_lens is not None:
      cache = _set_pad_lens(cache,
                            p - jnp.asarray(prompt_lens, jnp.int32))
    logits, mut = model.apply(dict(base, cache=cache), prompt,
                              mutable=['cache'])
    key, sub = jax.random.split(key)
    tok = _sample(logits[:, -1], sub, temperature, top_k, top_p)

    def step(carry, _):
      cache, tok, key = carry
      logits, mut = model.apply(dict(base, cache=cache), tok[:, None],
                                mutable=['cache'])
      key, sub = jax.random.split(key)
      nxt = _sample(logits[:, 0], sub, temperature, top_k, top_p)
      return (mut['cache'], nxt, key), nxt

    (_, _, _), toks = jax.lax.scan(step, (mut['cache'], tok, key), None,
                                   length=steps - 1)
    return jnp.concatenate([tok[:, None], toks.T], axis=1)

  return run


def generate(model, variables, prompt, steps: int, *,
             key: Optional[jax.Array] = None, temperature: float = 0.0,
             top_k: int = 0, top_p: float = 1.0, prompt_lens=None):
  """Convenience wrapper over make_generate_fn (traces once per
  (model, steps, sampling-config, shapes) signature)."""
  fn = make_generate_fn(model, steps, temperature, top_k, top_p)
  return fn(variables, prompt, key if key is not None else jax.random.key(0),
            prompt_lens)
