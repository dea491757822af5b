"""Serving decode-step bench: packed vs dense transformer, small batch.

The autoregressive decode step is weight-HBM-bound (each step reads every
parameter once for a handful of tokens), so packed storage's (1-sparsity)
byte footprint converts directly to step time — the serving-side twin of
the training-step benches.  Whole generation is one jitted prefill +
lax.scan program (rigl_tpu/serve/decode.py), timed over DECODE_STEPS
tokens with one readback; per-token time = elapsed / steps.

  python scripts/bench_packed_decode.py          # TPU
  DEC_SPARSITY=0.9 DEC_BATCH=1 python scripts/bench_packed_decode.py

Model: DEC_LAYERS x (d_model DEC_D_MODEL, d_ff DEC_D_FF) decoder, bf16,
vocab 256 (byte-LM class), block (512,512).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

from rigl_tpu.models.packed_transformer import (DenseTransformer,
                                                PackedTransformer)
from rigl_tpu.serve import decode_twin, make_generate_fn

D_MODEL = int(os.environ.get('DEC_D_MODEL', 2048))
D_FF = int(os.environ.get('DEC_D_FF', 8192))
LAYERS = int(os.environ.get('DEC_LAYERS', 4))
HEADS = int(os.environ.get('DEC_HEADS', 16))
VOCAB = int(os.environ.get('DEC_VOCAB', 256))
BATCH = int(os.environ.get('DEC_BATCH', 8))
PROMPT = int(os.environ.get('DEC_PROMPT', 128))
STEPS = int(os.environ.get('DEC_STEPS', 128))
MAXLEN = int(os.environ.get('DEC_MAXLEN', PROMPT + STEPS))
SPARSITY = float(os.environ.get('DEC_SPARSITY', 0.8))
BLOCK = tuple(int(b) for b in os.environ.get('DEC_BLOCK', '512,512'
                                             ).split(','))
# DEC_KV_CHUNK > 0: chunked cache attention (lax.cond chunk skipping) —
# per-step KV reads scale with the live prefix, not MAXLEN.
KV_CHUNK = int(os.environ.get('DEC_KV_CHUNK', 0))


CHAIN = int(os.environ.get('DEC_CHAIN', 8))


def bench(label, fn, variables, prompt):
  """Times CHAIN data-dependent generations (each feeds its output tokens
  back as the next prompt, so the chain serializes on-device) with ONE
  final readback.  A single timed invocation would pay the remote-tunnel
  program round trip (~23 ms on this box, measured round 4 — an empty
  128-step scan and an unrolled equivalent both cost ~23 ms wall with a
  per-call sync) IN FULL in both arms, compressing the ratio; chaining
  amortizes it to RT/CHAIN.  Requires STEPS == PROMPT so shapes line up."""
  assert STEPS == PROMPT, 'chained decode bench needs DEC_STEPS == DEC_PROMPT'
  out = fn(variables, prompt, jax.random.key(0))
  out = fn(variables, out, jax.random.key(1))
  _ = int(np.asarray(out)[0, -1])
  t = time.perf_counter()
  out = prompt
  for i in range(CHAIN):
    out = fn(variables, out, jax.random.key(i))
  _ = int(np.asarray(out)[0, -1])
  dt = (time.perf_counter() - t) / CHAIN
  per_tok = dt / STEPS
  print(f'{label}: {per_tok * 1e6:.1f} us/token '
        f'({BATCH * STEPS / dt:.0f} tok/s at batch {BATCH}, '
        f'chain {CHAIN})', flush=True)
  return per_tok


def main():
  rs = np.random.RandomState(0)
  prompt = jnp.asarray(rs.randint(0, VOCAB, (BATCH, PROMPT)), jnp.int32)
  kw = dict(num_layers=LAYERS, d_model=D_MODEL, d_ff=D_FF, num_heads=HEADS,
            vocab_size=VOCAB, dtype=jnp.bfloat16)

  dense = DenseTransformer(**kw)
  dv = jax.jit(dense.init)(jax.random.key(1), prompt)
  fd = make_generate_fn(decode_twin(dense, MAXLEN, KV_CHUNK), STEPS, 0.0)
  t_dense = bench('dense decode', fd, dv, prompt)

  packed = PackedTransformer(sparsity=SPARSITY, block=BLOCK, bm=512, **kw)
  pv = jax.jit(packed.init)(jax.random.key(1), prompt)
  fp = make_generate_fn(decode_twin(packed, MAXLEN, KV_CHUNK), STEPS, 0.0)
  t_packed = bench(f'packed decode (s={SPARSITY})', fp, pv, prompt)

  # Mixed-length batch row (DEC_MIXED=1): LEFT-padded prompts of lengths
  # PROMPT, PROMPT-16, ... with prompt_lens — the serving-realistic shape
  # (variable requests batched together).  Same program structure (one
  # prefill at the common padded length + scan), so per-token time should
  # match the uniform-length rows; this row documents that the varlen path
  # costs nothing.
  if os.environ.get('DEC_MIXED', '0') == '1':
    lens = [max(8, PROMPT - 16 * i) for i in range(BATCH)]
    rows = [rs.randint(0, VOCAB, (n,)) for n in lens]
    padded = jnp.asarray(np.stack(
        [np.pad(r, (PROMPT - len(r), 0)) for r in rows]), jnp.int32)
    plens = jnp.asarray(lens, jnp.int32)

    def fd_mixed(v, p, k):
      return fd(v, p, k, plens)

    def fp_mixed(v, p, k):
      return fp(v, p, k, plens)

    t_dense_mix = bench('dense decode (mixed-length)', fd_mixed, dv, padded)
    t_packed_mix = bench(f'packed decode (mixed-length, s={SPARSITY})',
                         fp_mixed, pv, padded)
    print(json.dumps({
        'metric': 'decode_mixed_length_speedup_vs_dense',
        'value': round(t_dense_mix / t_packed_mix, 3),
        'unit': 'x dense (per-token, left-padded varlen batch)',
        'lens': lens,
        'dense_us_per_tok': round(t_dense_mix * 1e6, 1),
        'packed_us_per_tok': round(t_packed_mix * 1e6, 1),
    }), flush=True)

  # Analytic bytes per step (bf16), the roofline denominator: weights +
  # the FULL allocated KV cache (k and v read every step by the unchunked
  # attention; kv_chunk reads only live chunks).
  params = LAYERS * (4 * D_MODEL * D_MODEL + 2 * D_MODEL * D_FF)
  kv = LAYERS * 2 * BATCH * MAXLEN * D_MODEL
  print(json.dumps({
      'metric': f'decode{LAYERS}x{D_MODEL}_packed{int(SPARSITY*100)}'
                '_tokens_per_s_speedup_vs_dense',
      'value': round(t_dense / t_packed, 3),
      'unit': 'x dense (per-token decode step)',
      'batch': BATCH, 'prompt': PROMPT, 'steps': STEPS,
      'maxlen': MAXLEN, 'kv_chunk': KV_CHUNK,
      'dense_us_per_tok': round(t_dense * 1e6, 1),
      'packed_us_per_tok': round(t_packed * 1e6, 1),
      'weight_mb_dense': round(params * 2 / 2**20, 1),
      'weight_mb_packed': round(params * 2 * (1 - SPARSITY) / 2**20, 1),
      'kv_mb_full': round(kv * 2 / 2**20, 1),
  }), flush=True)


if __name__ == '__main__':
  main()
