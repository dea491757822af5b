"""KV-cache decode parity: teacher-forced incremental decoding must
reproduce the train-mode full causal forward's logits at every position,
for the dense twin AND the packed model (rigl_tpu/serve/decode.py,
models/packed_transformer.py:_Attention._decode_attend) — and for the MoE
family (models/packed_moe.py), whose decode mode routes DROP-FREE
(capacity = step token count): with no capacity drops the top-1 MoE is
pointwise per token, so incremental equals the full forward exactly.  The
MoE parity tests set capacity_factor = num_experts so the TRAIN-mode
forward is drop-free too (capacity = t) and the comparison is exact."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rigl_tpu.models.packed_moe import (DenseMoETransformer,
                                        PackedMoETransformer)
from rigl_tpu.models.packed_transformer import (DenseTransformer,
                                                PackedTransformer)
from rigl_tpu.serve import decode_twin, generate, make_generate_fn

B, T, P, V, L = 2, 10, 4, 11, 16


def _models(kind):
  if kind == 'dense':
    return DenseTransformer(num_layers=2, d_model=32, d_ff=64, num_heads=2,
                            vocab_size=V)
  if kind == 'moe_dense':
    return DenseMoETransformer(num_layers=2, d_model=32, d_ff=64,
                               num_heads=2, vocab_size=V, num_experts=4,
                               capacity_factor=4.0)
  if kind == 'moe_packed':
    return PackedMoETransformer(num_layers=2, d_model=32, d_ff=64,
                                num_heads=2, vocab_size=V, num_experts=4,
                                capacity_factor=4.0, sparsity=0.5,
                                block=(16, 16), bm=16)
  return PackedTransformer(num_layers=2, d_model=32, d_ff=64, num_heads=2,
                           vocab_size=V, sparsity=0.5, block=(16, 16), bm=16)


def _teacher_forced_decode(model, variables, tokens):
  """Prefill tokens[:, :P], then feed the TRUE next token one at a time;
  collect logits for every position."""
  dm = decode_twin(model, L)
  cache = jax.jit(dm.init)(jax.random.key(0),
                           jnp.zeros((B, 1), jnp.int32))['cache']
  base = {k: v for k, v in variables.items()}
  logits, mut = dm.apply(dict(base, cache=cache), tokens[:, :P],
                         mutable=['cache'])
  outs = [logits]
  for t in range(P, tokens.shape[1]):
    logits, mut = dm.apply(dict(base, cache=mut['cache']),
                           tokens[:, t:t + 1], mutable=['cache'])
    outs.append(logits)
  return jnp.concatenate(outs, axis=1)


@pytest.mark.parametrize('kind', ['dense', 'packed', 'moe_dense',
                                  'moe_packed'])
@pytest.mark.slow
def test_decode_matches_full_causal_forward(kind):
  model = _models(kind)
  rs = np.random.RandomState(0)
  tokens = jnp.asarray(rs.randint(0, V, (B, T)), jnp.int32)
  variables = model.init(jax.random.key(1), tokens)
  full = model.apply(variables, tokens)                  # (B, T, V)
  inc = _teacher_forced_decode(model, variables, tokens)
  np.testing.assert_allclose(np.asarray(inc), np.asarray(full),
                             rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize('kind', ['dense', 'packed', 'moe_packed'])
@pytest.mark.slow
def test_generate_greedy_matches_manual_loop(kind):
  model = _models(kind)
  rs = np.random.RandomState(2)
  prompt = jnp.asarray(rs.randint(0, V, (B, P)), jnp.int32)
  variables = model.init(jax.random.key(1), prompt)
  dm = decode_twin(model, L)
  steps = 5
  out = generate(dm, variables, prompt, steps)
  assert out.shape == (B, steps)
  assert int(out.min()) >= 0 and int(out.max()) < V

  # Manual greedy oracle via full forwards on the growing sequence.
  seq = prompt
  want = []
  for _ in range(steps):
    logits = model.apply(variables, seq)
    nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
    want.append(nxt)
    seq = jnp.concatenate([seq, nxt[:, None]], axis=1)
  np.testing.assert_array_equal(np.asarray(out),
                                np.stack([np.asarray(w) for w in want], 1))


@pytest.mark.slow
def test_generate_sampling_reproducible_and_cached():
  model = _models('dense')
  rs = np.random.RandomState(3)
  prompt = jnp.asarray(rs.randint(0, V, (B, P)), jnp.int32)
  variables = model.init(jax.random.key(1), prompt)
  dm = decode_twin(model, L)
  f1 = make_generate_fn(dm, 4, 1.0)
  f2 = make_generate_fn(dm, 4, 1.0)
  assert f1 is f2                       # trace cache hit
  a = f1(variables, prompt, jax.random.key(7))
  b = f1(variables, prompt, jax.random.key(7))
  np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
  c = f1(variables, prompt, jax.random.key(8))
  assert not np.array_equal(np.asarray(a), np.asarray(c))


@pytest.mark.slow
def test_moe_decode_is_drop_free():
  """Serving policy: decode-mode MoE never capacity-drops.  With a
  starved train-mode capacity (cf=0.5) the full forward drops tokens
  (passes them through on the residual); the decode twin's teacher-forced
  logits must instead match the DROP-FREE (cf=E) train forward exactly."""
  kw = dict(num_layers=2, d_model=32, d_ff=64, num_heads=2, vocab_size=V,
            num_experts=4)
  starved = DenseMoETransformer(capacity_factor=0.5, **kw)
  dropfree = DenseMoETransformer(capacity_factor=4.0, **kw)
  rs = np.random.RandomState(4)
  tokens = jnp.asarray(rs.randint(0, V, (B, T)), jnp.int32)
  variables = starved.init(jax.random.key(1), tokens)  # cf-independent tree
  full_starved = starved.apply(variables, tokens)
  full_dropfree = dropfree.apply(variables, tokens)
  assert not np.allclose(np.asarray(full_starved),
                         np.asarray(full_dropfree)), 'no drops occurred'
  inc = _teacher_forced_decode(starved, variables, tokens)
  np.testing.assert_allclose(np.asarray(inc), np.asarray(full_dropfree),
                             rtol=2e-4, atol=2e-5)


def test_decode_twin_requires_vocab():
  with pytest.raises(ValueError, match='vocab'):
    decode_twin(DenseTransformer(num_layers=1, d_model=32, d_ff=64,
                                 num_heads=2, vocab_size=0), L)


def test_sample_topk_and_topp_filters():
  """_sample oracle: top_k=1 == greedy; top-k draws stay in the top-k set;
  nucleus keeps exactly the smallest prefix whose mass reaches top_p."""
  from rigl_tpu.serve.decode import _sample
  logits = jnp.asarray([[2.0, 1.0, 0.5, -1.0, -3.0]] * 4)

  g = _sample(logits, jax.random.key(0), 0.0)
  np.testing.assert_array_equal(np.asarray(g), np.zeros(4, np.int32))
  k1 = _sample(logits, jax.random.key(1), 1.0, top_k=1)
  np.testing.assert_array_equal(np.asarray(k1), np.zeros(4, np.int32))

  draws = np.concatenate([
      np.asarray(_sample(logits, jax.random.key(i), 1.0, top_k=2))
      for i in range(40)])
  assert set(draws) <= {0, 1}
  assert len(set(draws)) == 2            # both survivors actually sampled

  # Nucleus at temperature 1: softmax([2,1,.5,-1,-3]) ≈
  # [.60, .22, .13, .03, .004]; top_p=0.7 keeps {0,1} (0.60 < 0.7 adds 1).
  draws = np.concatenate([
      np.asarray(_sample(logits, jax.random.key(100 + i), 1.0, top_p=0.7))
      for i in range(40)])
  assert set(draws) <= {0, 1}
  # top_p just above the first prob keeps only token 0.
  draws = np.concatenate([
      np.asarray(_sample(logits, jax.random.key(200 + i), 1.0, top_p=0.5))
      for i in range(20)])
  assert set(draws) == {0}


@pytest.mark.slow
def test_generate_topk_topp_reproducible_in_program():
  """Sampling configs thread through the jitted generate program."""
  model = _models('packed')
  rs = np.random.RandomState(5)
  prompt = jnp.asarray(rs.randint(0, V, (B, P)), jnp.int32)
  variables = model.init(jax.random.key(1), prompt)
  dm = decode_twin(model, L)
  f = make_generate_fn(dm, 4, 1.0, 3, 0.9)
  assert f is make_generate_fn(dm, 4, 1.0, 3, 0.9)
  a = f(variables, prompt, jax.random.key(7))
  b = f(variables, prompt, jax.random.key(7))
  np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
  assert a.shape == (B, 4)
  # Greedy with top_k/top_p set still equals plain greedy (filters are
  # no-ops at temperature 0).
  g1 = generate(dm, variables, prompt, 4, temperature=0.0, top_k=3)
  g2 = generate(dm, variables, prompt, 4, temperature=0.0)
  np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))


@pytest.mark.parametrize('kind', ['dense', 'packed'])
@pytest.mark.slow
def test_generate_variable_length_prompts_match_solo_rows(kind):
  """LEFT-padded mixed-length batch + prompt_lens: every row's greedy
  continuation must equal generating that row alone unpadded (the family
  has no positional encoding, so left-shifted rows are exact)."""
  model = _models(kind)
  rs = np.random.RandomState(6)
  lens = [P, P - 2]
  rows = [jnp.asarray(rs.randint(0, V, (n,)), jnp.int32) for n in lens]
  variables = model.init(jax.random.key(1), rows[0][None])
  dm = decode_twin(model, L)
  steps = 5

  padded = jnp.stack([
      jnp.concatenate([jnp.zeros((P - n,), jnp.int32), r])
      for n, r in zip(lens, rows)])
  out = generate(dm, variables, padded, steps,
                 prompt_lens=jnp.asarray(lens, jnp.int32))

  for i, (n, r) in enumerate(zip(lens, rows)):
    solo = generate(dm, variables, r[None], steps)
    np.testing.assert_array_equal(np.asarray(out[i]), np.asarray(solo[0]),
                                  err_msg=f'row {i} len {n}')


# ------------------------------------------------- chunked KV attention
@pytest.mark.parametrize('kind', ['dense', 'packed'])
def test_kv_chunked_decode_matches_unchunked(kind):
  """kv_chunk (flash-decoding-style chunked cache attention with
  lax.cond chunk skipping) reproduces the unchunked decode logits within
  f32-reassociation tolerance — incl. positions where later chunks are
  entirely beyond the live prefix (skipped, never read)."""
  model = _models(kind)
  rs = np.random.RandomState(3)
  tokens = jnp.asarray(rs.randint(0, V, (B, T)), jnp.int32)
  variables = model.init(jax.random.key(1), tokens)

  def run(kv_chunk):
    dm = decode_twin(model, L, kv_chunk)
    cache = jax.jit(dm.init)(jax.random.key(0),
                             jnp.zeros((B, 1), jnp.int32))['cache']
    base = {k: v for k, v in variables.items()}
    lg, mut = dm.apply(dict(base, cache=cache), tokens[:, :P],
                       mutable=['cache'])
    outs = [lg]
    for t in range(P, T):
      lg, mut = dm.apply(dict(base, cache=mut['cache']),
                         tokens[:, t:t + 1], mutable=['cache'])
      outs.append(lg)
    return jnp.concatenate(outs, axis=1)

  ref = run(0)
  for chunk in (4, 8, 16):                # several live/skipped splits
    np.testing.assert_allclose(np.asarray(run(chunk)), np.asarray(ref),
                               rtol=2e-4, atol=2e-5,
                               err_msg=f'kv_chunk={chunk}')


def test_kv_chunked_varlen_prompts_match_unchunked():
  """Chunked attention with LEFT-padded variable-length prompts: the
  pad-mask interacts with per-chunk online softmax (all-masked chunks
  for short rows must contribute nothing).  Compares teacher-forced
  LOGITS (tokens would amplify f32 reassociation through argmax)."""
  from rigl_tpu.serve.decode import _set_pad_lens
  model = _models('packed')
  rs = np.random.RandomState(5)
  lens = [P, 2]
  rows = [rs.randint(0, V, (n,)) for n in lens]
  padded = jnp.asarray(np.stack(
      [np.pad(r, (P - len(r), 0)) for r in rows]), jnp.int32)
  plens = jnp.asarray(lens, jnp.int32)
  variables = model.init(jax.random.key(1), padded)
  feed = jnp.asarray(rs.randint(0, V, (B, 4)), jnp.int32)

  def run(kv_chunk):
    dm = decode_twin(model, L, kv_chunk)
    cache = jax.jit(dm.init)(jax.random.key(0),
                             jnp.zeros((B, 1), jnp.int32))['cache']
    cache = _set_pad_lens(cache, P - plens)
    base = {k: v for k, v in variables.items()}
    lg, mut = dm.apply(dict(base, cache=cache), padded,
                       mutable=['cache'])
    # Only the LAST prefill position's logits are ever read (the pad
    # positions' outputs are garbage-by-design and intentionally differ:
    # uniform-softmax unchunked vs zeros chunked).
    outs = [lg[:, -1:]]
    for t in range(feed.shape[1]):
      lg, mut = dm.apply(dict(base, cache=mut['cache']),
                         feed[:, t:t + 1], mutable=['cache'])
      outs.append(lg)
    return jnp.concatenate(outs, axis=1)

  np.testing.assert_allclose(np.asarray(run(4)), np.asarray(run(0)),
                             rtol=2e-4, atol=2e-5)


def test_kv_chunked_compiles_to_real_conditionals():
  """The chunk-skip lax.cond must survive compilation as real HLO
  conditionals (one per chunk) — if XLA flattened them to selects, both
  branches would execute and the bandwidth skipping would silently
  vanish (correctness unaffected, perf claim gone)."""
  model = _models('dense')
  toks = jnp.zeros((1, 4), jnp.int32)
  variables = model.init(jax.random.key(0), toks)
  dm = decode_twin(model, L, kv_chunk=4)          # L=16 -> 4 chunks
  cache = jax.jit(dm.init)(jax.random.key(0),
                           jnp.zeros((1, 1), jnp.int32))['cache']

  def step(cache, tok):
    lg, mut = dm.apply(dict(variables, cache=cache), tok,
                       mutable=['cache'])
    return lg, mut['cache']

  hlo = jax.jit(step).lower(cache, toks[:, :1]).compile().as_text()
  assert hlo.count('conditional') >= 2, hlo.count('conditional')
