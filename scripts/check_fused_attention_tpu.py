"""On-chip parity for the fused flash-attention core vs the unfused
einsum path (models/packed_transformer.py:_Attention): full transformer
fwd + grads at the bench config must agree to bf16 tolerance.

  python scripts/check_fused_attention_tpu.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

from rigl_tpu.models.packed_transformer import DenseTransformer


def run(fused, x, y):
  # Vocab head + CE: a well-conditioned loss.  (mean(out**2) on the final
  # LayerNorm output is ~1 independent of params — upstream grads become
  # pure cancellation noise and relative comparison is meaningless.)
  model = DenseTransformer(num_layers=1, d_model=512, d_ff=2048,
                           num_heads=4, vocab_size=256,
                           dtype=jnp.bfloat16, fused_attention=fused)
  v = model.init(jax.random.key(0), x)

  @jax.jit
  def f(params, x, y):
    def loss(params, x, y):
      logits = model.apply({'params': params}, x).astype(jnp.float32)
      logp = jax.nn.log_softmax(logits, -1)
      return -jnp.mean(jnp.take_along_axis(logp, y[..., None], -1))
    l, g = jax.value_and_grad(loss)(params, x, y)
    return l, g

  l, g = f(v['params'], x, y)
  return float(l), jax.tree.map(np.asarray, g)


def main():
  rs = np.random.RandomState(0)
  x = jnp.asarray(rs.randint(0, 256, (2, 512)), jnp.int32)
  y = jnp.asarray(rs.randint(0, 256, (2, 512)), jnp.int32)
  l_f, g_f = run(True, x, y)
  l_u, g_u = run(False, x, y)
  rel_l = abs(l_f - l_u) / (abs(l_u) + 1e-12)
  worst = 0.0
  for (p, a), (_, b) in zip(
      jax.tree_util.tree_leaves_with_path(g_f),
      jax.tree_util.tree_leaves_with_path(g_u)):
    a32, b32 = a.astype(np.float32), b.astype(np.float32)
    r = np.abs(a32 - b32).max() / (np.abs(b32).max() + 1e-12)
    worst = max(worst, float(r))
    print(f'{jax.tree_util.keystr(p)}: grad rel {r:.2e}', flush=True)
  print(f'loss fused {l_f:.6f} unfused {l_u:.6f} rel {rel_l:.2e} '
        f'worst grad rel {worst:.2e}')
  assert rel_l < 5e-3 and worst < 5e-2, 'fused attention diverges!'
  print('ALL OK')


if __name__ == '__main__':
  main()
